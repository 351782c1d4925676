"""Prefix retrieval over the node table — the trie's native second
query type (autocomplete / starts-with), served by the SAME index
``create`` builds.

The reference exposes only Levenshtein retrieval (PrefixTree.ecl:314,
459), but its index is a radix trie: prefix lookup is the structure's
home game. Semantics: for each query prefix p, return every dictionary
word starting with p (codepoint-wise, case-sensitive — DuckDB
``starts_with`` is the oracle).

Physical plan (mirrors ``query``'s distributed strategy): the prefix
batch is broadcast; each build partition traverses its own forest in
place (``mapInPandas`` over the colocated tree, or one
``groupBy(compute_node)`` shuffle to restore colocation) — the
dictionary side never moves. Pruning: an edge label that diverges from
the prefix kills its whole subtree; once the prefix is consumed the
remaining subtree is emitted without further comparisons.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prefixtree_spark.plans.tree import VIRTUAL_ROOT_ID

PREFIX_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("word", T.StringType(), False),
    ]
)


def _collect_subtree_words(idx, kids, out: list[str]) -> None:
    """Append every end-cap word at or below the given child positions."""
    stack = list(kids)
    while stack:
        pos = stack.pop()
        if idx.is_word[pos]:
            out.append(idx.labels[pos])
        else:
            more = idx.kids(int(idx.ids[pos]))
            if more is not None:
                stack.extend(more)


def _prefix_hits(idx, p: str) -> list[str]:
    """All dictionary words in one forest starting with ``p``."""
    out: list[str] = []
    roots = idx.kids(VIRTUAL_ROOT_ID)
    if roots is None:
        return out
    if p == "":
        _collect_subtree_words(idx, roots, out)
        return out
    # stack: (child positions, chars of p already matched)
    stack: list[tuple[list[int], int]] = [(roots, 0)]
    while stack:
        kids, consumed = stack.pop()
        rem = p[consumed:]
        for pos in kids:
            if idx.is_word[pos]:
                # end-cap carries the ENTIRE word (PrefixTree.ecl:280):
                # its path equals p's matched part, check the rest
                word = idx.labels[pos]
                if word.startswith(p):
                    out.append(word)
                continue
            label = idx.labels[pos]
            if len(label) >= len(rem):
                if label.startswith(rem):
                    # prefix fully consumed inside this edge: the whole
                    # subtree matches — no more comparisons below here
                    nxt = idx.kids(int(idx.ids[pos]))
                    if nxt is not None:
                        _collect_subtree_words(idx, nxt, out)
            elif rem.startswith(label):
                nxt = idx.kids(int(idx.ids[pos]))
                if nxt is not None:
                    stack.append((nxt, consumed + len(label)))
    return out


def prefix_search(
    pt: DataFrame,
    prefixes: DataFrame,
    col: str,
    *,
    colocated: bool = False,
) -> DataFrame:
    """DataFrame[prefix, word]: every (query prefix, dictionary word)
    pair where the word starts with the prefix. Distinct prefixes, like
    ``query``'s distinct-query semantics. The tree side never shuffles
    when ``colocated=True`` (fresh from ``create`` / ``load_index``)."""
    from prefixtree_spark.operators.query import LocalIndex

    spark = pt.sparkSession
    pdf = (
        prefixes.select(F.col(col).alias("p"))
        .where(F.col("p").isNotNull())
        .distinct()
    )
    plist = [r[0] for r in pdf.collect()]
    bp = spark.sparkContext.broadcast(plist)

    def run_pdf(forest: pd.DataFrame) -> pd.DataFrame:
        idx = LocalIndex(forest, merge=False)
        ps: list[str] = []
        ws: list[str] = []
        for p in bp.value:
            hits = _prefix_hits(idx, p)
            ps.extend([p] * len(hits))
            ws.extend(hits)
        return pd.DataFrame({"prefix": ps, "word": ws})

    if colocated:

        def run_partition(batches):
            frames = [x for x in batches if len(x)]
            if not frames:
                return
            forest = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            yield run_pdf(forest)

        return pt.mapInPandas(run_partition, schema=PREFIX_RESULT_SCHEMA)

    def run(forest: pd.DataFrame) -> pd.DataFrame:
        return run_pdf(forest)

    return pt.groupBy("compute_node").applyInPandas(run, schema=PREFIX_RESULT_SCHEMA)


def search_prefix(index, p: str) -> list[str]:
    """Serving-path point lookup: sorted words starting with ``p`` on a
    ``LocalIndex``/``build_local_index`` handle (Roxie analog)."""
    return sorted(_prefix_hits(index, p))
