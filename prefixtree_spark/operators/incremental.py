"""Incremental index maintenance — ``add_words`` inserts a delta
vocabulary into an existing node table, ``remove_words`` deletes one,
WITHOUT rebuilding the dictionary from raw input.

The reference cannot do this: ``Create`` is monolithic (the whole
vocabulary re-flows through DISTRIBUTE + ITERATE + NORMALIZE + ROLLUP,
PrefixTree.ecl:50-301). For a 100 TB dictionary the raw corpus
re-shuffle is the cost that matters; here only

  - the DELTA words shuffle (routed with the same whole-word hash
    ``create`` uses, so a delta word joins the forest holding its
    prefix-sharing neighbors — mis-routing is impossible to get wrong:
    correctness is partition-independent, SURVEY.md §0, so at worst a
    wrongly-routed word costs prefix sharing, never answers), and
  - the existing NODE table moves once through a cogroup on its build
    partition (already-deduplicated, prefix-compressed rows — far
    smaller than the corpus),

and only partitions that actually receive delta words rebuild their
trie; untouched forests pass through row-identical.

ID discipline: surviving nodes keep their ids; new nodes allocate from
the partition block's unused range (``max(existing id in block) + 1``,
block scheme ≡ PrefixTree.ecl:172-181) — so ids stay globally unique
with zero coordination, exactly as in ``create``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prefixtree_spark.plans.tree import (
    ID_BLOCK,
    PT_COLUMNS,
    PT_SCHEMA,
    n_forests_hint,
    set_n_forests_hint,
)

# node = [label, children dict (first char / _END -> node), min, max, id]
# id is None for nodes created by this delta insert.
_LABEL, _CHILDREN, _MIN, _MAX, _ID = 0, 1, 2, 3, 4
_END = object()


def _node(label: str, nid: int | None = None) -> list:
    return [label, {}, 0, 0, nid]


def _rebuild(rows: pd.DataFrame) -> list:
    """Reconstruct the partition's radix forest from its PTLayout rows
    (labels + parent links are a complete encoding; ids are preserved
    on the rebuilt nodes)."""
    root = _node("")
    nodes: dict[int, list] = {}
    internal = rows[~rows["is_word"]]
    for nid, label in zip(internal["id"], internal["node"]):
        nodes[int(nid)] = _node(label, int(nid))
    for nid, parent_id, is_word, label, mn, mx in zip(
        rows["id"], rows["parent_id"], rows["is_word"],
        rows["node"], rows["_min"], rows["_max"],
    ):
        parent = root if int(parent_id) == 0 else nodes[int(parent_id)]
        if is_word:
            # end-cap: children=None, label = ENTIRE word
            parent[_CHILDREN][_END] = [label, None, int(mn), int(mx), int(nid)]
        else:
            child = nodes[int(nid)]
            parent[_CHILDREN][child[_LABEL][0]] = child
    return root


def _insert(root: list, word: str) -> None:
    """Radix insertion with edge splitting; new nodes carry id None.
    On a split the TAIL keeps the original node's id (its subtree
    hangs unchanged below it); the new prefix node is fresh."""
    cur = root
    i = 0
    n = len(word)
    while i < n:
        first = word[i]
        child = cur[_CHILDREN].get(first)
        if child is None:
            child = _node(word[i:])
            cur[_CHILDREN][first] = child
            cur = child
            i = n
            break
        label = child[_LABEL]
        p = 0
        max_p = min(len(label), n - i)
        while p < max_p and label[p] == word[i + p]:
            p += 1
        if p < len(label):
            tail = [label[p:], child[_CHILDREN], child[_MIN], child[_MAX], child[_ID]]
            child[_LABEL] = label[:p]
            child[_CHILDREN] = {label[p]: tail}
            child[_ID] = None  # the prefix is a NEW node
        cur = child
        i += p
    if _END not in cur[_CHILDREN]:
        cur[_CHILDREN][_END] = [word, None, n, n, None]


def _emit(root: list, pid: int, next_id: int) -> Iterator[tuple]:
    """Recompute subtree _min/_max bottom-up, then emit all rows,
    keeping surviving ids and allocating fresh ones from ``next_id``
    upward (the partition block's unused range)."""
    stack = [(root, False)]
    while stack:
        node, done = stack.pop()
        if node[_CHILDREN] is None:
            continue
        if not done:
            stack.append((node, True))
            for c in node[_CHILDREN].values():
                stack.append((c, False))
        else:
            kids = node[_CHILDREN].values()
            node[_MIN] = min(c[_MIN] for c in kids)
            node[_MAX] = max(c[_MAX] for c in kids)

    def assign(node: list) -> int:
        nonlocal next_id
        if node[_ID] is None:
            node[_ID] = next_id
            next_id += 1
        return node[_ID]

    stack2 = [(c, 0) for c in reversed(list(root[_CHILDREN].values()))]
    while stack2:
        node, parent = stack2.pop()
        nid = assign(node)
        is_word = node[_CHILDREN] is None
        yield (nid, parent, node[_MAX], node[_MIN], is_word, pid, node[_LABEL])
        if not is_word:
            for c in reversed(list(node[_CHILDREN].values())):
                stack2.append((c, nid))


def _remove(root: list, word: str) -> bool:
    """Delete ``word``'s end-cap from the forest and prune any chain of
    nodes left childless. Internal nodes that drop to a single child
    are NOT re-merged — query correctness never depends on maximal
    path compression (the path still spells the same strings and
    ``_emit`` recomputes the bands); it only costs a little traversal
    depth until the next rebuild. Returns False if the word is absent
    (the removal is a no-op)."""
    cur = root
    i, n = 0, len(word)
    path: list[tuple[list, str]] = []
    while i < n:
        child = cur[_CHILDREN].get(word[i])
        if child is None:
            return False
        label = child[_LABEL]
        if word[i : i + len(label)] != label:
            return False
        path.append((cur, word[i]))
        cur = child
        i += len(label)
    cap = cur[_CHILDREN].get(_END)
    if cap is None or cap[_LABEL] != word:
        return False
    del cur[_CHILDREN][_END]
    node = cur
    while path and not node[_CHILDREN]:
        parent, k = path.pop()
        del parent[_CHILDREN][k]
        node = parent
    return True


from prefixtree_spark.operators.build import _trim_fn  # noqa: E402 — one
# shared trim dispatch: build and deltas can never disagree on a mode


def remove_words(
    pt: DataFrame,
    df: DataFrame,
    col: str | Column,
    *,
    trim: str = "both",
    pruned: bool | None = None,
    bytes: bool = False,
) -> DataFrame:
    """Delete ``df[col]``'s words from the node table ``pt`` and return
    the updated table. Equivalent, as query-result SETS, to
    ``create(old_words − removal)`` — pinned by the ``pt_remove_words``
    oracle workload and property tests. Words not in the dictionary
    are ignored.

    Unlike ``add_words``, the removal delta is routed by the INDEX'S
    OWN layout, not by re-hashing: each word finds its forest through
    an equi-join against the end-cap rows (``is_word`` nodes carry the
    full word), so removal is exact under ANY historical partitioning
    — prefix_len builds, add_words growth, repartitioned reloads. Cost:
    one equi-join over the (prefix-compressed) end-caps + a rebuild of
    only the forests that actually lose words; untouched forests pass
    through row-identical. Surviving nodes keep their ids; no new ids
    are ever allocated.

    ``trim`` MUST match the build's trim mode: a ``trim="right"``
    index keeps leading-space words as distinct entries, and full-
    trimming the removal delta here would silently delete the WRONG
    word (the trimmed homograph) instead. ``bytes`` likewise: a
    ``create(bytes=True)`` index stores byte-surrogate labels, and an
    un-transformed delta would miss every non-ASCII end-cap.

    ``pruned``: None (default) auto-chooses from two metadata counts —
    a removal batch smaller than half the forest count provably
    touches a minority of forests, so the untouched majority bypasses
    Python behind a literal-IN filter; larger batches keep the
    one-shot cogroup. True/False force a plan and skip the gate
    jobs."""
    if "n_copies" in pt.columns:
        raise ValueError("remove_words does not support keep_duplicates tables")
    # no .distinct() anywhere on the delta: end-caps are globally
    # unique (create dedups; add_words anti-joins), so the join emits
    # at most one (pid, word) row per DISTINCT delta word anyway, and
    # ``_remove`` is idempotent (second removal of a word no-ops) — a
    # duplicated delta row costs one wasted Python call, never a wrong
    # answer. Each dropped distinct was a full exchange + two
    # hash-aggregates of fixed scheduling cost on every delta call
    # (r7's remove_words_delta drift was exactly this class of
    # per-call fixed cost).
    words = df.select(
        _trim_fn(trim)(F.col(col) if isinstance(col, str) else col).alias("word")
    ).where(F.col("word") != "")
    if bytes:
        from prefixtree_spark.functions.bytesurrogate import to_byte_surrogate

        words = words.select(to_byte_surrogate("word").alias("word"))
    hits = (
        pt.where("is_word")
        .join(words, pt["node"] == words["word"])
        .select(F.col("compute_node").alias("pid"), F.col("word"))
    )

    def merge(key: tuple, old: pd.DataFrame, rem: pd.DataFrame) -> pd.DataFrame:
        if len(rem) == 0 or len(old) == 0:
            return old[PT_COLUMNS]
        root = _rebuild(old)
        for w in rem["word"]:
            _remove(root, w)
        if not root[_CHILDREN]:
            return old[PT_COLUMNS].iloc[0:0]
        next_id = int(old["id"].max()) + 1  # never consumed: no new nodes
        pid = int(key[0])
        return pd.DataFrame(list(_emit(root, pid, next_id)), columns=PT_COLUMNS)

    # Sparse deltas prune: when the removal can only touch FEW forests
    # (|touched| ≤ |words|, so a small batch GUARANTEES sparseness
    # without scanning the index), the untouched forests never leave
    # the JVM — the single-cogroup plan pushes the ENTIRE node table
    # through Arrow + Python even for a 3-word delete. Bulk deltas keep
    # the one-shot cogroup with NO extra jobs: a 10% vocabulary delta
    # hash-scatters across every forest, so literal-IN pruning plus its
    # second table pass buys nothing there (measured at sf0.1: pruned
    # plumbing cost +0.4 s on the bulk shape). The gate reads only
    # delta-side and metadata aggregates, never the corpus.
    out_hint = n_forests_hint(pt)  # removal never adds forests
    if pruned is None:
        # raw (non-distinct) count: one stage over the delta, no
        # exchange; duplicates inflate it, which only biases the gate
        # toward the bulk plan — the conservative direction
        n_words = words.count()
        if n_words == 0:
            return pt
        # forest count: the build/load hint when the frame carries one
        # (create attaches it; load_index reads the _pt_meta sidecar),
        # else ONE max(compute_node) probe — r7's bench showed that
        # probe job drifting remove_words_delta up round over round
        n_forests = out_hint
        if n_forests is None:
            max_cn = pt.agg(F.max("compute_node")).first()[0]
            n_forests = (int(max_cn) if max_cn is not None else 0) + 1
        pruned = 2 * n_words < n_forests
        out_hint = n_forests

    def _out(df: DataFrame) -> DataFrame:
        return df if out_hint is None else set_n_forests_hint(df, out_hint)

    if not pruned:
        return _out(
            pt.groupBy("compute_node")
            .cogroup(hits.groupBy("pid"))
            .applyInPandas(merge, schema=PT_SCHEMA)
        )
    # pin the delta-sized hit set (consumed by the touched collect AND
    # the cogroup; bounded by |removal ∩ dictionary|)
    hits = hits.localCheckpoint(eager=True)
    touched = sorted({r.pid for r in hits.select("pid").distinct().collect()})
    if not touched:
        return pt
    merged = (
        pt.where(F.col("compute_node").isin(touched))
        .groupBy("compute_node")
        .cogroup(hits.groupBy("pid"))
        .applyInPandas(merge, schema=PT_SCHEMA)
    )
    return _out(
        pt.where(~F.col("compute_node").isin(touched)).unionByName(merged)
    )


def add_words(
    pt: DataFrame,
    df: DataFrame,
    col: str | Column,
    *,
    max_word_len: int = 255,
    prefix_len: int | None = None,
    trim: str = "both",
    pruned: bool | None = None,
    bytes: bool = False,
) -> DataFrame:
    """Insert ``df[col]``'s words into the node table ``pt`` and return
    the updated table (same schema). Equivalent, as query-result SETS,
    to ``create(old_words ∪ delta)`` — pinned by property tests and the
    ``pt_add_words`` oracle workload.

    ``prefix_len``, ``trim``, and ``bytes`` must match the values used
    at ``create`` time: a prefix_len mismatch only costs locality
    (extra roots are harmless, SURVEY.md §0), but a trim mismatch
    changes WHICH word the delta spells on a ``trim="right"`` index
    (leading spaces are significant there), and a bytes mismatch
    inserts codepoint strings into a byte-surrogate tree (or vice
    versa), silently corrupting non-ASCII entries. ``keep_duplicates`` tables are not
    supported (the multiplicity column would need merge semantics —
    rebuild instead). ``pruned`` as in ``remove_words``: sparse deltas
    route only touched forests through Python (auto by default).
    """
    if "n_copies" in pt.columns:
        raise ValueError("add_words does not support keep_duplicates tables")
    words = df.select(
        _trim_fn(trim)(F.col(col) if isinstance(col, str) else col).alias("word")
    ).where(F.col("word") != "")
    if bytes:
        from prefixtree_spark.functions.bytesurrogate import to_byte_surrogate

        words = words.select(to_byte_surrogate("word").alias("word"))
    if max_word_len is not None:
        words = words.where(F.length("word") <= max_word_len)
    # sparse/bulk gate input, counted BEFORE the anti-join so the gate
    # job never scans the index (existing words inflate the count, so
    # the error is conservative — toward the bulk plan); pruned=True/
    # False skips the gate jobs outright
    n_raw = None
    if pruned is None:
        # raw count — no distinct exchange; duplicates and existing
        # words both inflate it, so the error is conservative (toward
        # the bulk plan)
        n_raw = words.count()
        if n_raw == 0:
            return pt

    # Existing words are dropped INDEX-SIDE (anti-join on the end-cap
    # rows, which carry the full word — the same layout-independent
    # routing remove_words uses) BEFORE any repartitioning. This is a
    # correctness requirement, not an optimization: hash-routing an
    # EXISTING word with a forest count that differs from the build's
    # (empty build partitions make max(compute_node)+1 undercount; a
    # prefix_len mismatch changes the key outright) would land it in a
    # different forest than its end-cap, the merge's existing-set check
    # there would miss it, and distributed query modes would return the
    # word TWICE. With only genuinely-new words left, any routing is
    # correct — one partition per word by construction — and the
    # forest count reverts to a pure locality/parallelism choice.
    words = words.join(
        pt.where("is_word").select(F.col("node").alias("word")),
        "word",
        "left_anti",
    )
    n = n_forests_hint(pt)  # create/load_index hint: skips the probe job
    if n is None:
        max_cn = pt.agg(F.max("compute_node")).first()[0]
        n = (
            int(max_cn) + 1
            if max_cn is not None  # empty table (e.g. remove_words drained
            else pt.sparkSession.sparkContext.defaultParallelism  # it) restarts fresh
        )
    key = F.col("word") if prefix_len is None else F.substring("word", 1, prefix_len)
    # route as a COLUMN (pmod of the same Murmur3 hash HashPartitioning
    # uses) instead of repartition + TaskContext tagging: the pid set
    # is then collectable without a second shuffle, and — per the
    # routing-correctness note above — any deterministic per-word pid
    # is correct for genuinely-new words, so matching the build's
    # partitioner is a locality nicety, not a requirement.
    delta = words.select(
        F.pmod(F.hash(key), F.lit(n)).cast("int").alias("pid"), "word"
    )
    # |touched| ≤ n_raw: a small batch proves sparseness
    sparse = pruned if pruned is not None else (2 * n_raw < n)
    if sparse:
        # pin the delta (consumed by the touched-pid collect AND the
        # cogroup; bounded by |new words| — the anti-join already
        # dropped every existing word), then collect the touched pids
        delta = delta.localCheckpoint(eager=True)
        touched = sorted(
            {r.pid for r in delta.select("pid").distinct().collect()}
        )
        if not touched:
            return pt

    def merge(key: tuple, old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        if len(new) == 0:
            # untouched forest: pass through row-identical (no rebuild)
            return old[PT_COLUMNS]
        fresh = set(new["word"])
        if len(old) == 0:
            root = _node("")
            next_id = pid * ID_BLOCK + 1
        else:
            existing = set(old.loc[old["is_word"], "node"])
            fresh -= existing
            if not fresh:
                return old[PT_COLUMNS]
            root = _rebuild(old)
            next_id = int(old["id"].max()) + 1
        for w in sorted(fresh):
            _insert(root, w)
        return pd.DataFrame(list(_emit(root, pid, next_id)), columns=PT_COLUMNS)

    # sparse deltas prune; bulk deltas keep the one-shot cogroup with
    # no extra jobs (same gate and rationale as remove_words). The
    # output keeps forest count n (delta pids are pmod(·, n) ∈ [0, n)).
    if not sparse:
        return set_n_forests_hint(
            pt.groupBy("compute_node")
            .cogroup(delta.groupBy("pid"))
            .applyInPandas(merge, schema=PT_SCHEMA),
            n,
        )
    merged = (
        pt.where(F.col("compute_node").isin(touched))
        .groupBy("compute_node")
        .cogroup(delta.groupBy("pid"))
        .applyInPandas(merge, schema=PT_SCHEMA)
    )
    return set_n_forests_hint(
        pt.where(~F.col("compute_node").isin(touched)).unionByName(merged), n
    )
