"""Prefix-tree build — ``create`` ≡ the reference's ``Create``
(PrefixTree.ecl:50-301), re-expressed Spark-first.

The reference pipeline is: PROJECT/TRIM → DISTRIBUTE HASH(prefix char)
(the build's ONLY shuffle, PrefixTree.ecl:84) → then entirely
partition-LOCAL sorts + running scans (ITERATE MarkNodes /
AssignNodeIDs) + NORMALIZE + ROLLUP, i.e. "build a radix trie over each
partition's words" expressed as scan-friendly dataflow (SURVEY.md §3.1).

Our plan keeps the same shape and the same single shuffle:

  read → select/trim/filter → repartition(N, substring(col, 1, p))
       → mapInPandas(per-partition in-memory radix-tree builder)

The per-partition builder directly subsumes the reference's
MarkNodes/AssignNodeIDs/GetID/GetNode C++ kernels and the
NORMALIZE + SORT + ROLLUP dedup/aggregate steps (PrefixTree.ecl:101-299)
— verified equivalent in SURVEY.md §0. Duplicate words are deduped at
build (partition-local ``set`` — global, because identical words share a
full prefix and therefore a partition), fixing the reference's
duplicate-end-cap quirk (PrefixTree.ecl:205-208, SURVEY.md §0 Quirk 2).

Scale notes (100 TB):
  - one shuffle, then embarrassingly parallel; scale = partition count.
  - global node-id uniqueness is coordination-free: per-partition id
    blocks of 1e14 (PrefixTree.ecl:172-181).
  - correctness is partition-independent (every partition builds an
    independent forest rooted at parent_id=0; queries fan out to all
    roots — SURVEY.md §0), so skewed prefixes can be salted or split by
    raising ``prefix_len`` with no semantic effect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from prefixtree_spark.plans.tree import ID_BLOCK, PT_COLUMNS, PT_SCHEMA

# Sentinel child key for end-cap leaves; cannot collide with edge labels
# because edges start with a real word character.
_END = "\x00"

# label, children dict, subtree min/max word length
_LABEL, _CHILDREN, _MIN, _MAX = 0, 1, 2, 3


def _new_node(label: str) -> list:
    return [label, {}, 0, 0]


def _insert(root: list, word: str) -> None:
    """Radix-trie insertion with edge splitting."""
    cur = root
    i = 0
    n = len(word)
    while i < n:
        first = word[i]
        child = cur[_CHILDREN].get(first)
        if child is None:
            child = _new_node(word[i:])
            cur[_CHILDREN][first] = child
            cur = child
            i = n
            break
        label = child[_LABEL]
        # longest common prefix of label and word[i:]
        p = 0
        max_p = min(len(label), n - i)
        while p < max_p and label[p] == word[i + p]:
            p += 1
        if p < len(label):
            # split: child becomes [label[:p]] -> [label[p:]]
            tail = _new_node(label[p:])
            tail[_CHILDREN] = child[_CHILDREN]
            child[_LABEL] = label[:p]
            child[_CHILDREN] = {label[p] : tail}
        cur = child
        i += p
    # end-cap carries the ENTIRE word (PrefixTree.ecl:280,283)
    cur[_CHILDREN][_END] = [word, None, n, n]


def _emit_rows(root: list, pid: int) -> Iterator[tuple]:
    """Assign ids (block offset pid*1e14, PrefixTree.ecl:172-181),
    compute subtree _min/_max word-length bounds (PrefixTree.ecl:270-271,
    292-293), and yield PTLayout rows iteratively (no recursion — word
    length is unbounded only by the configured cap)."""
    base = pid * ID_BLOCK
    next_id = 1

    # iterative post-order to fill _MIN/_MAX
    stack = [(root, False)]
    while stack:
        node, done = stack.pop()
        if node[_CHILDREN] is None:  # end-cap: already has min=max=len
            continue
        if not done:
            stack.append((node, True))
            for c in node[_CHILDREN].values():
                stack.append((c, False))
        else:
            kids = node[_CHILDREN].values()
            node[_MIN] = min(c[_MIN] for c in kids)
            node[_MAX] = max(c[_MAX] for c in kids)

    # pre-order id assignment + emit; children of the virtual root get
    # parent_id = 0 (PrefixTree.ecl:269)
    stack2 = [(c, 0) for c in reversed(list(root[_CHILDREN].values()))]
    while stack2:
        node, parent = stack2.pop()
        nid = base + next_id
        next_id += 1
        is_word = node[_CHILDREN] is None
        yield (nid, parent, node[_MAX], node[_MIN], is_word, pid, node[_LABEL])
        if not is_word:
            for c in reversed(list(node[_CHILDREN].values())):
                stack2.append((c, nid))


def _build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    root = _new_node("")
    seen: set[str] = set()
    for pdf in batches:
        for word in pdf["word"]:
            if word not in seen:
                seen.add(word)
                _insert(root, word)
    if not seen:
        return
    rows = list(_emit_rows(root, pid))
    out = pd.DataFrame(rows, columns=PT_COLUMNS)
    for start in range(0, len(out), 100_000):
        yield out.iloc[start : start + 100_000]


def create(
    df: DataFrame,
    col: str | Column,
    *,
    num_partitions: int | None = None,
    prefix_len: int | None = None,
    max_word_len: int = 255,
) -> DataFrame:
    """Build a distributed prefix-tree node table from a string column.

    ≡ ``Create(infile, infield, dist_length)`` (PrefixTree.ecl:50-301).

    Partitioning (the build's ONLY shuffle, ≡ DISTRIBUTE HASH,
    PrefixTree.ecl:84): by default words are hash-partitioned on the
    WHOLE word — skew-proof (uniform load at any scale) and still
    globally deduplicating, since identical words always colocate.
    ``prefix_len`` opts into the reference's prefix-locality strategy
    (``dist_length``, PrefixTree.ecl:57-63): colocating shared prefixes
    shrinks the total node count slightly, but any prefix whose weight
    exceeds 1/num_partitions serializes the build onto one worker
    (measured: uniform-prefix dictionaries collapse to a SINGLE
    partition at prefix_len ≤ the common-prefix length — fatal at
    100 TB). Correctness is partition-independent either way
    (SURVEY.md §0), so this is purely a layout choice.

    Returns DataFrame[id, parent_id, _max, _min, is_word, compute_node,
    node]. Words longer than ``max_word_len`` (reference envelope: 255,
    PrefixTree.ecl:322-326) are dropped with the same semantics as
    blanks; pass ``None`` to lift the cap.
    """
    words = df.select(F.trim(F.col(col) if isinstance(col, str) else col).alias("word"))
    words = words.where(F.col("word") != "")
    if max_word_len is not None:
        words = words.where(F.length("word") <= max_word_len)
    n = num_partitions or words.sparkSession.sparkContext.defaultParallelism
    key = F.col("word") if prefix_len is None else F.substring("word", 1, prefix_len)
    words = words.repartition(n, key)
    return words.mapInPandas(_build_partition, schema=PT_SCHEMA)


def save_index(pt: DataFrame, path: str) -> None:
    """Persist a node table ≡ OUTPUT + BUILDINDEX (PrefixTree.ecl:611-613).

    Written partitioned as built (one file per build partition ≈ one
    forest per file); parquet column pruning subsumes the reference's
    covering-index payload (PrefixTree.ecl:612, SURVEY.md §2.1 S4).
    """
    pt.write.mode("overwrite").parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
