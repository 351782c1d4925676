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

from prefixtree_spark.plans.tree import (
    ID_BLOCK,
    PT_COLUMNS,
    PT_COLUMNS_DUP,
    PT_SCHEMA,
    PT_SCHEMA_DUP,
    n_forests_hint,
    set_n_forests_hint,
)

# Sentinel child key for end-cap leaves: a unique object, so it cannot
# collide with any first-character key — including words that contain
# NUL or other control characters.
_END = object()

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


def _emit_rows(
    root: list, pid: int, counts: dict[str, int] | None = None
) -> Iterator[tuple]:
    """Assign ids (block offset pid*1e14, PrefixTree.ecl:172-181),
    compute subtree _min/_max word-length bounds (PrefixTree.ecl:270-271,
    292-293), and yield PTLayout rows iteratively (no recursion — word
    length is unbounded only by the configured cap).

    With ``counts`` (keep_duplicates mode) every row gains an
    ``n_copies`` column: the word's input multiplicity at end-caps
    (compressing the reference's n identical end-cap nodes,
    PrefixTree.ecl:205-208, into one row + count), 1 elsewhere."""
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
        row = (nid, parent, node[_MAX], node[_MIN], is_word, pid, node[_LABEL])
        if counts is not None:
            row += (counts[node[_LABEL]] if is_word else 1,)
        yield row
        if not is_word:
            for c in reversed(list(node[_CHILDREN].values())):
                stack2.append((c, nid))


class _OpenNode:
    """A node on the streaming builder's open path (not yet emitted)."""

    __slots__ = ("id", "parent", "start", "label", "mn", "mx")

    def __init__(self, nid: int, parent: int, start: int, label: str, mn: int, mx: int):
        self.id = nid
        self.parent = parent
        self.start = start  # depth (chars) where this node's label begins
        self.label = label
        self.mn = mn
        self.mx = mx


def _stream_build_sorted(
    words, pid: int, *, keep_duplicates: bool = False
) -> Iterator[tuple]:
    """One-pass radix-tree construction over SORTED words — the
    reference's scan formulation (two directional ITERATE passes +
    NORMALIZE + ROLLUP, PrefixTree.ecl:140-299, SURVEY.md §4 O3) as a
    single streaming LCP pass: memory is O(max word length), not
    O(partition words), so arbitrarily large partitions build without
    holding their trie in memory.

    Invariant: the stack is the open root-to-leaf path of the previous
    word. For each new word, nodes deeper than the LCP are finished
    (emitted), a straddling node is split, and the word's new suffix +
    end-cap are opened/emitted. Emitted trees are logically identical
    to the in-memory builder's (asserted in tests).

    ``keep_duplicates``: duplicates are ADJACENT in sorted order, so
    counting a run costs zero memory; rows gain ``n_copies`` (the
    word's multiplicity at end-caps, 1 elsewhere — see ``_emit_rows``).
    """
    base = pid * ID_BLOCK
    next_id = base + 1
    stack: list[_OpenNode] = []
    prev = None
    # end-cap emission is delayed one word so a sorted duplicate run
    # can be counted into it: [id, parent, wordlen, word, n_copies]
    pending_cap: list | None = None

    def row(vals: tuple, n_copies: int = 1) -> tuple:
        return vals + (n_copies,) if keep_duplicates else vals

    def close_top() -> tuple:
        node = stack.pop()
        if stack:
            top = stack[-1]
            top.mn = min(top.mn, node.mn)
            top.mx = max(top.mx, node.mx)
        return row((node.id, node.parent, node.mx, node.mn, False, pid, node.label))

    def cap_row(cap: list) -> tuple:
        cid, parent, n, word, copies = cap
        return row((cid, parent, n, n, True, pid, word), copies)

    for word in words:
        if word == prev:  # sorted dedup (Quirk 2 fix, zero memory)
            if pending_cap is not None:
                pending_cap[4] += 1
            continue
        if pending_cap is not None:
            yield cap_row(pending_cap)
            pending_cap = None
        if prev is None:
            lcp = 0
        else:
            lcp = 0
            m = min(len(prev), len(word))
            while lcp < m and prev[lcp] == word[lcp]:
                lcp += 1
        # close everything strictly deeper than the LCP
        while stack:
            top = stack[-1]
            if top.start >= lcp:
                yield close_top()
            elif top.start + len(top.label) > lcp:
                # straddling node: the part below the LCP is finished —
                # emit it as a child of a fresh open prefix node that
                # inherits its place on the path
                cut = lcp - top.start
                prefix = _OpenNode(
                    next_id, top.parent, top.start, top.label[:cut], top.mn, top.mx
                )
                next_id += 1
                yield row(
                    (top.id, prefix.id, top.mx, top.mn, False, pid, top.label[cut:])
                )
                stack[-1] = prefix
                break
            else:
                break
        parent_id = stack[-1].id if stack else 0
        n = len(word)
        # open the new suffix node (always non-empty: word != prev and
        # sorted ascending means word extends past the LCP)
        node = _OpenNode(next_id, parent_id, lcp, word[lcp:], n, n)
        next_id += 1
        stack.append(node)
        # end-cap leaf carries the full word (PrefixTree.ecl:280,283)
        pending_cap = [next_id, node.id, n, word, 1]
        next_id += 1
        prev = word
    if pending_cap is not None:
        yield cap_row(pending_cap)
    while stack:
        yield close_top()


def _build_partition_streaming(
    batches: Iterator[pd.DataFrame], *, keep_duplicates: bool = False
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    columns = PT_COLUMNS_DUP if keep_duplicates else PT_COLUMNS

    def words() -> Iterator[str]:
        for pdf in batches:
            yield from pdf["word"]

    buf: list[tuple] = []
    for row in _stream_build_sorted(words(), pid, keep_duplicates=keep_duplicates):
        buf.append(row)
        if len(buf) >= 100_000:
            yield pd.DataFrame(buf, columns=columns)
            buf = []
    if buf:
        yield pd.DataFrame(buf, columns=columns)


def _build_partition(
    batches: Iterator[pd.DataFrame], *, keep_duplicates: bool = False
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    root = _new_node("")
    counts: dict[str, int] = {}
    for pdf in batches:
        for word in pdf["word"]:
            n = counts.get(word)
            if n is None:
                counts[word] = 1
                _insert(root, word)
            else:
                counts[word] = n + 1
    if not counts:
        return
    rows = list(_emit_rows(root, pid, counts if keep_duplicates else None))
    out = pd.DataFrame(rows, columns=PT_COLUMNS_DUP if keep_duplicates else PT_COLUMNS)
    for start in range(0, len(out), 100_000):
        yield out.iloc[start : start + 100_000]


# Per-unique-word memory estimate for the in-memory radix builder: the
# word's chars plus the Python-object overhead of its trie footprint
# (an end-cap list + its share of internal nodes/dict slots — measured
# ~300-600 B/word with sys.getsizeof walks on random vocabularies; 384
# keeps the estimate conservative without tripping on small builds).
_WORD_OVERHEAD = 384


def _trie_sorted_words(root: list, counts: dict[str, int]) -> Iterator[tuple]:
    """Walk the radix trie in key order, yielding (word, multiplicity)
    sorted ascending — the spill path's conversion of an already-built
    in-memory trie into a sorted run. End-cap before children: a word
    sorts before every proper extension of itself; children visit in
    first-char order, which IS lexicographic order at a radix node
    (sibling labels never share a first char)."""
    stack = [root]
    while stack:
        node = stack.pop()
        kids = node[_CHILDREN]
        cap = kids.get(_END)
        ordered = sorted(
            (k for k in kids if k is not _END), reverse=True
        )
        for k in ordered:
            stack.append(kids[k])
        if cap is not None:
            word = cap[_LABEL]
            yield word, counts[word]


def _write_run(spill_dir: str, idx: int, items: Iterator[tuple]) -> str:
    """Write one sorted run of (word, multiplicity) pairs as a pickle
    stream (words are arbitrary strings — may contain newlines/NUL, so
    no line format)."""
    import os
    import pickle

    path = os.path.join(spill_dir, f"run{idx}.pkl")
    with open(path, "wb") as fh:
        pk = pickle.Pickler(fh, protocol=pickle.HIGHEST_PROTOCOL)
        for item in items:
            pk.dump(item)
    return path


def _read_run(path: str) -> Iterator[tuple]:
    import pickle

    with open(path, "rb") as fh:
        up = pickle.Unpickler(fh)
        while True:
            try:
                yield up.load()
            except EOFError:
                return


def _grouped_sorted(words: list[str]) -> Iterator[tuple]:
    """Sort a word buffer and collapse duplicates to (word, count)."""
    words.sort()
    prev, n = None, 0
    for w in words:
        if w == prev:
            n += 1
        else:
            if prev is not None:
                yield prev, n
            prev, n = w, 1
    if prev is not None:
        yield prev, n


def _build_partition_auto(
    batches: Iterator[pd.DataFrame],
    *,
    keep_duplicates: bool = False,
    budget_bytes: int = 256 << 20,
) -> Iterator[pd.DataFrame]:
    """Per-partition routing between the two proven builders (the 100 TB
    OOM guard, round-11 verdict #2): build in memory while the estimated
    trie footprint fits ``budget_bytes``; on overflow, convert the
    partial trie to a sorted on-disk run (``_trie_sorted_words`` — the
    trie walk IS a sort), spill the remaining words as further sorted
    runs, then k-way-merge the runs into the O(max word length)
    streaming LCP builder (``_stream_build_sorted``). Memory is bounded
    by the budget regardless of partition size; under-budget partitions
    take EXACTLY the memory builder's path (bit-identical output), so
    the fallback costs nothing when it doesn't trigger."""
    import heapq
    import itertools
    import shutil
    import tempfile

    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    columns = PT_COLUMNS_DUP if keep_duplicates else PT_COLUMNS
    root = _new_node("")
    counts: dict[str, int] = {}
    est = 0
    batches = iter(batches)
    overflow = False
    for pdf in batches:
        for word in pdf["word"]:
            n = counts.get(word)
            if n is None:
                counts[word] = 1
                _insert(root, word)
                est += len(word) + _WORD_OVERHEAD
            else:
                counts[word] = n + 1
        if est > budget_bytes:
            overflow = True
            break
    if not overflow:
        if not counts:
            return
        rows = list(_emit_rows(root, pid, counts if keep_duplicates else None))
        out = pd.DataFrame(rows, columns=columns)
        for start in range(0, len(out), 100_000):
            yield out.iloc[start : start + 100_000]
        return

    spill_dir = tempfile.mkdtemp(prefix="pt_build_spill_")
    try:
        runs = [_write_run(spill_dir, 0, _trie_sorted_words(root, counts))]
        del root, counts
        buf: list[str] = []
        buf_bytes = 0
        for pdf in batches:
            for word in pdf["word"]:
                buf.append(word)
                buf_bytes += len(word) + _WORD_OVERHEAD
            if buf_bytes > budget_bytes:
                runs.append(_write_run(spill_dir, len(runs), _grouped_sorted(buf)))
                buf, buf_bytes = [], 0
        streams = [_read_run(p) for p in runs]
        if buf:
            streams.append(_grouped_sorted(buf))
        merged = heapq.merge(*streams, key=lambda t: t[0])
        # _stream_build_sorted consumes plain sorted words and re-counts
        # adjacent duplicates itself; multiplicity n expands to n copies
        # (bounded by the partition's input row count — no blow-up)
        words = itertools.chain.from_iterable(
            itertools.repeat(w, n) for w, n in merged
        )
        out_buf: list[tuple] = []
        for row in _stream_build_sorted(words, pid, keep_duplicates=keep_duplicates):
            out_buf.append(row)
            if len(out_buf) >= 100_000:
                yield pd.DataFrame(out_buf, columns=columns)
                out_buf = []
        if out_buf:
            yield pd.DataFrame(out_buf, columns=columns)
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)


def _trim_fn(trim: str):
    """The ONE trim-mode dispatch shared by ``create`` and the
    incremental delta ops — a mode added here reaches both, so a build
    and its add/remove deltas can never disagree on which word a
    string spells (the trim-mismatch corruption incremental.py's
    docstrings warn about)."""
    fn = {"both": F.trim, "right": F.rtrim}.get(trim)
    if fn is None:
        raise ValueError(f"trim must be 'both' or 'right', got {trim!r}")
    return fn


def create(
    df: DataFrame,
    col: str | Column,
    *,
    num_partitions: int | None = None,
    prefix_len: int | None = None,
    max_word_len: int = 255,
    builder: str = "auto",
    keep_duplicates: bool = False,
    trim: str = "both",
    builder_budget_bytes: int = 256 << 20,
    bytes: bool = False,
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

    ``builder`` selects the per-partition construction strategy:
    ``"auto"`` (default) builds in memory while the estimated trie
    footprint fits ``builder_budget_bytes`` (≈256 MB — sized to the
    default ``spark.python.worker.memory``), then spills sorted runs
    and finishes through the streaming LCP builder — so a mis-sized
    partition at 100 TB degrades to disk, never to a worker OOM;
    ``"memory"`` holds one partition's trie unconditionally — fastest
    when the caller KNOWS partitions fit; ``"streaming"`` adds a
    partition-local Spark sort and builds in ONE LCP scan with O(max
    word length) memory (the reference's own scan formulation, ITERATE
    + NORMALIZE + ROLLUP, PrefixTree.ecl:140-299). All emit logically
    identical trees (tested); under-budget ``"auto"`` partitions take
    exactly the ``"memory"`` code path (bit-identical output).

    Returns DataFrame[id, parent_id, _max, _min, is_word, compute_node,
    node]. Words longer than ``max_word_len`` (reference envelope: 255,
    PrefixTree.ecl:322-326) are dropped with the same semantics as
    blanks; pass ``None`` to lift the cap.

    ``keep_duplicates=True`` adds an ``n_copies`` column carrying each
    word's input multiplicity at its end-cap (1 on internal nodes) —
    the engine's compressed form of the reference's behavior, where a
    word appearing n times gets n identical end-cap nodes and a query
    returns n identical rows (PrefixTree.ecl:205-208, SURVEY.md §0
    Quirk 2). The default stays deduped (query semantics unchanged;
    every oracle is against DISTINCT words).

    ``trim``: ``"both"`` (default — what a Spark user expects) or
    ``"right"`` for bug-for-bug parity with ECL ``TRIM``, which strips
    TRAILING whitespace only (PrefixTree.ecl:77, SURVEY.md §2.7 F1) —
    under it a word with leading spaces keeps them and is a distinct
    dictionary entry.

    ``bytes=True`` builds the tree over UTF-8 BYTES instead of
    codepoints — full parity with the reference, whose ECL ``STRING``
    is a byte string (PrefixTree.ecl:74-78; a non-ASCII character is
    several DP cells there, one here by default). Implementation: the
    word column is re-read as ISO-8859-1 (each UTF-8 byte becomes
    exactly one char — bijective), so every kernel, the length bands,
    and ``max_word_len`` operate in byte space unchanged; ``query``
    must be called with the SAME flag (same caller duty as ``trim``),
    and it decodes result columns back to UTF-8 strings. This also
    matches DuckDB/PostgreSQL ``levenshtein``, which count bytes.
    """
    words = df.select(
        _trim_fn(trim)(F.col(col) if isinstance(col, str) else col).alias("word")
    )
    words = words.where(F.col("word") != "")
    if bytes:
        from prefixtree_spark.functions.bytesurrogate import to_byte_surrogate

        words = words.select(to_byte_surrogate("word").alias("word"))
    if max_word_len is not None:
        words = words.where(F.length("word") <= max_word_len)
    n = num_partitions or words.sparkSession.sparkContext.defaultParallelism
    key = F.col("word") if prefix_len is None else F.substring("word", 1, prefix_len)
    words = words.repartition(n, key)
    schema = PT_SCHEMA_DUP if keep_duplicates else PT_SCHEMA
    if builder == "streaming":
        words = words.sortWithinPartitions("word")
        return set_n_forests_hint(
            words.mapInPandas(
                lambda it: _build_partition_streaming(
                    it, keep_duplicates=keep_duplicates
                ),
                schema=schema,
            ),
            n,
        )
    if builder == "auto":
        budget = builder_budget_bytes
        return set_n_forests_hint(
            words.mapInPandas(
                lambda it: _build_partition_auto(
                    it, keep_duplicates=keep_duplicates, budget_bytes=budget
                ),
                schema=schema,
            ),
            n,
        )
    if builder != "memory":
        raise ValueError(f"unknown builder {builder!r}")
    # the build KNOWS its forest count (the repartition N) — hint it so
    # the delta paths (add_words/remove_words plan gates + routing)
    # skip their per-call max(compute_node) probe job
    return set_n_forests_hint(
        words.mapInPandas(
            lambda it: _build_partition(it, keep_duplicates=keep_duplicates),
            schema=schema,
        ),
        n,
    )


def save_index(pt: DataFrame, path: str) -> None:
    """Persist a node table ≡ OUTPUT + BUILDINDEX (PrefixTree.ecl:611-613).

    Written partitioned as built (one file per build partition ≈ one
    forest per file); parquet column pruning subsumes the reference's
    covering-index payload (PrefixTree.ecl:612, SURVEY.md §2.1 S4).

    Alongside the data, a tiny ``_pt_meta`` sidecar stores the forest
    count (underscore-prefixed → invisible to the parquet reader), so
    every future ``add_words``/``remove_words`` on the loaded table
    skips its per-call max(compute_node) probe job — the count is paid
    ONCE here (from the build hint when the frame carries it, else one
    cheap single-column scan of the just-written files), not per delta.
    """
    pt.write.mode("overwrite").parquet(path)
    spark = pt.sparkSession
    n = n_forests_hint(pt)
    if n is None:
        mx = spark.read.parquet(path).agg(F.max("compute_node")).first()[0]
        n = (
            int(mx) + 1
            if mx is not None
            else spark.sparkContext.defaultParallelism
        )
    _write_index_meta(spark, path, int(n))


def _write_index_meta(spark: SparkSession, path: str, n_forests: int) -> None:
    import json

    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_pt_meta")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"n_forests": n_forests}).encode()))
    finally:
        out.close()


def _read_index_meta(spark: SparkSession, path: str) -> int | None:
    import json

    from prefixtree_spark.sources.io import _fs, _read_small_file

    try:
        fs, jvm = _fs(spark, path)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_pt_meta")):
            return None
        return int(
            json.loads(_read_small_file(spark, f"{path}/_pt_meta"))["n_forests"]
        )
    except Exception:
        return None  # pre-meta saves / foreign files: probe instead


def _restore_colocation(df: DataFrame) -> DataFrame:
    """Forest-per-partition colocation for a freshly read node table.

    Range spread at an EXPLICIT 2x-parallelism count (r13): the
    column-only ``repartition("compute_node")`` this used to be is an
    AQE-coalesce trap — the node table's small byte size coalesces the
    exchange to ONE partition (measured: a 36k-node sf0.1 index came
    back as exactly 1 partition), so every subsequent colocated
    traversal ran single-task. Range partitioning also avoids the
    n-forests-into-n-buckets hash-collision idle (see query.py
    ``_colocate_forests``); equal keys cannot straddle a range
    boundary, so whole forests stay together."""
    n_part = 2 * max(
        df.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    return df.repartitionByRange(n_part, "compute_node")


def load_index(spark: SparkSession, path: str, *, colocated: bool = False) -> DataFrame:
    """Read a saved node table. ``colocated=True`` restores
    forest-per-partition colocation with one repartition so subsequent
    ``query(..., colocated=True)`` calls can traverse shuffle-free
    (the parquet reader may otherwise split a forest across input
    partitions at row-group boundaries)."""
    df = spark.read.parquet(path)
    if colocated:
        df = _restore_colocation(df)
    n = _read_index_meta(spark, path)
    if n is not None:
        set_n_forests_hint(df, n)
    return df


def publish_index(pt: DataFrame, root: str) -> int:
    """Crash-safe ``save_index``: land the node table as a new
    immutable version under ``root`` and flip the manifest pointer
    atomically (``sources.io.publish_version``). The incremental
    maintenance cycle — ``add_words``/``remove_words`` produce a new
    node table from the live one — publishes each result here, so a
    rewrite that dies mid-job leaves readers on the previous index
    instead of a half-written directory (round-4 verdict: the
    compact/add_words swap window). Returns the version number."""
    from prefixtree_spark.sources.io import publish_version

    return publish_version(pt, root)


def load_published_index(
    spark: SparkSession, root: str, *, colocated: bool = False
) -> DataFrame:
    """Read the LIVE version of a ``publish_index`` table; see
    ``load_index`` for the ``colocated`` contract."""
    from prefixtree_spark.sources.io import read_published

    df = read_published(spark, root)
    if colocated:
        df = _restore_colocation(df)
    return df


def save_index_bucketed(pt: DataFrame, table: str, *, buckets: int = 32) -> None:
    """The reference's keyed-index layout (INDEX on {parent_id} +
    BUILDINDEX, PrefixTree.ecl:612-613) as a bucketed, sorted table:
    ``bfs``-mode frontier joins on ``parent_id`` then read a
    pre-shuffled, pre-sorted tree side — only the (shrinking) frontier
    moves. Requires a session with a warehouse dir (saveAsTable)."""
    (
        pt.write.mode("overwrite")
        .bucketBy(buckets, "parent_id")
        .sortBy("parent_id")
        .format("parquet")
        .saveAsTable(table)
    )


def load_index_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def index_is_bucketed(df: DataFrame, col: str = "parent_id") -> bool:
    """True when ``df`` reads a catalog table bucketed on ``col`` (the
    BUILDINDEX layout, PrefixTree.ecl:612-613) — possibly under
    projections/filters, which preserve the scan's partitioning.

    Used by ``query`` to honor the reference's build-once/query-keyed
    contract without the caller passing ``tree_partitioned=True``:
    detection walks the analyzed plan to the scan and reads the
    catalog bucket spec. Conservative: any doubt (several scan leaves,
    no catalog table, introspection failure on a non-classic backend)
    returns False, which only costs the one upfront repartition the
    caller would otherwise skip."""
    try:
        # a bucket spec only yields the pre-shuffled scan when bucketed
        # reads are actually enabled in the session — otherwise the
        # detection would claim tree_partitioned for a plan that still
        # shuffles (and skip the broadcast-size probe for nothing)
        ss = df.sparkSession
        if ss.conf.get("spark.sql.sources.bucketing.enabled", "true") != "true":
            return False
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        if leaves.size() != 1:
            return False
        ct = leaves.apply(0).catalogTable()
        if not ct.isDefined():
            return False
        bs = ct.get().bucketSpec()
        if not bs.isDefined():
            return False
        cols = bs.get().bucketColumnNames()
        return [str(cols.apply(i)) for i in range(cols.size())] == [col]
    except Exception:
        return False
