"""Prefix-tree fuzzy query — ``query`` ≡ ``QueryThorLevenshtein``
(PrefixTree.ecl:314-446), ``query_one`` ≡ ``QueryRoxieLevenshtein``
(PrefixTree.ecl:459-588).

Semantics (verified equivalent to brute force in SURVEY.md §0): for each
query string, return every dictionary word within ``max_distance``
Levenshtein edits, as rows (query_string, node, final_distance) — the
reference's output projection (PrefixTree.ecl:445).

Pruning is exactly the reference's (SURVEY.md §4 O5/O6):
  - branch-and-bound: stop descending when min of the DP row > k
    (PrefixTree.ecl:426,434);
  - subtree length band: skip children where len(query) is outside
    [_min - k, _max + k] (PrefixTree.ecl:440-441). Deliberately does NOT
    fold current_distance into the band (the reference documents the
    dog/drop double-count counterexample, PrefixTree.ecl:435-439).

Three physical strategies — chosen by data shape, because at 100 TB
either side may be the big one:

  - ``mode="broadcast_queries"``: the node table stays distributed,
    grouped by its build partition (each partition is an independent
    forest, SURVEY.md §0); the query batch is broadcast to every
    partition and ALL queries traverse the forest together in one
    vectorized DP (functions/levenshtein.py). Shuffle-free on the big
    side; this is the inverted-index-style scale path for huge
    dictionaries.
  - ``mode="broadcast_tree"``: the node table is collected+broadcast and
    queries stream through ``mapInPandas`` — the scale path for huge
    query sets over dictionaries that fit in executor memory.
  - ``mode="bfs"``: the reference's own physical plan — a driver loop of
    per-level frontier joins on ``node_id == parent_id`` with the band
    predicates as join filters and the DP as an Arrow-batched pandas UDF
    (≡ LOOP + half-keyed JOIN, PrefixTree.ecl:430-442). Kept because it
    is the only strategy when BOTH sides exceed memory; uses
    ``localCheckpoint`` to stop iterative plan growth.

``mode="auto"`` routes by BOTH sides' sizes: small tree →
broadcast_tree; big tree + small query set → broadcast_queries; big
tree + big query set → chunked colocated traversal (query side
streamed in bounded chunks; the tree never moves), re-sharding the
tree first if its per-partition forests exceed a traversal task's
budget. bfs is explicit-opt-in only (``mode="bfs"``) — it was measured
to lose to brute force at k>=2 (SCALING.md round-4/5).

``mode="filegroups"`` is the chunked strategy with the driver taken
off the data path: the query side is hashed into parquet file groups
executor-side and each chunk's traversal tasks read their group from
shared storage — for query sides so large that even streaming them
through the driver (toLocalIterator + per-chunk broadcast) would make
the driver NIC the throughput ceiling.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prefixtree_spark.functions.levenshtein import (
    QueryBatch,
    extend_rows,
    extend_rows_multi,
)
from prefixtree_spark.plans.lifecycle import release_checkpoint
from prefixtree_spark.plans.tree import VIRTUAL_ROOT_ID

def merge_forests(pt_pdf: pd.DataFrame) -> pd.DataFrame:
    """Rebuild a collected multi-partition forest into ONE local radix
    tree (maximal prefix sharing). The distributed layout keeps one
    independent forest per build partition (skew-proof, SURVEY.md §0);
    once collected to a single host that layout only multiplies
    traversal work on shared prefixes, so the serving/broadcast paths
    re-merge. Cost: one in-memory rebuild over the end-cap words."""
    from prefixtree_spark.operators.build import _emit_rows, _insert, _new_node
    from prefixtree_spark.plans.tree import PT_COLUMNS

    words = pt_pdf.loc[pt_pdf["is_word"], "node"]
    root = _new_node("")
    seen: set[str] = set()
    for w in words:
        if w not in seen:
            seen.add(w)
            _insert(root, w)
    return pd.DataFrame(list(_emit_rows(root, 0)), columns=PT_COLUMNS)


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_string", T.StringType(), False),
        T.StructField("node", T.StringType(), False),
        T.StructField("final_distance", T.IntegerType(), False),
    ]
)

# Collected trees up to this many nodes use the broadcast_tree path in
# mode="auto"; beyond it the tree stays distributed.
_AUTO_BROADCAST_NODES = 2_000_000
# below this, auto collects+merges the tree per call (driver handle);
# above it (but still collectable) the distributed traversal wins —
# measured r7 crossover: ~tie at 3.7k nodes, 3x at 36k (see SCALING)
_AUTO_DRIVER_TREE_NODES = 8_192

# bfs tree sides up to this many nodes are broadcast into the per-level
# join (zero per-level shuffles); beyond it the tree is hash-partitioned
# on parent_id once and only the frontier moves each level.
_BFS_BROADCAST_NODES = 5_000_000

# Cold-path merges at or below this node count run merge_forests on the
# driver (one Python insert pass — cheapest for small trees); above it
# the merge is a DISTRIBUTED rebuild: create() on the end-cap words with
# prefix_len=1, so each first-character subtree is fully merged inside
# one executor partition and distinct partitions own disjoint root
# children — their concatenation IS the merged forest (no driver CPU).
# Measured crossover ≈60-100k nodes; at 933k nodes: 9.3s driver vs 2.7s
# distributed on local[8].
_DRIVER_MERGE_NODES = 100_000

# Distinct query strings up to this count may be collected + broadcast
# (tens of MB of driver memory); beyond it, with the tree ALSO too big
# to collect, mode="auto" streams the query side in chunks of this size
# through the distributed-tree traversal (see
# _query_broadcast_queries_chunked).
_AUTO_BROADCAST_QUERIES = 1_000_000

# Beyond this many distinct query strings, even STREAMING the query
# side through the driver (toLocalIterator + per-chunk re-broadcast)
# makes the driver NIC the throughput ceiling (~2+ GB of text funneled
# up and back down per pass at this count) — mode="auto" switches its
# chunk loop to the filegroups strategy: executors write parquet query
# groups, traversal tasks read them from shared storage, the driver
# handles only paths. On a real cluster set
# spark.prefixtree.filegroups.scratch to a shared-filesystem path;
# unset, the scratch defaults to a driver-local tempdir (correct on
# local[...] where all executors share the host).
_AUTO_FILEGROUP_QUERIES = 20_000_000

# Chunk jobs the funnel loop keeps in flight (driver threads). 1 =
# strictly serial (the r13-measured default when fetch ran one job per
# small partition); >1 overlaps the next chunk's toLocalIterator fetch
# with the current chunk's traversal job (guide §2.6). The driver
# memory bound becomes this many chunks of query strings in flight.
_CHUNK_PIPELINE_DEPTH = 1

# With both sides big, auto mode chunks the query side as long as the
# tree's per-partition forests still fit one traversal task (the
# colocated mapInPandas materializes a partition's forest in pandas:
# ~100 B/node → 20M nodes ≈ 2 GB). Beyond that auto RE-SHARDS the tree
# (rebuild from end-cap words at more partitions — forest granularity
# is a build artifact, not a law) and chunks anyway: bfs, the one
# strategy measured to LOSE to brute force at k>=2 (SCALING.md
# round-4/5: 298 s vs ~56 s), is never auto-chosen — it stays an
# explicit ``mode="bfs"`` opt-in for trees that must not be rebuilt.
_CHUNK_MAX_PARTITION_NODES = 20_000_000

# Re-shard target: rebuild at ~cap/4 nodes per partition. The rebuild's
# node count can exceed the original's (more partitions → less prefix
# sharing), so the headroom keeps the result comfortably traversable.
_RESHARD_TARGET_PARTITION_NODES = _CHUNK_MAX_PARTITION_NODES // 4


def _merged_local_index(pt: DataFrame, n_nodes: int | None = None) -> "LocalIndex":
    """Collect ``pt`` into one merged LocalIndex, routing the merge by
    size: small trees collect raw and merge on the driver; large trees
    re-build DISTRIBUTED via ``create(words, prefix_len=1)`` — the
    prefix-hash layout makes every partition's forest a set of complete
    first-char subtrees, so the collected concatenation is already the
    maximal-prefix-sharing forest and ``merge=False`` applies. The
    rebuild uses ``trim="right"`` (identity on end-cap words — both
    trim modes already stripped trailing blanks) and no length cap, so
    the word set is preserved verbatim for EITHER build configuration.

    Callers that already know the node count pass it; otherwise ``pt``
    should be persisted by the caller (the count and the chosen route
    share one materialization)."""
    from prefixtree_spark.operators.build import create

    if n_nodes is None:
        n_nodes = pt.count()
    if n_nodes <= _DRIVER_MERGE_NODES:
        return LocalIndex(pt.toPandas())
    words = pt.where("is_word").select(F.col("node").alias("w"))
    merged = create(words, "w", prefix_len=1, max_word_len=None, trim="right")
    return LocalIndex(merged.toPandas(), merge=False)


def _traverse(
    batch: QueryBatch, k: int, index: "LocalIndex"
) -> tuple[list[str], list[str], list[int]]:
    """Depth-first branch-and-bound over one forest, all queries at once.

    The stack carries (node position or root marker, active query
    indices, their DP rows). Each visited edge advances EVERY active
    query's DP row in one vectorized ``extend_rows`` call — the batch
    analogue of the reference's per-row LOOP body (PrefixTree.ecl:430-442).
    """
    out_q: list[str] = []
    out_w: list[str] = []
    out_d: list[int] = []
    roots = index.kids(VIRTUAL_ROOT_ID)
    if not len(batch) or roots is None:
        return out_q, out_w, out_d
    ids, labels = index.ids, index.labels
    is_word, mins, maxs = index.is_word, index.mins, index.maxs

    all_idx = np.arange(len(batch))
    init_rows = batch.initial_rows()
    qlens = batch.lens

    # stack entries: (child positions to expand, active idx, rows)
    stack: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = [
        (roots, all_idx, init_rows)
    ]
    while stack:
        kid_positions, idx, rows = stack.pop()
        for pos in kid_positions:
            lo, hi = int(mins[pos]), int(maxs[pos])
            # subtree length band (PrefixTree.ecl:440-441)
            band = (qlens[idx] >= lo - k) & (qlens[idx] <= hi + k)
            if not band.any():
                continue
            sub_idx = idx[band]
            sub_rows = rows[band]
            if is_word[pos]:
                # end-cap: the path already spells the whole word; the
                # label is the full word (PrefixTree.ecl:280) — read the
                # exact distance, no DP extension.
                finals = batch.final_distances(sub_rows, sub_idx)
                hit = finals <= k
                if hit.any():
                    word = labels[pos]
                    for qi, d in zip(sub_idx[hit], finals[hit]):
                        out_q.append(batch.queries[qi])
                        out_w.append(word)
                        out_d.append(int(d))
                continue
            new_rows = extend_rows(batch, sub_rows, sub_idx, labels[pos])
            # branch-and-bound (PrefixTree.ecl:426,434)
            alive = batch.row_mins(new_rows, sub_idx) <= k
            if alive.any():
                kids = index.kids(int(ids[pos]))
                if kids is not None:
                    stack.append((kids, sub_idx[alive], new_rows[alive]))
    return out_q, out_w, out_d


def _traverse_banded(
    batch: QueryBatch, k: int, index: "LocalIndex"
) -> tuple[list[str], list[str], list[int]]:
    """``_traverse`` on the Ukkonen-banded kernel: DP windows of 2k+1
    cells instead of max_len+1 full rows (functions/levenshtein.py
    banded block — profile showed 86% of traversal time inside the
    full-width ``extend_rows`` at k=2 over ~38-char rows, most of it
    arithmetic on cells the band proves are > k). Stack entries carry
    the parent path length ``p``; the end-cap read relies on the same
    invariant the full path does — an end-cap's parent path spells the
    whole word, and the length band has already enforced
    |len(q) - p| ≤ k, so the final cell is in window."""
    from prefixtree_spark.functions.levenshtein import (
        banded_initial_state,
        extend_state_banded,
        state_final_distances,
        state_row_mins,
    )

    out_q: list[str] = []
    out_w: list[str] = []
    out_d: list[int] = []
    roots = index.kids(VIRTUAL_ROOT_ID)
    if not len(batch) or roots is None:
        return out_q, out_w, out_d
    ids, labels = index.ids, index.labels
    is_word, mins, maxs = index.is_word, index.mins, index.maxs
    W = 2 * k + 1
    padT = batch.codes_T_padded(k)
    n_padT = padT.shape[0]

    all_idx = np.arange(len(batch))
    qlens = batch.lens

    # stack entries: (children, active idx, their qlens, transposed
    # (W, n) state, path length). Carrying the gathered qlens avoids a
    # fancy index per edge; state/idx/lens are shared (never mutated)
    # across a frame's children, so all-true masks skip the copies.
    stack: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]] = [
        (roots, all_idx, qlens, banded_initial_state(k, len(batch)), 0)
    ]
    while stack:
        kid_positions, idx, lens_a, state, p = stack.pop()
        for pos in kid_positions:
            lo, hi = int(mins[pos]), int(maxs[pos])
            band = (lens_a >= lo - k) & (lens_a <= hi + k)
            if not band.all():
                if not band.any():
                    continue
                sub_idx = idx[band]
                sub_lens = lens_a[band]
                sub_state = state[:, band]
            else:
                sub_idx, sub_lens, sub_state = idx, lens_a, state
            if is_word[pos]:
                finals = state_final_distances(sub_lens, sub_state, p, k)
                hit = finals <= k
                if hit.any():
                    word = labels[pos]
                    for qi, d in zip(sub_idx[hit], finals[hit]):
                        out_q.append(batch.queries[qi])
                        out_w.append(word)
                        out_d.append(int(d))
                continue
            label = labels[pos]
            # one gather per edge: the rows this edge's chars read
            # (p .. p+L+W-2), restricted to the active columns
            padT_sub = padT[p : min(p + len(label) + W - 1, n_padT), :][
                :, sub_idx
            ]
            new_state = extend_state_banded(padT_sub, sub_state, label, p, k)
            new_p = p + len(label)
            alive = state_row_mins(sub_lens, new_state, new_p, k) <= k
            if alive.all():
                kids = index.kids(int(ids[pos]))
                if kids is not None:
                    stack.append((kids, sub_idx, sub_lens, new_state, new_p))
            elif alive.any():
                kids = index.kids(int(ids[pos]))
                if kids is not None:
                    stack.append(
                        (
                            kids,
                            sub_idx[alive],
                            sub_lens[alive],
                            new_state[:, alive],
                            new_p,
                        )
                    )
    return out_q, out_w, out_d


# Banded-kernel dispatch: the band wins where DP element count
# dominates (large still-active sets over many edges) and loses where
# per-edge numpy fixed costs dominate (small batches, where
# branch-and-bound collapses the active set within a few edges).
# Measured on the r8 fixtures with the (n, W) row kernel, re-measured
# r13 after the transposed (W, n) state kernel cut the banded per-edge
# fixed cost ~3x (contiguous-row ufuncs + manual insertion chain
# replacing ufunc.accumulate):
#   k=2, 5000 q, 4.7k-node forest: banded 1.07 s vs full 3.1+ s (r13)
#   k=2, 750 q, 1.3k-node forest:  banded 0.128 vs full 0.182 s (r13)
#   k=1, 750 q, same forest:       banded 0.074 vs full 0.087 s (r13)
#   k∈{1,2}, 100 q (serving):      full wins by ~10-15% (r13)
# So: banded iff k >= 1 AND the batch is big enough to keep active
# sets array-sized through the walk (k=0 degenerates to a 1-cell
# window where the full kernel's single row is already minimal).
_BANDED_MIN_QUERIES = 1024


def _traverse_auto(
    batch: QueryBatch, k: int, index: "LocalIndex"
) -> tuple[list[str], list[str], list[int]]:
    """Kernel dispatch (see the measured regime table above); the two
    kernels are result-identical (property-pinned)."""
    if (
        k >= 1
        and len(batch) >= _BANDED_MIN_QUERIES
        and 2 * k + 1 < batch.max_len + 1
    ):
        return _traverse_banded(batch, k, index)
    return _traverse(batch, k, index)


def _traverse_pdf(
    pt_pdf: pd.DataFrame, batch: QueryBatch, k: int
) -> pd.DataFrame:
    return _traverse_index(LocalIndex(pt_pdf, merge=False), batch, k)


def _traverse_index(idx: "LocalIndex", batch: QueryBatch, k: int) -> pd.DataFrame:
    q, w, d = _traverse_auto(batch, k, idx)
    return pd.DataFrame(
        {"query_string": q, "node": w, "final_distance": pd.array(d, dtype="int32")}
    )


# ---------------------------------------------------------------------------
# distributed strategies
# ---------------------------------------------------------------------------


# Above this many chunk frames, _union_all collapses each block of
# this size into ONE re-checkpointed frame before unioning further:
# the balanced tree bounds plan DEPTH at log2(n), but plan SIZE (one
# leaf per chunk) still grows linearly, and at the thousands-of-chunks
# scale filegroups exists for, analyzer time + driver plan memory grow
# with it on every action against the returned frame (r13 verdict #6).
# The collapse costs one extra pass over each block's (already
# materialized) results — reading cached blocks, writing one combined
# checkpoint — and keeps every later plan at <= this many leaves.
_UNION_COLLAPSE_FANOUT = 64


def _union_all(frames: list[DataFrame]) -> DataFrame:
    """Balanced (pairwise-tree) union of per-chunk results, with plan
    SIZE bounded by block-collapsing past ``_UNION_COLLAPSE_FANOUT``.

    A linear ``unionByName`` chain builds a plan tree whose depth is
    the CHUNK COUNT — at the thousands-of-chunks scale the filegroups
    strategy exists for, analyzer/optimizer recursion over that chain
    is itself a driver cost and, far enough out, a stack-depth hazard.
    The pairwise tree bounds depth at log2(n) (12 levels at 4096
    chunks). Same rows, same order-insensitive result; measured equal
    warm and ~1.5x faster on the first (plan-building) pass at 400
    chunks (tools probe, r13). Past the fanout, each block of
    ``_UNION_COLLAPSE_FANOUT`` checkpointed chunk results is unioned
    and re-checkpointed eagerly, so the frame handed back never carries
    more than fanout leaves no matter how many chunks ran (the r13
    400-frame probe measured the first action's plan pass growing with
    leaf count even on the balanced tree)."""

    def tree(fs: list[DataFrame]) -> DataFrame:
        while len(fs) > 1:
            fs = [
                fs[i].unionByName(fs[i + 1]) if i + 1 < len(fs) else fs[i]
                for i in range(0, len(fs), 2)
            ]
        return fs[0]

    fs = frames
    while len(fs) > _UNION_COLLAPSE_FANOUT:
        fs = [
            tree(fs[i : i + _UNION_COLLAPSE_FANOUT]).localCheckpoint(
                eager=True
            )
            for i in range(0, len(fs), _UNION_COLLAPSE_FANOUT)
        ]
    return tree(fs)


def _colocate_forests(pt: DataFrame) -> DataFrame:
    """Reshuffle the node table so each partition holds whole forests,
    spread evenly — the colocation shuffle ahead of a chunk loop.

    RANGE partitioning at 2x parallelism, not hash at 1x (r13): the
    number of forests is ~the build partition count, which is ~the
    partition count of THIS shuffle at any scale — hashing n keys into
    n buckets idles ~1/e of the cluster (measured at the bench both-big
    shape: 32 forests -> only 18 of 32 tasks non-empty, chunk job
    4.4-4.7 s). Range partitioning separates keys near-perfectly and
    balances by sampled row counts; 2x buckets makes singleton-forest
    partitions the common case (measured: 32/32 tasks busy, max task
    4.2 -> 1.95 s, chunk job 2.2-2.7 s). Equal keys land in one range
    partition, so the whole-forest contract holds. The explicit N also
    dodges the AQE-coalesce trap (the node table's small byte size
    otherwise coalesces to ~1 partition and the loop runs single-task).
    The range sampling pass is one extra job, paid once per chunk LOOP,
    never per chunk."""
    n_part = 2 * max(
        pt.rdd.getNumPartitions(),
        pt.sparkSession.sparkContext.defaultParallelism,
    )
    return pt.repartitionByRange(n_part, "compute_node")


class _QueryPayload:
    """Broadcast holder for a traversal's query batch: ships ONLY the
    strings, builds the ``QueryBatch`` lazily ON THE WORKER and memoizes
    it on the unpickled holder — which the pyspark broadcast registry
    caches per worker process — so every per-task derived cost (the
    dense codes matrix, the valid mask, the per-k padded transpose) is
    paid once per WORKER per chunk instead of once per TASK, while the
    wire still carries the compact string list (the prebuilt-QueryBatch
    broadcast alternative ships the padded int32 codes matrix, ~9x the
    bytes at name-length payloads — wrong trade at the 1M-query chunk
    cap even though it measured the same locally; probe_payload_r13).
    Workers run tasks serially, so the memo needs no lock."""

    __slots__ = ("queries", "_batch")

    def __init__(self, queries: list[str]):
        self.queries = queries
        self._batch = None

    def __getstate__(self):
        return self.queries

    def __setstate__(self, qs):
        self.queries = qs
        self._batch = None

    def batch(self) -> QueryBatch:
        if self._batch is None:
            self._batch = QueryBatch(self.queries)
        return self._batch


def _query_broadcast_queries(
    pt: DataFrame, query_strings: list[str], k: int, *, colocated: bool = False
) -> DataFrame:
    """Tree stays distributed (one independent forest per build
    partition); queries broadcast; one traversal task per forest.

    ``colocated=True`` promises every node row sits in the same Spark
    partition as its whole forest (true for a DataFrame fresh out of
    ``create`` and for ``load_index`` output) — then the traversal runs
    in-place via mapInPandas with ZERO shuffle of the dictionary side.
    Otherwise a groupBy(compute_node) shuffle restores colocation
    first. At scale the zero-shuffle path is the point of this mode:
    only the (small) query batch moves."""
    df, _bq = _query_broadcast_queries_bc(
        pt, query_strings, k, colocated=colocated
    )
    return df


def _query_broadcast_queries_bc(
    pt: DataFrame, query_strings: list[str], k: int, *, colocated: bool = False
):
    """`_query_broadcast_queries` returning ``(df, broadcast)`` so loop
    callers can ``destroy()`` each chunk's broadcast right after its
    eager checkpoint (r13 advice): each reused Python worker otherwise
    retains every chunk's unpickled payload (and its memoized
    QueryBatch, ~9x the string bytes) in its broadcast registry until
    the JVM ContextCleaner happens to GC the handle — nondeterministic
    worker RSS growth at the thousands-of-chunks scale the chunk loops
    target."""
    spark = pt.sparkSession
    bq = spark.sparkContext.broadcast(_QueryPayload(query_strings))

    def run_partition(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        yield _traverse_pdf(pdf, bq.value.batch(), k)

    if colocated:
        return pt.mapInPandas(run_partition, schema=RESULT_SCHEMA), bq
    # restore colocation with an EXPLICIT-count repartition + the same
    # per-partition traversal — NOT groupBy().applyInPandas: AQE
    # coalesces the group exchange's small byte size to ~1 partition
    # and applyInPandas then runs one QueryBatch build + DP PER GROUP
    # sequentially inside it (measured: 14.5 s vs 1.4 s colocated at
    # 14k queries × 32 forests — QueryBatch init is ~0.5 s at that
    # batch size). A partition holding several complete forests
    # traverses correctly: node ids are globally unique and every
    # forest root hangs off the virtual root, so the CSR index is the
    # forests' union (same argument as _merged_local_index's
    # merge=False route).
    n_part = max(
        pt.rdd.getNumPartitions(), spark.sparkContext.defaultParallelism
    )
    return (
        pt.repartition(n_part, "compute_node").mapInPandas(
            run_partition, schema=RESULT_SCHEMA
        ),
        bq,
    )


def _query_broadcast_queries_chunked(
    pt: DataFrame,
    qdf: DataFrame,
    k: int,
    *,
    colocated: bool = False,
    chunk_size: int | None = None,
) -> DataFrame:
    """Both-sides-big strategy: iterate ``_query_broadcast_queries``
    over bounded slices of the query side, pinning each slice's result.

    The round-4 regime map (SCALING.md) showed bfs LOSING to brute
    force at k>=2 when both sides are big (weaker pruning explodes the
    frontier; per-level checkpoints pay for it), while
    broadcast_queries won by 17x whenever the query side fit — so auto
    mode now CHUNKS the query side through that winning strategy
    instead of falling through to bfs. Driver memory stays bounded by
    one chunk (``toLocalIterator`` streams the query strings); the
    tree never moves (colocated traversal) and is traversed once per
    chunk — per-chunk cost is flat, total cost is linear in the number
    of chunks, and nothing in the plan depends on both sides at once.
    """
    spark = pt.sparkSession
    if chunk_size is None:
        chunk_size = _AUTO_BROADCAST_QUERIES
    chunk_size = max(1, chunk_size)
    owned = None
    if not colocated:
        # colocate ONCE for all chunks (the per-call strategy would
        # re-shuffle the tree per chunk through its groupBy); range
        # spread at 2x parallelism — see _colocate_forests for the
        # measured hash-collision/AQE rationale
        owned = pt = _colocate_forests(pt).persist()
        pt.count()
    # Deliberately SERIAL (r13): pipelining the traversal onto a worker
    # thread while the main thread pulls the next chunk off
    # toLocalIterator was measured SLOWER at 13 chunks (57.0/53.6 s
    # serial vs 58.5/62.2 s piped) — the overlapped traversal jobs
    # contend with the iterator's own per-partition fetch jobs and
    # stall chunk formation. query_groups (whose chunks are pure Spark
    # jobs with no driver iterator to starve) is where the overlap
    # pays, and has it.
    #
    # Fetch granularity (r13): toLocalIterator runs ONE job per
    # partition of its input, so iterating the query side at its
    # shuffle-partition count pays a driver round trip per (small)
    # partition — ~90 ms each, ~3 s of the measured 28 s both-big wall
    # at 32 partitions. Coalescing the (persisted) query side to
    # ~chunk-sized partitions makes fetch jobs as big as the chunks the
    # loop builds anyway: same driver-memory bound (one partition ≈ one
    # chunk in flight), 10x fewer round trips. coalesce() is narrow —
    # reading from the cache, no shuffle; chunk membership may shift,
    # which is invisible in the unioned result (each distinct string
    # traverses exactly once either way).
    lvl = qdf.storageLevel
    n_q_parts = qdf.rdd.getNumPartitions()
    if (lvl.useMemory or lvl.useDisk) and n_q_parts > 1:
        # sizing needs a count; only the persisted path (mode="auto",
        # which pins the query side for its own probe) gets it for free
        target = max(1, min(n_q_parts, -(-qdf.count() // chunk_size)))
        if target < n_q_parts:
            qdf = qdf.coalesce(target)
    chunks: list[DataFrame] = []

    def run_chunk(buf: list[str]) -> DataFrame:
        df, bq = _query_broadcast_queries_bc(pt, buf, k, colocated=True)
        df = df.localCheckpoint(eager=True)
        # the checkpoint materialized every partition: the chunk's
        # broadcast is dead weight from here. Destroy it NOW (r13
        # advice) — otherwise every reused Python worker retains every
        # chunk's unpickled payload + memoized QueryBatch in its
        # broadcast registry until ContextCleaner GC happens to run,
        # i.e. nondeterministic worker RSS growth over thousands of
        # chunks.
        bq.destroy()
        return df

    depth = max(1, int(_CHUNK_PIPELINE_DEPTH))
    try:
        if depth == 1:
            buf: list[str] = []
            for row in qdf.toLocalIterator():
                buf.append(row[0])
                if len(buf) >= chunk_size:
                    chunks.append(run_chunk(buf))
                    buf = []
            if buf:
                chunks.append(run_chunk(buf))
        else:
            # overlap the NEXT chunk's fetch with the current chunk's
            # traversal job (guide §2.6): the traversal jobs leave the
            # cluster idle during each chunk's driver turnaround
            # (string fetch + broadcast + checkpoint bookkeeping), and
            # with the fetch coalesced to chunk-sized partitions the
            # r13 contention (per-partition fetch jobs starving chunk
            # formation) is gone. Bounded: at most ``depth`` chunk
            # jobs in flight, so the driver-memory bound stays
            # ``depth`` chunks of strings.
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            pending: "deque" = deque()
            with ThreadPoolExecutor(max_workers=depth) as pool:
                buf = []
                for row in qdf.toLocalIterator():
                    buf.append(row[0])
                    if len(buf) >= chunk_size:
                        pending.append(pool.submit(run_chunk, buf))
                        buf = []
                        while len(pending) >= depth:
                            chunks.append(pending.popleft().result())
                if buf:
                    pending.append(pool.submit(run_chunk, buf))
                while pending:
                    chunks.append(pending.popleft().result())
    finally:
        if owned is not None:
            owned.unpersist()
    if not chunks:
        return spark.createDataFrame([], RESULT_SCHEMA)
    return _union_all(chunks)


def _query_broadcast_queries_filegroups(
    pt: DataFrame,
    qdf: DataFrame,
    k: int,
    *,
    colocated: bool = False,
    chunk_size: int | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Both-sides-big strategy without the driver funnel (r12 verdict
    #5): the query side is written to parquet FILE GROUPS by the
    executors, and each chunk's traversal tasks read their group's
    file directly — the driver orchestrates only paths and never
    deserializes a single query string.

    ``_query_broadcast_queries_chunked`` streams the query side
    through ``toLocalIterator`` and re-broadcasts each chunk, which is
    correct and memory-bounded but puts the driver NIC on the data
    path twice per chunk (collect up, broadcast down). At a truly
    query-side-huge scale (billions of strings) that funnel is the
    throughput ceiling. Here the movement is executors → shared
    storage → executors: one distributed write hashed on the query
    column (each DISTINCT string lands in exactly one group, so chunk
    results cannot duplicate), then per chunk every traversal task
    reads the group file from storage at aggregate-cluster read
    bandwidth. Per-chunk structure is otherwise identical to the
    broadcast path (same colocated zero-shuffle traversal, same eager
    pin per chunk), so correctness is the same union-of-chunks
    argument.

    ``scratch_dir`` must be visible to every executor (any shared
    filesystem; defaults to a local tempdir, which is exactly right on
    local[...] and on a cluster must be overridden with e.g. an HDFS
    or object-store path). Task-side reads go through pyarrow on the
    plain path."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    spark = pt.sparkSession
    if chunk_size is None:
        chunk_size = _AUTO_BROADCAST_QUERIES
    chunk_size = max(1, chunk_size)
    qcol = qdf.columns[0]
    owned = None
    if not colocated:
        # colocate ONCE for all chunks — see _colocate_forests for the
        # range-spread/AQE rationale
        owned = pt = _colocate_forests(pt).persist()
        pt.count()
    if scratch_dir is None:
        scratch_dir = spark.conf.get(
            "spark.prefixtree.filegroups.scratch", None
        )
    own_scratch = scratch_dir is None
    root = (
        tempfile.mkdtemp(prefix="ptq_filegroups_")
        if own_scratch
        else os.path.join(scratch_dir, f"ptq_filegroups_{_uuid.uuid4().hex}")
    )
    out_dir = os.path.join(root, "query_groups")
    try:
        write_query_groups(qdf, qcol, out_dir, chunk_size=chunk_size)
        return query_groups(pt, out_dir, k, colocated=True, _qcol=qcol)
    finally:
        if owned is not None:
            owned.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def write_query_groups(
    queries: DataFrame, col: str, path: str, *, chunk_size: int | None = None
) -> int:
    """Write a query side to parquet FILE GROUPS for ``query_groups``:
    distinct non-null strings hash-partitioned on the query column into
    ``ceil(n / chunk_size)`` files — each string in exactly one group,
    so downstream chunk results cannot duplicate. The write is
    executor-side end to end; the driver never holds a query string.

    The write-once/query-many half of the filegroups strategy: a
    pipeline that matches the same (huge) query corpus against many
    trees, distances, or index generations pays the distinct + write
    once and every ``query_groups`` call after that is pure traversal.
    Returns the number of file groups written."""
    import os

    if chunk_size is None:
        chunk_size = _AUTO_BROADCAST_QUERIES
    chunk_size = max(1, chunk_size)
    qdf = (
        queries.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .distinct()
    )
    n_q = qdf.count()
    n_files = max(1, -(-n_q // chunk_size))
    qdf.repartition(n_files, col).write.mode("overwrite").parquet(path)
    return len(_list_query_groups(path))


def query_groups(
    pt: DataFrame,
    path: str,
    max_distance: int,
    *,
    colocated: bool = False,
    max_concurrent: int = 2,
    _qcol: str | None = None,
) -> DataFrame:
    """Batch fuzzy search over a query side pre-written by
    ``write_query_groups`` — the both-sides-big strategy with the
    driver off the data path, as a reusable public step. One colocated
    zero-shuffle traversal of the (distributed) tree per file group;
    each group's traversal tasks read the group file straight from
    storage; per-group results are pinned eagerly and unioned. Same
    result contract as ``query``: DataFrame[query_string, node,
    final_distance].

    ``path`` must be visible to every executor (shared storage on a
    real cluster). ``colocated=True`` promises ``pt`` is fresh from
    ``create``/``load_index`` — else the tree is colocated once here
    for all groups.

    ``max_concurrent`` group jobs run at once (driver threads
    submitting independent Spark jobs): a strictly serial loop leaves
    the cluster idle during each chunk's driver-side turnaround
    (scheduling, checkpoint bookkeeping — the measured ~3 s/chunk
    fixed cost, SCALING r12), and overlapping the NEXT group's job
    into that gap hides it. Results are unioned in group order either
    way, and each job pins its own result, so concurrency changes
    wall-clock, never rows. Memory bound: ``max_concurrent`` in-flight
    group reads (one group's strings per traversal task)."""
    import os

    k = int(max_distance)
    spark = pt.sparkSession
    # refuse a partial write: a crashed/in-flight write_query_groups
    # leaves part files without the _SUCCESS marker, and serving those
    # would silently DROP every query in the unwritten groups — the
    # worst failure mode for a correctness-critical join. (The interim
    # filegroups mode path always writes then reads in-process, so its
    # marker is guaranteed present.)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise ValueError(
            f"query groups at {path!r} are incomplete (no _SUCCESS "
            "marker): write_query_groups did not finish — rerun it "
            "before serving queries from this directory"
        )
    files = _list_query_groups(path)
    if not files:
        return spark.createDataFrame([], RESULT_SCHEMA)
    if _qcol is None:
        import pyarrow.parquet as pq

        _qcol = pq.ParquetFile(files[0]).schema_arrow.names[0]
    owned = None
    if not colocated:
        # see _colocate_forests for the range-spread/AQE rationale
        owned = pt = _colocate_forests(pt).persist()
        pt.count()
    try:
        cap = max(2, int(max_concurrent))
        if max_concurrent <= 1 or len(files) == 1:
            chunks = [
                _query_filegroup(
                    pt, f, _qcol, k, cache_capacity=cap
                ).localCheckpoint(eager=True)
                for f in files
            ]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=max(1, int(max_concurrent))
            ) as pool:
                chunks = list(
                    pool.map(
                        lambda f: _query_filegroup(
                            pt, f, _qcol, k, cache_capacity=cap
                        ).localCheckpoint(eager=True),
                        files,
                    )
                )
        return _union_all(chunks)
    finally:
        if owned is not None:
            owned.unpersist()


def _list_query_groups(path: str) -> list[str]:
    import os

    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    )


# Per-WORKER memo of file-group query batches: every traversal task of
# one chunk job reads the same group file and builds the same
# QueryBatch; with reused python workers (spark.python.worker.reuse,
# the default) the second and later tasks on a worker can skip both.
# Keyed by (path, qcol, mtime_ns, size) so a rewritten group file can
# never serve a stale batch. Capacity scales with the number of group
# jobs interleaving tasks on one worker (query_groups passes its
# max_concurrent — r13 advice: the hardcoded 2 silently thrashed the
# LRU whenever a caller raised max_concurrent, every task rebuilding
# its QueryBatch); memory bound is capacity x one chunk's QueryBatch
# footprint per worker — the same order ``capacity`` concurrently
# running tasks already hold today.
_FILEGROUP_BATCH_CACHE: "OrderedDict[tuple, QueryBatch]" = OrderedDict()
_FILEGROUP_BATCH_CAPACITY = 2


def _filegroup_batch(
    chunk_path: str, qcol: str, capacity: int = _FILEGROUP_BATCH_CAPACITY
) -> QueryBatch:
    import os

    st = os.stat(chunk_path)
    key = (chunk_path, qcol, st.st_mtime_ns, st.st_size)
    cached = _FILEGROUP_BATCH_CACHE.get(key)
    if cached is not None:
        _FILEGROUP_BATCH_CACHE.move_to_end(key)
        return cached
    import pyarrow.parquet as pq

    strings = [
        s
        for s in pq.read_table(chunk_path, columns=[qcol]).column(0).to_pylist()
        if s is not None
    ]
    batch = QueryBatch(strings)
    _FILEGROUP_BATCH_CACHE[key] = batch
    cap = max(int(capacity), _FILEGROUP_BATCH_CAPACITY)
    while len(_FILEGROUP_BATCH_CACHE) > cap:
        _FILEGROUP_BATCH_CACHE.popitem(last=False)
    return batch


def _query_filegroup(
    pt: DataFrame, chunk_path: str, qcol: str, k: int, cache_capacity: int = 2
) -> DataFrame:
    """One file-group chunk of ``_query_broadcast_queries_filegroups``:
    the colocated per-forest traversal of ``_query_broadcast_queries``,
    except each task reads the chunk's query strings from storage
    instead of a driver broadcast. Only the path string rides the task
    closure; the read + QueryBatch build are memoized per worker
    (``_filegroup_batch``, LRU sized to the caller's job concurrency)."""

    def run_partition(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        batch = _filegroup_batch(chunk_path, qcol, cache_capacity)
        if not len(batch):
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        yield _traverse_pdf(pdf, batch, k)

    return pt.mapInPandas(run_partition, schema=RESULT_SCHEMA)


def reshard(pt: DataFrame, *, num_partitions: int | None = None) -> DataFrame:
    """Rebuild ``pt``'s forest layout from its end-cap words at a
    partition count whose per-partition forests fit a traversal task's
    budget (``_RESHARD_TARGET_PARTITION_NODES`` nodes per forest when
    ``num_partitions`` is not given) — the distributed-rebuild trick
    ``_merged_local_index`` uses (create on end-cap words), generalized
    from "one partition per first char" to whole-word hash at an
    explicit partition count (skew-proof at any scale; each word lives
    in exactly one partition, so query results cannot duplicate).

    ``auto`` mode re-shards internally when it meets a tree whose
    forests exceed the budget — and throws the result away when the
    call returns, so REPEATED query batches against the same oversized
    tree pay the rebuild every time. Pre-shard once instead::

        pt2 = reshard(pt).persist()      # or save_index(reshard(pt))
        query(pt2, batch1, "q", k, colocated=True)
        query(pt2, batch2, "q", k, colocated=True)   # no rebuild

    The result is a plain ``create`` output: colocated (safe for
    ``colocated=True``), persistable, and ``save_index``-able like any
    built tree. The word set is preserved verbatim (``trim="right"``
    is identity on end-cap words; the length cap is lifted), so query
    results are identical. ``n_copies`` multiplicity
    (``keep_duplicates=True`` trees) is carried by re-expanding each
    end-cap to its input count before the rebuild."""
    from prefixtree_spark.operators.build import create

    if num_partitions is None:
        n_nodes = pt.count()
        num_partitions = max(1, -(-n_nodes // _RESHARD_TARGET_PARTITION_NODES))
    caps = pt.where("is_word")
    if "n_copies" in pt.columns:
        words = caps.select(
            F.explode(
                F.array_repeat(F.col("node"), F.col("n_copies"))
            ).alias("w")
        )
        return create(
            words, "w", num_partitions=num_partitions, max_word_len=None,
            trim="right", keep_duplicates=True,
        )
    return create(
        caps.select(F.col("node").alias("w")), "w",
        num_partitions=num_partitions, max_word_len=None, trim="right",
    )


def _reshard_tree(pt: DataFrame, n_nodes: int) -> DataFrame:
    """auto mode's internal per-call reshard: delegate to ``reshard``
    at the budget-derived partition count; returns a PERSISTED
    colocated tree the caller unpersists."""
    target = max(1, -(-n_nodes // _RESHARD_TARGET_PARTITION_NODES))
    re_pt = reshard(pt, num_partitions=target).persist()
    re_pt.count()
    return re_pt


def _own_persist(df: DataFrame):
    """(df, owned): persist ``df`` unless the caller already holds a
    cache on it. Spark persistence has no refcount — a blind
    persist/unpersist pair around our probe would EVICT a cache the
    caller created for their own reuse, silently forcing their next
    call to rebuild the tree from source. We only release pins we
    created."""
    lvl = df.storageLevel
    owned = not (lvl.useMemory or lvl.useDisk)
    return (df.persist() if owned else df), owned


# _query_broadcast_tree batch spreading (r13): bounded probe size and
# per-task slice target. The r7 "no repartition" rule was measured
# with the old kernel, whose per-edge fixed cost made every task walk
# the whole tree at the same speed regardless of batch size. With the
# r13 kernel the walk is pruning-bound: a task with an 8x smaller
# batch prunes its active set ~2x earlier (measured on the 31.7k-node
# merged tree, 750 queries: whole-batch 1.21 s vs max 8-way slice
# 0.54 s at k=1; 2.58 vs 1.65 s at k=2). So SMALL batches are now
# spread across tasks — the extra CPU (each task still walks the tree
# top) is free on otherwise-idle cores, and the wall follows the max
# slice. Query sides beyond the probe bound stream through unchanged
# (they already fill every task; a full shuffle of a huge side would
# cost more than it saves).
_SPREAD_MAX_QUERIES = 32_768
_SPREAD_TARGET_SLICE = 96


def _query_broadcast_tree(
    queries: DataFrame, qcol: str, index: "LocalIndex", k: int
) -> DataFrame:
    """Tree collected+broadcast; queries stream through mapInPandas.
    The traversal index (arrays + children map) is built ONCE (by the
    caller or a reusable ``build_local_index`` handle) and broadcast
    prebuilt, so tasks deserialize it instead of re-deriving it per
    Arrow batch — and repeated ``query`` calls against the same handle
    reuse ONE broadcast instead of re-collecting + re-merging the tree
    per call (round-2 verdict #2: the per-call single-threaded driver
    trie rebuild was the serving path's scale hole)."""
    spark = queries.sparkSession
    bt = index.spark_broadcast(spark)

    def run(batches):
        idx = bt.value
        for pdf in batches:
            # dropna BEFORE astype: astype(str) turns None/NaN into the
            # literal strings 'None'/'nan', which would then be searched
            # as real queries (the old is-not-None guard ran after the
            # conversion and so could never fire)
            qs = list(pdf[qcol].dropna().astype(str))
            if qs:
                yield _traverse_index(idx, QueryBatch(qs), k)

    src = queries.select(F.col(qcol))
    # spread small batches (see the regime note above the constants);
    # the bounded limit+count probe never scans more than the bound + 1
    n_bound = src.limit(_SPREAD_MAX_QUERIES + 1).count()
    if n_bound <= _SPREAD_MAX_QUERIES:
        n_part = max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                -(-n_bound // _SPREAD_TARGET_SLICE),
            ),
        )
        # explicit repartition: AQE coalesces the (tiny) distinct
        # shuffle upstream to ~1 partition, so the plan's static
        # partition count cannot be trusted — an explicit N is exempt
        # from coalescing and the shuffle moves at most the probed
        # (small) byte size
        if n_part > 1:
            src = src.repartition(n_part)
    return src.mapInPandas(run, schema=RESULT_SCHEMA)


def _query_bfs(
    pt: DataFrame,
    queries: DataFrame,
    qcol: str,
    k: int,
    *,
    tree_partitioned: bool = False,
) -> DataFrame:
    """Level-synchronous frontier join — the reference's physical plan
    (LOOP + keyed JOIN, PrefixTree.ecl:430-442) on DataFrames.

    Each level: frontier ⋈ nodes on node_id == parent_id with the band
    and bound predicates as join filters (Catalyst pushes them into the
    join); the DP advance is an Arrow-batched pandas UDF over
    (query_string, state, node). End-caps exit to the accumulated
    result (frontier early-exit, PrefixTree.ecl:431-432).

    Physical shape (round-3 rework):
      - the tree side is persisted once and sized: small trees are
        BROADCAST into every level's join (zero shuffles per level —
        frontier stays in place, the per-level cost is one stage);
        trees too big to broadcast are hash-partitioned on
        ``parent_id`` ONCE, so every level's equi-join reuses that
        layout and only the (shrinking) frontier shuffles — the
        reference's keyed INDEX (PrefixTree.ecl:612-613). Pass
        ``tree_partitioned=True`` when ``pt`` is already laid out on
        parent_id (a bucketed table from ``save_index_bucketed``) to
        skip both the probe and the upfront shuffle.
      - ONE eager materialization per level (the next frontier, which
        runs the join + DP exactly once); end-cap rows are kept as
        LAZY slices off each level's checkpointed frontier and only
        evaluated in the final union — this replaces round-2's two
        eager checkpoints per level (the measured bfs overhead).
        Sparser cadences were measured and rejected: checkpointing
        every 2nd/3rd level fuses the intermediate joins into one
        stage but re-runs the fused DP chain when the skipped levels'
        end-caps are finally evaluated — 13.7s / 13.1s / 15.7s for
        cadence 1/2/3 on the 150-query sf0.1 workload, i.e. no win.
      - the final union is checkpointed before the tree side is
        unpersisted, so the returned DataFrame is self-contained.
    """
    spark = pt.sparkSession

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def dp_extend(query: pd.Series, state: pd.Series, label: pd.Series) -> pd.Series:
        """One vectorized multi-label DP per Arrow batch: every (query,
        node) row advances by its own edge label in a single padded
        numpy kernel (``extend_rows_multi``) — no per-label Python loop
        (a batch visits thousands of distinct nodes; grouping by label
        was the measured per-level bottleneck)."""
        n = len(query)
        if n == 0:
            return pd.Series([], dtype=object)
        batch = QueryBatch(query.tolist())
        rows = np.zeros((n, batch.max_len + 1), dtype=np.int32)
        for i, s in enumerate(state):
            arr = np.asarray(s, dtype=np.int32)
            rows[i, : len(arr)] = arr
        new = extend_rows_multi(batch, rows, np.arange(n), label.tolist())
        qlens = batch.lens
        return pd.Series([new[i, : qlens[i] + 1].tolist() for i in range(n)])

    # query() already null-filtered and deduplicated the query side
    # (its one-result-set-per-distinct-string contract) — repeating
    # .where(isNotNull).distinct() here cost a redundant full shuffle
    # of the query side on every bfs call (round-5 review); this
    # function is private to query(), which owns that contract.
    qdf = queries.select(F.col(qcol).alias("query_string"))
    # Spread the initial frontier over the full parallelism explicitly:
    # AQE coalesces the tiny distinct() shuffle to ONE partition, and
    # every later level inherits that layout through the (narrow)
    # broadcast join + DP — so the widest mid-trie level's DP would run
    # on a single core (measured: 42k-row level, 1 partition, 2.2s of
    # a 6.6s loop; the whole loop drops ~3x with the frontier spread).
    # An explicit numPartitions is exempt from AQE coalescing; the
    # frontier then STAYS at this width for the broadcast-tree path,
    # and the partitioned-tree path reshuffles it per level anyway.
    frontier = (
        qdf.select(
            "query_string",
            F.length("query_string").alias("qlen"),
            F.lit(VIRTUAL_ROOT_ID).cast("long").alias("node_id"),
            F.sequence(F.lit(0), F.length("query_string")).alias("state"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    base = pt.select("id", "parent_id", "_max", "_min", "is_word", "node")
    use_broadcast = False
    if tree_partitioned:
        nodes = base.persist()
    else:
        cached = base.persist()
        use_broadcast = cached.count() <= _BFS_BROADCAST_NODES
        if use_broadcast:
            nodes = cached
        else:
            # one upfront shuffle keyed like the per-level join, reused
            # by every level (persisted plans keep output partitioning)
            nodes = cached.repartition(F.col("parent_id")).persist()
            nodes.count()
            cached.unpersist()
    join_tree = F.broadcast(nodes) if use_broadcast else nodes
    try:
        results: list[DataFrame] = []
        # every level's checkpointed frontier stays referenced by its
        # caps slice until the final union — released together after
        # the result is pinned (no storage left behind, round-2 #4)
        checkpoints: list[DataFrame] = [frontier]
        while True:
            joined = frontier.join(
                join_tree, frontier.node_id == nodes.parent_id, "inner"
            ).where(
                (F.col("qlen") >= F.col("_min") - k)
                & (F.col("qlen") <= F.col("_max") + k)
            )
            # end-caps: path already spells the word; exact distance is
            # the last valid DP cell (≡ GetFinalDistance at is_word
            # rows). LAZY: re-derives from the checkpointed frontier at
            # final-union time (a cheap re-join, no DP).
            caps = (
                joined.where("is_word")
                .select(
                    "query_string",
                    "node",
                    F.expr("element_at(state, qlen + 1)").alias("final_distance"),
                )
                .where(F.col("final_distance") <= k)
                .select(
                    "query_string",
                    "node",
                    F.col("final_distance").cast("int").alias("final_distance"),
                )
            )
            results.append(caps)
            # the ONE eager step per level: join + DP advance, also
            # truncating the iterative lineage
            frontier = (
                joined.where(~F.col("is_word"))
                .select(
                    "query_string",
                    "qlen",
                    F.col("id").alias("node_id"),
                    dp_extend("query_string", "state", "node").alias("state"),
                )
                .where(F.array_min("state") <= k)
                .localCheckpoint(eager=True)
            )
            checkpoints.append(frontier)
            if frontier.isEmpty():
                break
        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        # pin before releasing the tree side and the per-level frontier
        # checkpoints the caps slices still reference
        out = out.localCheckpoint(eager=True)
        for cp in checkpoints:
            release_checkpoint(cp)
        return out
    finally:
        nodes.unpersist()


def query(
    pt: DataFrame,
    queries: DataFrame,
    col: str,
    max_distance: int,
    *,
    mode: str = "auto",
    colocated: bool = False,
    index: "LocalIndex | None" = None,
    tree_partitioned: bool = False,
    bytes: bool = False,
) -> DataFrame:
    """Batch fuzzy search ≡ QueryThorLevenshtein (PrefixTree.ecl:314-446).

    Returns DataFrame[query_string, node, final_distance] with one row
    per (query, dictionary word) pair at Levenshtein distance ≤
    ``max_distance``. ``pt`` is the node table from ``create``.

    ``index``: a reusable handle from ``build_local_index`` — the
    collect + merge + broadcast happens ONCE at handle build, and every
    subsequent ``query(..., index=handle)`` call reuses it (``pt`` is
    ignored). This is the repeated-query serving setup (the Roxie
    analog, PrefixTree.ecl:459-588) — without it, each
    ``broadcast_tree`` call pays a fresh driver-side collect + merge.

    ``colocated=True`` (safe for a tree fresh from ``create``) lets the
    distributed-tree strategy traverse in place with zero shuffle of
    the dictionary side; see ``_query_broadcast_queries``.

    ``tree_partitioned=True`` tells ``bfs`` mode that ``pt`` is already
    laid out on ``parent_id`` (e.g. via ``save_index_bucketed``), so it
    skips its upfront tree shuffle. Tables read from a catalog table
    bucketed on ``parent_id`` are DETECTED automatically
    (``index_is_bucketed``) — the flag exists for layouts the detector
    cannot see (e.g. a DataFrame you repartitioned yourself).

    ``bytes=True`` matches a tree built with ``create(..., bytes=True)``
    — edits count UTF-8 BYTES (the reference's ECL byte-string
    semantics, PrefixTree.ecl:74-78, and DuckDB ``levenshtein``'s):
    query strings enter the same ISO-8859-1 byte-surrogate space as the
    build, every kernel runs unchanged, and the result's
    ``query_string``/``node`` columns decode back to real UTF-8
    strings. The caller passes the SAME flag on both sides (same duty
    as ``trim``); mixing modes silently miscounts non-ASCII edits.
    """
    if bytes:
        from prefixtree_spark.functions.bytesurrogate import (
            from_byte_surrogate,
            to_byte_surrogate,
        )

        enc = queries.select(to_byte_surrogate(F.col(col)).alias(col))
        out = query(
            pt, enc, col, max_distance, mode=mode, colocated=colocated,
            index=index, tree_partitioned=tree_partitioned,
        )
        return out.select(
            from_byte_surrogate("query_string").alias("query_string"),
            from_byte_surrogate("node").alias("node"),
            "final_distance",
        )
    k = int(max_distance)
    # semantics: one result set per DISTINCT query string
    qdf = (
        queries.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .distinct()
    )
    if index is not None:
        return _query_broadcast_tree(qdf, col, index, k)
    if not tree_partitioned and mode in ("bfs", "auto"):
        # build-once/query-keyed: a tree loaded from a bucketed index
        # (save_index_bucketed ≡ BUILDINDEX, PrefixTree.ecl:612-613) is
        # already laid out on parent_id — skip bfs's upfront repartition
        # without the caller knowing the flag
        from prefixtree_spark.operators.build import index_is_bucketed

        tree_partitioned = index_is_bucketed(pt)
    if mode == "bfs":
        return _query_bfs(pt, qdf, col, k, tree_partitioned=tree_partitioned)
    if mode == "broadcast_tree":
        pt, owned = _own_persist(pt)
        try:
            return _query_broadcast_tree(qdf, col, _merged_local_index(pt), k)
        finally:
            if owned:
                pt.unpersist()
    if mode == "broadcast_queries":
        return _query_broadcast_queries(
            pt, [r[0] for r in qdf.collect()], k, colocated=colocated
        )
    if mode == "filegroups":
        # both-sides-big without the driver funnel: the query side is
        # hashed into parquet file groups executor-side and each
        # chunk's traversal tasks read their group straight from
        # storage — the driver never deserializes query text (the
        # billions-of-queries scale path; see
        # _query_broadcast_queries_filegroups). Opt-in: at the measured
        # sf0.1 both-big shape the toLocalIterator chunk loop is
        # equal-or-faster (SCALING r13), so auto keeps choosing it.
        return _query_broadcast_queries_filegroups(
            pt, qdf, k, colocated=colocated
        )
    if mode == "auto":
        # persist so the size probe and the chosen strategy share one
        # tree materialization (the build is the expensive part); every
        # route below either finishes with the tree collected or pins
        # its result, so OUR pin is always released before returning
        # (round-2 verdict #4) — but a cache the CALLER created is
        # theirs: unpersisting it would silently force the next call to
        # rebuild the whole tree from source (round-5 review).
        pt, owned = _own_persist(pt)
        try:
            n_nodes = pt.count()
            # min() so forcing _AUTO_BROADCAST_NODES down (tests, the
            # giant-forest bench) forces the distributed regimes past
            # the tiny-tree shortcut too
            if n_nodes <= min(_AUTO_DRIVER_TREE_NODES, _AUTO_BROADCAST_NODES):
                # tiny tree: collect + merge is ~free and the driver
                # handle serves any query side (queries stream through
                # mapInPandas, never collected)
                return _query_broadcast_tree(
                    qdf, col, _merged_local_index(pt, n_nodes), k
                )
            if n_nodes <= _AUTO_BROADCAST_NODES:
                # mid-size collectable tree: the distributed traversal
                # wins from ~10k nodes up (measured r7: 0.60 vs 2.13 s
                # at 736 queries × 36k nodes, k=2 — the per-call
                # collect+merge plus the one-task batch DP lose to
                # per-partition traversals that amortize node visits
                # across the whole broadcast batch). Queries must be
                # collectable for that route; a huge query side streams
                # through the broadcast-tree handle instead (the tree
                # is still the small side). ONE bounded job probes and
                # collects the query side together (limit N+1 collect):
                # the persist + count + collect trio cost two extra
                # jobs per call, and the collect is what the chosen
                # route needs anyway. The over-bound case wastes that
                # one bounded collect and streams instead — the rare
                # regime pays, not the common one.
                rows = qdf.limit(_AUTO_BROADCAST_QUERIES + 1).collect()
                if len(rows) <= _AUTO_BROADCAST_QUERIES:
                    return _query_broadcast_queries(
                        pt, [r[0] for r in rows], k, colocated=colocated
                    ).localCheckpoint(eager=True)
                return _query_broadcast_tree(
                    qdf, col, _merged_local_index(pt, n_nodes), k
                )
            # tree too big to collect: stays distributed. Probe the query
            # side BEFORE collecting it — with both sides large the
            # query side must stream through in chunks, never collect
            # whole. Pin the query side across the probe: count-then-
            # collect on the unpinned frame ran its scan + distinct
            # shuffle TWICE.
            qdf = qdf.persist()
            try:
                n_q = qdf.count()
                if n_q <= _AUTO_BROADCAST_QUERIES:
                    # materialize the traversal off the cached tree, then
                    # release it (the pinned result no longer needs pt)
                    return _query_broadcast_queries(
                        pt, [r[0] for r in qdf.collect()], k, colocated=colocated
                    ).localCheckpoint(eager=True)
                # big tree x big query set: chunk the query side through
                # the distributed-tree traversal (round-4 verdict #2 — bfs
                # measurably loses to brute force here at k>=2). Past
                # _AUTO_FILEGROUP_QUERIES the chunk loop itself switches
                # to filegroups — identical per-chunk traversal, but the
                # query text moves executors → storage → executors
                # instead of twice through the driver NIC (SCALING r13:
                # flat driver RSS, ~equal wall, identical rows).
                run_chunked = (
                    _query_broadcast_queries_filegroups
                    if n_q > _AUTO_FILEGROUP_QUERIES
                    else _query_broadcast_queries_chunked
                )
                per_part = n_nodes / max(1, pt.rdd.getNumPartitions())
                if per_part <= _CHUNK_MAX_PARTITION_NODES:
                    if colocated:
                        return run_chunked(pt, qdf, k, colocated=True)
                    # colocate HERE from the still-cached tree, then
                    # release OUR pin before the chunk loop: letting
                    # chunked pin its own copy while this frame's pt
                    # stays persisted held TWO full cached trees for the
                    # whole run — in exactly the regime defined by the
                    # tree being too big to collect. Overlap now lasts
                    # one repartition pass (caller-owned caches stay).
                    # Range spread at explicit 2x N — see
                    # _colocate_forests (hash-collision idle cores +
                    # the r8 AQE-coalesce trap: both_big_auto_k2 44 s
                    # vs 19 s when this exchange coalesced to ~1
                    # partition).
                    pt2 = _colocate_forests(pt).persist()
                    try:
                        pt2.count()
                        if owned:
                            pt.unpersist()
                        return run_chunked(pt2, qdf, k, colocated=True)
                    finally:
                        pt2.unpersist()
                # per-partition forests exceed a traversal task's
                # budget: RE-SHARD instead of bfs (round-5 verdict #1 —
                # bfs is the one plan measured to LOSE to brute force
                # at k>=2). Forest granularity is a build artifact:
                # rebuild distributed from the end-cap words at a
                # partition count that brings forests back under the
                # cap, then run the winning chunked traversal. Word set
                # (and therefore the result set) is preserved verbatim:
                # trim="right" is identity on end-cap words and the
                # length cap is lifted. bfs stays reachable only as an
                # explicit mode="bfs".
                pt3 = _reshard_tree(pt, n_nodes)
                try:
                    if owned:
                        pt.unpersist()
                    return run_chunked(pt3, qdf, k, colocated=True)
                finally:
                    pt3.unpersist()
            finally:
                qdf.unpersist()
        finally:
            if owned:
                pt.unpersist()
    raise ValueError(f"unknown mode {mode!r}")


# ---------------------------------------------------------------------------
# point-query serving path (Roxie analog)
# ---------------------------------------------------------------------------


class LocalIndex:
    """A collected, memory-resident node table for low-latency point
    queries — the honest Spark analog of Roxie serving a preloaded index
    (SURVEY.md §3.3): no distributed job per query, just a driver-side
    traversal over the same kernel."""

    def __init__(self, pt_pdf: pd.DataFrame, *, merge: bool = True):
        if merge:
            pt_pdf = merge_forests(pt_pdf)
        self.ids = pt_pdf["id"].to_numpy()
        self.labels = pt_pdf["node"].to_numpy()
        self.is_word = pt_pdf["is_word"].to_numpy()
        self.mins = pt_pdf["_min"].to_numpy()
        self.maxs = pt_pdf["_max"].to_numpy()
        # CSR adjacency instead of a dict of Python lists: three numpy
        # arrays pickle/deserialize as raw buffers, so every traversal
        # task decodes the broadcast in ~O(1) — a dict with one list
        # per internal node costs seconds per task at millions of nodes
        parents = np.asarray(pt_pdf["parent_id"].to_numpy(), dtype=np.int64)
        order = np.argsort(parents, kind="stable").astype(np.int64)
        sp = parents[order]
        uniq, starts = np.unique(sp, return_index=True)
        self._kids_pos = order
        self._kids_parents = uniq
        self._kids_offsets = np.append(starts, len(sp)).astype(np.int64)
        self._bc = None  # cached Spark broadcast (per-process, not pickled)

    def kids(self, parent_id: int):
        """Row positions of ``parent_id``'s children (build order), or
        None — CSR binary search, no per-node Python objects."""
        i = int(np.searchsorted(self._kids_parents, parent_id))
        if i >= len(self._kids_parents) or self._kids_parents[i] != parent_id:
            return None
        return self._kids_pos[self._kids_offsets[i] : self._kids_offsets[i + 1]]

    def __getstate__(self):
        state = {s: getattr(self, s) for s in self.__slots__ if s != "_bc"}
        return state

    def __setstate__(self, state):
        for s, v in state.items():
            setattr(self, s, v)
        self._bc = None

    __slots__ = (
        "ids",
        "labels",
        "is_word",
        "mins",
        "maxs",
        "_kids_pos",
        "_kids_parents",
        "_kids_offsets",
        "_bc",
    )

    def spark_broadcast(self, spark: SparkSession):
        """Broadcast this index ONCE and reuse it across ``query``
        calls; tasks deserialize the prebuilt arrays instead of the
        driver re-collecting + re-merging the node table per call."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self)
        return self._bc

    @classmethod
    def from_dataframe(cls, pt: DataFrame) -> "LocalIndex":
        return cls(pt.toPandas())

    def search(self, s: str, max_distance: int) -> list[tuple[str, int]]:
        batch = QueryBatch([s])
        _, words, dists = _traverse_auto(batch, int(max_distance), self)
        return sorted(zip(words, dists))

    def search_prefix(self, p: str) -> list[str]:
        """Sorted dictionary words starting with ``p`` — the trie's
        native second query type, on the same handle."""
        from prefixtree_spark.operators.prefix import search_prefix

        return search_prefix(self, p)

    def search_many(
        self, queries: list[str], max_distance: int
    ) -> list[tuple[str, str, int]]:
        """Batched serving lookups: ONE traversal shared by the whole
        batch, so each visited trie edge advances every active query's
        DP row in a single vectorized op — node visits amortize across
        the batch exactly as in the distributed strategies. Returns
        (query, word, distance) tuples (unordered)."""
        batch = QueryBatch(list(queries))
        q, w, d = _traverse_auto(batch, int(max_distance), self)
        return list(zip(q, w, d))


# Recently built query_one handles, keyed on the node table's semantic
# hash (+ schema + scanned-file listing, so in-place rewrites miss).
# Bounded LRU: each entry holds a collected tree, so the cap bounds
# driver memory at a few indexes.
_QUERY_ONE_CACHE: "OrderedDict[tuple[int, str, int], LocalIndex]" = OrderedDict()
_QUERY_ONE_CACHE_MAX = 4


def clear_local_index_cache() -> None:
    """Drop the cached ``query_one`` handles. Rarely needed: the cache
    key includes the scan's file listing, so table rewrites (new part
    files) miss naturally — this remains for sources whose mutation the
    listing cannot see (e.g. a file overwritten in place byte-for-byte
    under identical names)."""
    _QUERY_ONE_CACHE.clear()


def _cached_local_index(pt: DataFrame) -> LocalIndex:
    """One collect+merge per distinct node-table VERSION, not per call:
    repeated ``query_one(df, ...)`` on the same table reuse one handle.
    Keyed by (Catalyst semantic hash, schema, hash of the scan's file
    listing): cosmetic plan differences still hit, while rewriting the
    backing table in place — identical plan, new part files — changes
    the listing hash and rebuilds (round-4 advice: the plan-only key
    silently served stale words after ``save_index_bucketed``
    overwrites). In-memory relations list no files; their data lives in
    the plan itself, which the semantic hash already covers."""
    try:
        # inputFiles() is a driver-side listing (no job); its cost is
        # microscopic next to the collect+merge a miss would pay
        files_sig = hash(tuple(sorted(pt.inputFiles())))
        key = (pt.semanticHash(), pt.schema.simpleString(), files_sig)
    except Exception:  # non-classic backend without semanticHash
        return build_local_index(pt)
    idx = _QUERY_ONE_CACHE.get(key)
    if idx is None:
        idx = build_local_index(pt)
        _QUERY_ONE_CACHE[key] = idx
        while len(_QUERY_ONE_CACHE) > _QUERY_ONE_CACHE_MAX:
            _QUERY_ONE_CACHE.popitem(last=False)
    else:
        _QUERY_ONE_CACHE.move_to_end(key)
    return idx


def query_one(
    index: LocalIndex | DataFrame, s: str, max_distance: int,
    *, metric: str = "levenshtein", bytes: bool = False,
) -> list[tuple[str, int]]:
    """Single-string fuzzy lookup ≡ QueryRoxieLevenshtein
    (PrefixTree.ecl:459-588): returns [(word, distance)] sorted.

    ``metric="damerau"``: unrestricted Damerau-Levenshtein, the same
    candidates-at-2k + exact-rerank composition ``similarity_join``
    uses (lev ≤ 2·dl), so the serving path speaks the same metric as
    the batch join. The rerank is a handful of scalar DPs over the
    tree-pruned candidate list — point-lookup latency stays
    point-lookup-shaped.

    ``bytes=True``: byte-semantics lookup against an index built with
    ``create(..., bytes=True)`` — edits count UTF-8 bytes (the
    reference's ECL byte strings), results come back as real UTF-8
    strings; same both-sides caller duty as the batch ``query``.

    Pass a ``LocalIndex`` (``build_local_index``) for explicit handle
    control. A DataFrame argument is served from a small LRU of
    prebuilt handles keyed on the plan's semantic hash, so repeated
    calls against the same table pay ONE collect+merge — the Roxie
    preload contract — instead of re-collecting per call."""
    if metric not in ("levenshtein", "damerau"):
        raise ValueError(
            f"metric must be 'levenshtein' or 'damerau', got {metric!r}"
        )
    if isinstance(index, DataFrame):
        index = _cached_local_index(index)
    if bytes:
        # byte semantics against an index built with create(bytes=True)
        # — the same ISO-8859-1 byte-surrogate space as the batch path
        # (see query()); results decode back to real UTF-8. The sort
        # order survives the decode: UTF-8 byte order IS codepoint
        # order, so surrogate ties break identically.
        from prefixtree_spark.functions.bytesurrogate import (
            py_from_byte_surrogate,
            py_to_byte_surrogate,
        )

        raw = query_one(
            index, py_to_byte_surrogate(s), max_distance, metric=metric
        )
        return [(py_from_byte_surrogate(w), d) for w, d in raw]
    if metric == "damerau":
        from prefixtree_spark.functions.damerau import damerau_levenshtein

        out = []
        for word, lev_d in index.search(s, 2 * max_distance):
            if abs(len(word) - len(s)) > max_distance:
                continue  # dl >= |len diff|: cannot pass
            d = lev_d if lev_d <= 1 else damerau_levenshtein(s, word)
            if d <= max_distance:
                out.append((word, d))
        return sorted(out, key=lambda t: (t[1], t[0]))
    return index.search(s, max_distance)


def build_local_index(pt: DataFrame) -> LocalIndex:
    """Build the reusable serving/broadcast handle ONCE: collect the
    node table, merge the per-partition forests into one maximal-
    prefix-sharing trie, and wrap it for both driver-side point lookups
    (``query_one`` / ``search_many``) and distributed batch queries
    (``query(..., index=handle)``, which broadcasts the prebuilt index
    once and reuses it across calls).

    This is the preload step of the reference's serving engine (Roxie
    holds the BUILDINDEX output memory-resident across queries,
    PrefixTree.ecl:459-588, SURVEY.md §3.3); per-call rebuild was
    round-2's verdict item #1. Above ``_DRIVER_MERGE_NODES`` the merge
    itself runs distributed (see ``_merged_local_index``) — the driver
    only receives the final merged forest over Arrow."""
    pt, owned = _own_persist(pt)
    try:
        return _merged_local_index(pt)
    finally:
        if owned:
            pt.unpersist()
