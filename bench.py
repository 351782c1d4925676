"""Benchmark harness: runs the headline workloads at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Includes the BASELINE.md self-relative baselines:
  - ``fuzzy_brute_k1``: brute-force thresholded-levenshtein cross join
    (what the prefix tree must beat, B1);
  - ``point_query_100``: 100 serving-path lookups through the collected
    index (B4), vs ``point_brute_100`` over the collected word list.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from prefixtree_spark import create, query
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table
    from prefixtree_spark import workloads, workloads_ext, workloads_rel  # noqa: F401

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    extras: dict[str, float] = {}

    def bench(name: str, fn, *, repeats: int = 3, extra: bool = False) -> None:
        # Every headline entry reports the MEDIAN of `repeats` runs plus
        # the max-min spread: single-shot numbers swing up to 12x under
        # local[32] contention (the round-3 bench recorded 8-19x phantom
        # "regressions" that did not reproduce), so medians-with-spread
        # are the only regression-grade signal. The FIRST run is a
        # warmup (JIT, shuffle files, Python workers) excluded from the
        # median/spread — it routinely measured 2-4x the warm time and
        # made every spread exceed its median — but it is kept on
        # record as `<name>_cold`. Sub-second entries are extended to 5
        # runs: at those durations scheduler jitter is the same order as
        # the work itself, and 2 warm samples showed spread ~= median
        # (round-4 events_sessionize).
        runs = []
        out = None
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        while len(runs) < 5 and statistics.median(runs[1:] or runs) < 1.0:
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        warm = runs[1:] if len(runs) > 1 else runs
        # extra=True: full median/spread protocol, but the entry lives
        # in extras — regression-tracked without weighting the headline
        # (used for negative controls / explicitly discouraged modes)
        (extras if extra else times)[name] = round(statistics.median(warm), 3)
        if len(runs) > 1:
            extras[f"{name}_cold"] = round(runs[0], 3)
            extras[f"{name}_spread"] = round(max(warm) - min(warm), 3)
        if isinstance(out, (int, float)):
            extras[f"{name}_rows"] = out

    cust = load_table(spark, sf_dir, "customer")
    perturb = (
        "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)),"
        " substring(c_name, cast(c_custkey % length(c_name) as int) + 2))"
    )
    qdf = cust.where("c_custkey % 20 = 3").select(F.expr(perturb).alias("q")).cache()
    n_queries = qdf.count()
    extras["n_queries"] = n_queries

    # Contention isolation (round-5 verdict #5): dedup_minhash_lsh and
    # semantic_dedup_labeled are the two entries whose r05 spread
    # exceeded the 50%-of-median target — stage attribution (SCALING.md
    # round-5) shows no dominant stage, and the swings appear only when
    # they run late in a full bench, i.e. local[32] scheduler/GC debt
    # left by the preceding entries. Run them FIRST, with a JVM GC +
    # settle before each, so the published medians measure the
    # operators; the end-of-run spread audit below names any entry that
    # still exceeds the target.
    def quiet():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    for _name in ("dedup_minhash_lsh", "semantic_dedup_labeled"):
        quiet()
        bench(
            _name,
            lambda _name=_name: workloads.QUERIES[_name](spark, sf_dir).count(),
            repeats=5,
        )

    # Stateful streaming entries run EARLY for the same reason (round-10
    # verdict #1): in r10 they ran LAST, immediately after the
    # ingest_scale_verify extras built and tore down a ~6M-doc corpus in
    # the same JVM, and recorded 8.75/7.24 s vs a quiet-machine 1.3-1.6 s
    # (4-6x pure JVM/GC residue — the quiet probe in SCALING.md r11
    # attributes it). Micro-batch latency is the most contention-
    # sensitive number in the bench, so it gets the cleanest JVM.
    import shutil as _st_sh
    import tempfile as _st_tf

    from prefixtree_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )
    from prefixtree_spark.streaming.sessionize import streaming_sessionize

    stream_dir = _st_tf.mkdtemp(prefix="bench_events_stream_")
    _st_sh.copy(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")

    def sessionize_stream():
        stream = read_events_stream(spark, stream_dir)
        sink = run_stream_to_memory(
            spark,
            streaming_sessionize(stream, gap_minutes=30),
            "bench_sessionize_stream",
            output_mode="append",
            timeout_s=300,
        )
        return sink.count()

    quiet()
    bench("events_sessionize_stream", sessionize_stream)

    def topk_stream():
        from prefixtree_spark.streaming.topk import latest_topk, streaming_topk

        stream = read_events_stream(spark, stream_dir)
        sink = run_stream_to_memory(
            spark,
            streaming_topk(stream, k=10),
            "bench_topk_stream",
            output_mode="append",
            timeout_s=300,
        )
        return latest_topk(sink).count()

    quiet()
    bench("events_topk_stream", topk_stream)
    _st_sh.rmtree(stream_dir, ignore_errors=True)

    # B3: index build
    pt_holder = {}

    def build():
        if "pt" in pt_holder:
            pt_holder["pt"].unpersist()
        pt = create(cust, "c_name").persist()
        n = pt.count()
        pt_holder["pt"] = pt
        return n

    bench("build_index", build)

    # B1 headline: tree-accelerated fuzzy join vs brute force
    bench(
        "fuzzy_tree_k1",
        lambda: query(pt_holder["pt"], qdf, "q", 1, mode="broadcast_tree").count(),
    )
    # the serving setup: collect+merge+broadcast ONCE (untimed handle
    # build + one warmup call creating the broadcast), then repeated
    # query() calls reuse the handle — the number the round-2 verdict
    # asked for (a WARM second call vs the per-call rebuild above)
    from prefixtree_spark import build_local_index

    handle = build_local_index(pt_holder["pt"])
    query(pt_holder["pt"], qdf.limit(1), "q", 1, index=handle).count()
    bench(
        "fuzzy_tree_k1_warm",
        lambda: query(pt_holder["pt"], qdf, "q", 1, index=handle).count(),
    )
    # the 100 TB path: tree stays distributed, zero-shuffle traversal.
    # 5 repeats: this is the flagship number, and its r05 spread hit
    # 55% of median at 3 repeats under local[32] contention
    bench(
        "fuzzy_tree_distributed_k1",
        lambda: query(
            pt_holder["pt"], qdf, "q", 1, mode="broadcast_queries", colocated=True
        ).count(),
        repeats=5,
    )
    words = cust.select(F.trim("c_name").alias("word")).where("word <> ''").distinct()
    # thresholded levenshtein returns -1 when the bound is exceeded,
    # so the filter must be >= 0, not <= k
    bench(
        "fuzzy_brute_k1",
        lambda: qdf.distinct()
        .crossJoin(words)
        .where(F.levenshtein("q", "word", 1) >= 0)
        .count(),
    )
    # higher edit distance: weaker pruning, the stress case for the tree
    bench(
        "fuzzy_tree_distributed_k2",
        lambda: query(
            pt_holder["pt"], qdf, "q", 2, mode="broadcast_queries", colocated=True
        ).count(),
    )
    bench(
        "fuzzy_brute_k2",
        lambda: qdf.distinct()
        .crossJoin(words)
        .where(F.levenshtein("q", "word", 2) >= 0)
        .count(),
    )
    # the reference's own physical plan (LOOP + keyed JOIN) — tracked
    # since the round-3 rework (tree side pre-partitioned + one eager
    # materialization per level instead of two). 150 queries: bfs is
    # the both-sides-huge fallback; per-level Arrow DP overhead makes
    # it the slowest strategy at small scale (expected, documented).
    # Demoted from the headline (round-6 verdict #7): 7s and 14%
    # spread for an explicitly discouraged opt-in mode distorted the
    # headline total; it stays a regression extra with its own median.
    qdf_bfs = qdf.limit(150).cache()
    qdf_bfs.count()
    bench(
        "fuzzy_tree_bfs_k1",
        lambda: query(pt_holder["pt"], qdf_bfs, "q", 1, mode="bfs").count(),
        extra=True,
    )
    qdf_bfs.unpersist()

    # prefix-tree skew stress (round-10 verdict #7, the SURVEY §4
    # salting case): a dictionary where ONE hot prefix ("CORP") holds
    # ~50% of the words. The reference's prefix-locality layout
    # (prefix_len=4 — the hot prefix length) hashes every CORP* word
    # to ONE partition: that worker builds half the tree and does half
    # of every colocated query's join work — the straggler. The
    # engine's DEFAULT layout (hash on the whole word) spreads the
    # same words uniformly — the mitigation, on by default. Wall time
    # for build and distributed query per layout, plus the
    # deterministic layout evidence (max partition's node share).
    n_sk_w = max(4_000, int(200_000 * float(sf)))
    skew_words = (
        spark.range(n_sk_w // 2)
        .select(F.concat(F.lit("CORP"), F.md5(F.col("id").cast("string"))).alias("w"))
        .unionByName(
            spark.range(n_sk_w // 2, n_sk_w)
            .select(F.md5(F.col("id").cast("string")).alias("w"))
        )
        .cache()
    )
    skew_words.count()
    skew_q = (
        skew_words.where(F.crc32(F.col("w")) % 100 == 3)
        .select(
            F.concat(F.substring("w", 1, 9), F.substring("w", 11, 255)).alias("q")
        )
        .cache()
    )
    extras["fuzzy_skew_n_words"] = n_sk_w
    extras["fuzzy_skew_n_queries"] = skew_q.count()
    skew_pt = {}
    for tag, kw in (("prefixlocal", {"prefix_len": 4}), ("hash", {})):
        t0 = time.time()
        pt_sk = create(skew_words, "w", **kw).persist()
        n_nodes = pt_sk.count()
        extras[f"fuzzy_skew_build_{tag}_sec"] = round(time.time() - t0, 3)
        part_counts = [
            r[1]
            for r in pt_sk.groupBy(F.spark_partition_id())
            .count()
            .collect()
        ]
        extras[f"fuzzy_skew_maxpart_frac_{tag}"] = round(
            max(part_counts) / max(1, n_nodes), 3
        )
        skew_pt[tag] = pt_sk
        bench(
            f"fuzzy_skew_query_{tag}",
            lambda tag=tag: query(
                skew_pt[tag], skew_q, "q", 1,
                mode="broadcast_queries", colocated=True,
            ).count(),
            extra=True,
        )
    for pt_sk in skew_pt.values():
        pt_sk.unpersist()
    skew_words.unpersist()
    skew_q.unpersist()

    # SemDeDup-at-scale evidence (r11, untimed extras — headline
    # unchanged): a synthetic corpus big enough that cell-boundary
    # splits actually occur (planted near-dup twins, every 8th base
    # vector; ground truth = the twin set by construction, margins
    # verified in the workload fixture's method). The claims on
    # record: (a) single-cell assignment (the published SemDeDup
    # trade, n_replicas=1) MISSES the twins split across a boundary;
    # (b) multi-probe replication (n_replicas=2) recovers recall 1.0;
    # (c) precision is exact in both (candidates are exact-verified);
    # (d) the scored-candidate count vs all-pairs is the pruning
    # factor that makes the quadratic rule tractable. Centroids are
    # fit ONCE and shared — the fit isn't the claim.
    import shutil as _sd_sh
    import tempfile as _sd_tf

    import numpy as _sd_np
    import pandas as _sd_pd

    from prefixtree_spark.operators import ann as _sd_ann

    # 240k×sf: at sf0.1's 24k base the cell-boundary misses the block
    # exists to demonstrate actually occur (quiet probe: reps=1 recall
    # 0.9943 at 27k vectors, 1.0 at 9k — the trade is scale-dependent)
    sd_n = max(2_000, int(240_000 * float(sf)))
    sd_rng = _sd_np.random.default_rng(17)
    sd_base = sd_rng.standard_normal((sd_n, 64))
    sd_twin_src = _sd_np.arange(0, sd_n, 8)
    sd_twins = sd_base[sd_twin_src] * (
        1.0 + 0.02 * _sd_np.sin(
            13.0 * sd_twin_src[:, None] + _sd_np.arange(64)[None, :]
        )
    )
    sd_ids = _sd_np.concatenate(
        [_sd_np.arange(sd_n), sd_twin_src + 10_000_000]
    )
    sd_m = _sd_np.vstack([sd_base, sd_twins])
    sd_dir = _sd_tf.mkdtemp(prefix="bench_semdedup_scale_")
    spark.createDataFrame(
        _sd_pd.DataFrame({
            "vec_id": sd_ids.astype("int64"),
            "embedding": [r.astype("float64").tolist() for r in sd_m],
        })
    ).repartition(16).write.mode("overwrite").parquet(f"{sd_dir}/corpus")
    sd_corpus = spark.read.parquet(f"{sd_dir}/corpus")
    extras["semdedup_scale_n"] = int(len(sd_ids))
    extras["semdedup_scale_twins"] = int(len(sd_twin_src))
    t0 = time.time()
    sd_cent = _sd_ann.kmeans_fit(sd_corpus, "embedding", 64, seed=42)
    extras["semdedup_scale_fit_sec"] = round(time.time() - t0, 3)
    sd_want = set((sd_twin_src + 10_000_000).tolist())
    sd_all = set(sd_ids.tolist())
    for reps in (1, 2):
        t0 = time.time()
        surv = {
            r[0]
            for r in _sd_ann.semantic_dedup_ivf(
                sd_corpus, "vec_id", "embedding", threshold=0.9,
                n_cells=64, n_replicas=reps, seed=42, centroids=sd_cent,
            ).collect()
        }
        extras[f"semdedup_scale_reps{reps}_sec"] = round(time.time() - t0, 3)
        dropped = sd_all - surv
        extras[f"semdedup_scale_reps{reps}_recall"] = round(
            len(dropped & sd_want) / max(1, len(sd_want)), 4
        )
        extras[f"semdedup_scale_reps{reps}_false_drops"] = len(
            dropped - sd_want
        )
        # scored-candidate slots: one exact dot per same-cell pair —
        # the work the cell partition bounds; all-pairs is the bar
        from pyspark.sql import functions as _sd_F

        assign = _sd_ann._cell_assign_udf(sd_cent, reps)
        slots = (
            sd_corpus.withColumn(
                "cell", _sd_F.explode(assign(_sd_F.col("embedding")))
            )
            .groupBy("cell")
            .agg(_sd_F.count(_sd_F.lit(1)).alias("n"))
            .agg(_sd_F.sum(_sd_F.expr("n * (n - 1) / 2")).cast("long"))
            .collect()[0][0]
        )
        extras[f"semdedup_scale_reps{reps}_pair_slots"] = int(slots)
    n_tot = len(sd_ids)
    extras["semdedup_scale_allpairs"] = n_tot * (n_tot - 1) // 2
    _sd_sh.rmtree(sd_dir, ignore_errors=True)

    # B4: serving path — 100 point queries on the preloaded handle
    # (the same one the warm batch entry reuses; building a second
    # LocalIndex here would double-pay the collect+merge)
    idx = handle
    qs100 = [r.q for r in qdf.limit(100).collect()]

    def points():
        # batched serving API — same shape as the brute baseline below,
        # which also runs all 100 queries through one vectorized batch
        return len(idx.search_many(qs100, 1))

    bench("point_query_100", points)
    word_list = [r.word for r in words.collect()]

    def point_brute():
        # fair baseline: the same vectorized DP kernel, but run against
        # EVERY word (no tree, no pruning, no prefix sharing)
        import numpy as np

        from prefixtree_spark.functions.levenshtein import QueryBatch, extend_rows

        batch = QueryBatch(qs100)
        idx0 = np.arange(len(qs100))
        init = batch.initial_rows()
        total = 0
        for w in word_list:
            finals = batch.final_distances(extend_rows(batch, init, idx0, w), idx0)
            total += int((finals <= 1).sum())
        return total

    bench("point_brute_100", point_brute)

    # incremental maintenance: a 10% vocabulary delta applied to an
    # existing index vs rebuilding from raw (= build_index above). The
    # scale claim: delta cost tracks the DELTA + node table, not the
    # corpus.
    from prefixtree_spark import add_words, remove_words

    pt90 = create(cust.where("c_custkey % 10 != 0"), "c_name").persist()
    pt90.count()
    bench(
        "add_words_delta",
        lambda: add_words(pt90, cust.where("c_custkey % 10 = 0"), "c_name").count(),
    )
    bench(
        "remove_words_delta",
        lambda: remove_words(
            pt_holder["pt"], cust.where("c_custkey % 10 = 0"), "c_name"
        ).count(),
    )
    # sparse-delta plans (r7): a 3-word delete under the pruned plan
    # (touched forests only reach Python) vs the one-shot cogroup that
    # pushes the whole node table through Arrow. At fixture scale the
    # gap is modest (the structural claim is pinned by plan tests);
    # recorded so regressions in either branch are visible.
    three = cust.limit(3).select("c_name")
    for label, forced in (("pruned", True), ("bulkplan", False)):
        t0 = time.time()
        remove_words(pt_holder["pt"], three, "c_name", pruned=forced).count()
        extras[f"sparse_remove_{label}_sec"] = round(time.time() - t0, 3)
    pt90.unpersist()
    pt_holder["pt"].unpersist()

    # both-sides-big regime via mode="auto" (round-5 verdict #2): a 4x
    # dictionary (four perturbations per customer name, ~60k words at
    # sf0.1) against EVERY perturbed name as a query (~15k), k=2 — the
    # shape where bfs measured 298s vs ~56s brute in round 4. auto now
    # chunks the query side through the distributed traversal; the
    # thresholds are forced down so this fixture-sized run exercises
    # the same route a 100 TB input would take. Single-shot untimed
    # extra: the comparison target is SCALING.md's ~56s brute estimate
    # at this shape, not a per-round regression line.
    import prefixtree_spark.operators.query as _qmod

    dict_exprs = [
        perturb,
        "concat(c_name, '_', cast(c_custkey % 7 as string))",
        "upper(reverse(c_name))",
        "concat(substring(c_name, 2, 30), cast(c_custkey % 13 as string))",
    ]
    words_big = cust.selectExpr(f"{dict_exprs[0]} as w")
    for e in dict_exprs[1:]:
        words_big = words_big.union(cust.selectExpr(f"{e} as w"))
    pt_big = create(
        words_big, "w",
        num_partitions=spark.sparkContext.defaultParallelism,
    ).persist()
    extras["both_big_dict_words"] = words_big.distinct().count()
    pt_big.count()
    q_big = cust.select(F.expr(perturb).alias("q"))
    extras["both_big_queries"] = q_big.distinct().count()
    saved = (_qmod._AUTO_BROADCAST_NODES, _qmod._AUTO_BROADCAST_QUERIES)
    try:
        _qmod._AUTO_BROADCAST_NODES = 0
        _qmod._AUTO_BROADCAST_QUERIES = 5000
        # HEADLINE (r11 verdict #8): the both-sides-big chunked
        # traversal is THE 100 TB query path, and until r12 it lived
        # only in single-shot extras — regression-guard it every round
        # with the full median protocol. r11 extras band: 1.485 s
        # cold single-shot at this exact shape.
        bench(
            "fuzzy_both_big_auto",
            lambda: query(pt_big, q_big, "q", 2, mode="auto").count(),
            repeats=3,
        )
    finally:
        _qmod._AUTO_BROADCAST_NODES, _qmod._AUTO_BROADCAST_QUERIES = saved

    # filegroups at a 10x query side (r12 verdict #5): the chunked
    # strategy with the driver OFF the data path — query side written
    # to parquet file groups executor-side, traversal tasks read their
    # group from storage, the driver handles only paths. Evidence
    # recorded: (a) driver RSS stays flat across the run (the
    # toLocalIterator path would deserialize every query string into
    # the driver heap), (b) wall is ~linear in chunk count (two chunk
    # sizes at the same shape), (c) row parity with the broadcast-
    # chunked path at the same shape. Single-shot untimed extras.
    def _rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
        return -1.0

    # One filegroups run per round as the regression line; the full
    # evidence set (two chunk counts ~equal wall 118.8/112.8 s,
    # filegroups RSS delta 0.0-0.1 MB vs +9.9 MB for the
    # toLocalIterator funnel at the same shape, identical 2,612,158
    # rows) is the SCALING.md r13 record — rerunning the funnel
    # comparison every round would add ~220 s for a structural fact.
    q10 = (
        cust.crossJoin(spark.range(10).withColumnRenamed("id", "i"))
        .selectExpr(f"concat({perturb}, '_', cast(i as string)) as q")
    )
    extras["filegroups_10x_queries"] = q10.distinct().count()
    rss0 = _rss_mb()
    t0 = time.time()
    n_fg = _qmod._query_broadcast_queries_filegroups(
        pt_big, q10.distinct(), 2, colocated=True, chunk_size=25_000
    ).count()
    extras["filegroups_10x_sec"] = round(time.time() - t0, 3)
    extras["filegroups_10x_rows"] = n_fg
    extras["filegroups_10x_rss_delta_mb"] = round(_rss_mb() - rss0, 1)

    # r13 verdict #7: core-scaling probe for the TRAVERSAL family —
    # untimed extra sized so the c8/c32 ratio can express parallelism
    # (at sf0.1 nearly every headline entry is fixed-cost/scheduler
    # bound: BENCH_r13_c8 total ~= BENCH_r13 total). The shape is
    # pinned independent of the core count: the tree is built at an
    # EXPLICIT 64 partitions (the headline pt_big uses
    # defaultParallelism, so its c8 build has 8 forests and the work
    # itself differs between runs) and the whole 12.7k-query batch
    # runs as ONE colocated traversal job of 64 tasks — identical DP
    # work at any core count, so wall ratio ~= core utilization.
    # Second (warm) run is the comparable number.
    pt_sp = create(words_big, "w", num_partitions=64).persist()
    pt_sp.count()
    qs_sp = [r[0] for r in q_big.distinct().collect()]
    for tag in ("cold", "warm"):
        t0 = time.time()
        n_sp = _qmod._query_broadcast_queries(
            pt_sp, qs_sp, 2, colocated=True
        ).count()
        extras[f"scaleprobe_traversal_{tag}_sec"] = round(time.time() - t0, 3)
    extras["scaleprobe_traversal_rows"] = n_sp
    pt_sp.unpersist()
    pt_big.unpersist()

    # giant-forest regime (round-5 verdict #1): the same both-big shape
    # but the tree deliberately built as ONE forest and the chunk cap
    # forced below it, so auto must RE-SHARD (rebuild from end-cap
    # words at more partitions) before running the chunked traversal —
    # the route that replaced the bfs fallback measured at 298 s vs
    # ~56 s brute in round 4. Brute is timed at the SAME shape below so
    # the auto-beats-brute claim is a recorded measurement.
    pt_giant = create(words_big, "w", num_partitions=1).persist()
    n_giant = pt_giant.count()
    extras["giant_forest_nodes"] = n_giant
    saved_g = (
        _qmod._AUTO_BROADCAST_NODES,
        _qmod._AUTO_BROADCAST_QUERIES,
        _qmod._CHUNK_MAX_PARTITION_NODES,
        _qmod._RESHARD_TARGET_PARTITION_NODES,
    )
    try:
        _qmod._AUTO_BROADCAST_NODES = 0
        _qmod._AUTO_BROADCAST_QUERIES = 5000
        # per-partition nodes (= all of them) exceed the cap → re-shard
        _qmod._CHUNK_MAX_PARTITION_NODES = max(1, n_giant // 2)
        _qmod._RESHARD_TARGET_PARTITION_NODES = max(
            1, n_giant // spark.sparkContext.defaultParallelism
        )
        t0 = time.time()
        n = query(pt_giant, q_big, "q", 2, mode="auto").count()
        extras["giant_forest_auto_k2_sec"] = round(time.time() - t0, 3)
        extras["giant_forest_auto_k2_rows"] = n
        # round-6 verdict #5: pre-shard ONCE with the public reshard(),
        # then the SECOND query batch skips the per-call rebuild — its
        # cost is the chunked traversal alone (compare the _second_sec
        # extra against _auto_k2_sec, which pays rebuild + traversal)
        from prefixtree_spark import reshard as _reshard

        t0 = time.time()
        pt_pre = _reshard(
            pt_giant,
            num_partitions=spark.sparkContext.defaultParallelism,
        ).persist()
        pt_pre.count()
        extras["giant_forest_reshard_once_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        n2 = query(pt_pre, q_big, "q", 2, mode="auto", colocated=True).count()
        extras["giant_forest_presharded_second_sec"] = round(
            time.time() - t0, 3
        )
        assert n2 == n, (n2, n)
        pt_pre.unpersist()
    finally:
        (
            _qmod._AUTO_BROADCAST_NODES,
            _qmod._AUTO_BROADCAST_QUERIES,
            _qmod._CHUNK_MAX_PARTITION_NODES,
            _qmod._RESHARD_TARGET_PARTITION_NODES,
        ) = saved_g
    pt_giant.unpersist()
    words_brute = (
        words_big.select(F.trim("w").alias("w2")).where("w2 <> ''").distinct()
    )
    t0 = time.time()
    nb = (
        q_big.distinct()
        .crossJoin(words_brute)
        .where(F.levenshtein("q", "w2", 2) >= 0)
        .count()
    )
    extras["both_big_brute_k2_sec"] = round(time.time() - t0, 3)
    extras["both_big_brute_k2_rows"] = nb

    # pipeline extensions
    catalog = workloads.QUERIES
    # dedup_minhash_lsh and semantic_dedup_labeled run in the isolated
    # quiet block at the top of the bench (round-5 verdict #5)
    for name in [
        "dedup_simhash_pairs",
        "ann_topk_cosine",
        "ann_topk_ivf",
        "ann_topk_int8",
        "text_stats",
        "doc_fingerprint",
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "events_sessionize",
        "events_pivot_types",
        "events_resampled_hourly",
        "docs_pii_redacted",
        "dedup_duplicate_spans",
        "docs_mixture_resample",
        "fuzzy_join_damerau",
    ]:
        bench(
            name,
            lambda name=name: catalog[name](spark, sf_dir).count(),
            # events_resampled_hourly joined the 5-repeat set after a
            # GC-outlier spread at repeats=3 in the r05 final run
            repeats=5 if name == "events_resampled_hourly" else 3,
        )
    # r11: the IVF-candidate SemDeDup gate workload (publish once,
    # cached; per-call = assignment + cell self-join + exact verify) —
    # extra, not headline: the headline SemDeDup cost is
    # semantic_dedup_labeled above
    bench(
        "semantic_dedup_corpus",
        lambda: catalog["semantic_dedup_corpus"](spark, sf_dir).count(),
        extra=True,
    )
    # r12: byte-semantics fuzzy join (bytes=True end to end on an
    # accented vocabulary) — extra, recorded so the "byte mode costs
    # one encode/decode Project, nothing more" claim is measured every
    # round next to the codepoint-mode entries above
    bench(
        "fuzzy_join_unicode_bytes",
        lambda: catalog["fuzzy_join_unicode_bytes"](spark, sf_dir).count(),
        extra=True,
    )

    # minhash stage breakdown (round-5 verdict #3): time each pipeline
    # stage separately, materialized via cache+count. Isolated warm
    # profiling shows ~3s total with NO dominant stage (shingle 0.7 /
    # signature 0.9 / band-join 0.9 / verify 1.3 at sf0.1) — the 10s+
    # readings in full bench runs are contention, not the collect_list
    # signature shuffle. Recorded per round so a real regression in any
    # one stage is attributable.
    #
    # Measurement fix, r13 session 3 (declared per the bench contract,
    # extras only — no `queries` entry touched): the stages now mirror
    # the FUSED pipeline the entry actually runs (grouped fingerprint
    # arrays feeding both the signature UDF and the hash-set verify).
    # `minhash_stage_shingle` keeps its meaning (tokenize+shingle, now
    # materialized through the grouped build it feeds);
    # `minhash_stage_signature` is the UDF over the grouped table;
    # `minhash_stage_verify` is the array-intersect verify. Pre-fusion
    # rounds' numbers measured the exploded-verify shape and are not
    # directly comparable for signature/verify.
    from prefixtree_spark.operators.dedup import (
        _band_buckets,
        _grouped_shingle_hashes,
        _jaccard_from_grouped,
        _signatures_from_grouped,
        token_shingles,
    )

    docs_mh = load_table(spark, sf_dir, "documents").cache()
    docs_mh.count()
    for tag in ("cold", "warm"):  # second pass is the recorded warm one
        t0 = time.time()
        g_mh = _grouped_shingle_hashes(
            token_shingles(docs_mh, "doc_id", "text", 3)
        ).cache()
        g_mh.count()
        extras[f"minhash_stage_shingle_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        sig_mh = _signatures_from_grouped(g_mh, num_perm=64).cache()
        sig_mh.count()
        extras[f"minhash_stage_signature_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        banded_mh = _band_buckets(sig_mh, 32, 2)
        xm, ym = banded_mh.alias("x"), banded_mh.alias("y")
        cand_mh = (
            xm.join(
                ym,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
            .distinct()
            .cache()
        )
        cand_mh.count()
        extras[f"minhash_stage_band_join_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        _jaccard_from_grouped(g_mh, 0.8, cand_mh).count()
        extras[f"minhash_stage_verify_{tag}"] = round(time.time() - t0, 3)
        g_mh.unpersist()
        sig_mh.unpersist()
        cand_mh.unpersist()
    docs_mh.unpersist()

    # r13 verdict #7: core-scaling probe for the LSH band-join family —
    # untimed extra, same protocol as scaleprobe_traversal. The corpus
    # is replicated 3x with a per-replica tail token (shingles stay
    # ~identical so every replica pair becomes a candidate): ~3x the
    # signature UDF work and ~9x the band-join/verify pairs, enough
    # compute for the c8/c32 ratio to express parallelism. Shuffle
    # partitioning pinned at 64 so both runs shuffle identically.
    docs_sp = (
        load_table(spark, sf_dir, "documents")
        .crossJoin(spark.range(3).withColumnRenamed("id", "rep"))
        .selectExpr(
            "doc_id * 4 + rep as doc_id",
            "concat(text, ' zz', cast(rep as string)) as text",
        )
        .cache()
    )
    docs_sp.count()
    _saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        from prefixtree_spark.operators import dedup as _dedup_ops

        for tag in ("cold", "warm"):
            t0 = time.time()
            n_spm = _dedup_ops.minhash_lsh_pairs(
                docs_sp, "doc_id", "text", n=3, num_perm=64,
                bands=32, threshold=0.8,
            ).count()
            extras[f"scaleprobe_lsh_{tag}_sec"] = round(time.time() - t0, 3)
        extras["scaleprobe_lsh_rows"] = n_spm
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _saved_sp)
    docs_sp.unpersist()

    # IVF accuracy/speed curve (untimed extras — headline_total
    # unchanged): recall@10 vs the exact top-k across the two levers
    # (probe width, posting replicas), with wall time per config. The
    # embeddings FIXTURE is unclustered (same-label and cross-label
    # cosines are statistically identical — measured in SCALING.md), so
    # it is IVF's worst case: ≥0.9 recall needs ~0.6x of the corpus
    # scanned. The clustered-corpus entry below shows the same operator
    # reaching ≥0.9 probing 25% of cells when the data has structure —
    # the regime the scale path is FOR.
    from prefixtree_spark.operators import ann as ann_ops
    from prefixtree_spark.sources.tables import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    q_emb = emb.where("vec_id % 50 = 0")
    exact_set = {
        (r.query_id, r.vec_id)
        for r in catalog["ann_topk_cosine"](spark, sf_dir).collect()
    }

    def ivf_point(tag, src_q, src_c, exact, **kw):
        t0 = time.time()
        got = {
            (r.query_id, r.vec_id)
            for r in ann_ops.cosine_topk_ivf(
                src_q, "vec_id", "embedding", src_c, "vec_id", "embedding",
                k=10, **kw,
            ).collect()
        }
        extras[f"ivf_{tag}_sec"] = round(time.time() - t0, 3)
        extras[f"ivf_{tag}_recall"] = round(
            len(got & exact) / max(1, len(exact)), 4
        )

    # the curve: defaults → wider probe → the two ≥0.9 presets
    ivf_point("c32_p8_r1", q_emb, emb, exact_set, n_cells=32, nprobe=8)
    ivf_point("c32_p16_r1", q_emb, emb, exact_set, n_cells=32, nprobe=16)
    ivf_point("c32_p12_r2", q_emb, emb, exact_set, n_cells=32, nprobe=12, n_replicas=2)
    ivf_point("c32_p8_r4", q_emb, emb, exact_set, n_cells=32, nprobe=8, n_replicas=4)

    # persisted trained index (round-5 verdict #4): build+save ONCE
    # (untimed extra), then the HEADLINE warm entry queries through the
    # saved layout — no kmeans, no corpus assignment pass — at the
    # 0.93-recall preset (c32_r4). Recall vs the exact top-k must match
    # the per-call entry above (asserted exactly in tests; recorded
    # here as an extra).
    import shutil as _sh
    import tempfile as _tf

    ivf_dir = _tf.mkdtemp(prefix="bench_ivf_index_")
    t0 = time.time()
    ann_ops.save_ivf_index(
        emb, "vec_id", "embedding", ivf_dir, n_cells=32, n_replicas=4
    )
    extras["ivf_index_build_sec"] = round(time.time() - t0, 3)
    ivf_idx = ann_ops.load_ivf_index(spark, ivf_dir)
    # NB: warm runs the HIGH-RECALL config (r4/p8, recall 0.93) — read
    # it against ivf_c32_p8_r4_sec, not the headline ann_topk_ivf
    # (r1/p8, recall ~0.6). Matching that per-call twin's time while
    # skipping the 10s ivf_index_build_sec is the win being measured.
    bench(
        "ann_topk_ivf_warm",
        lambda: ann_ops.cosine_topk_ivf_index(
            q_emb, "vec_id", "embedding", ivf_idx, k=10, nprobe=8
        ).count(),
        repeats=5,  # r05 spread 4.3s at repeats=3 under contention
    )
    got_warm = {
        (r.query_id, r.vec_id)
        for r in ann_ops.cosine_topk_ivf_index(
            q_emb, "vec_id", "embedding", ivf_idx, k=10, nprobe=8
        ).collect()
    }
    extras["ivf_warm_recall"] = round(
        len(got_warm & exact_set) / max(1, len(exact_set)), 4
    )
    _sh.rmtree(ivf_dir, ignore_errors=True)

    # IVF warm economics AT A SCALE WHERE THEY EXIST (round-5 verdict
    # #3): at sf0.1's 2k vectors, per-call kmeans+assignment is cheaper
    # than reading a saved layout (r05: warm 2.25s vs per-call 1.18s)
    # and the honest record said so. Tile the fixture deterministically
    # to 64k vectors (rep 0 = the unperturbed original; reps 1.. add a
    # bounded sin perturbation — all JVM expressions, rerun-identical),
    # store it as parquet like a real corpus, and measure the same
    # warm-vs-per-call comparison where the corpus assignment pass
    # dominates. Untimed extras; headline_total unchanged.
    reps_sc = 32
    scale_dir = _tf.mkdtemp(prefix="bench_ivf_scale_")
    big_vec = (
        emb.select("vec_id", "embedding")
        .crossJoin(spark.range(reps_sc).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") * reps_sc + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("rep").cast("double") / reps_sc)
                * F.lit(0.05)
                * F.sin(
                    (F.col("vec_id") * reps_sc + F.col("rep")).cast("double")
                    * 0.013
                    + i.cast("double") * 1.7
                ),
            ).alias("embedding"),
        )
    )
    big_vec.write.mode("overwrite").parquet(f"{scale_dir}/corpus")
    big_c = spark.read.parquet(f"{scale_dir}/corpus")
    extras["ivf_scale_n"] = big_c.count()
    q_scale = big_c.where(f"vec_id % {reps_sc * 50} = 0")  # 40 queries
    t0 = time.time()
    exact_scale = {
        (r.query_id, r.vec_id)
        for r in ann_ops.cosine_topk(
            q_scale, "vec_id", "embedding", big_c, "vec_id", "embedding", k=10
        ).collect()
    }
    extras["ivf_scale_exact_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    got_pc = {
        (r.query_id, r.vec_id)
        for r in ann_ops.cosine_topk_ivf(
            q_scale, "vec_id", "embedding", big_c, "vec_id", "embedding",
            k=10, n_cells=32, nprobe=8, n_replicas=4,
        ).collect()
    }
    extras["ivf_scale_percall_sec"] = round(time.time() - t0, 3)
    extras["ivf_scale_percall_recall"] = round(
        len(got_pc & exact_scale) / max(1, len(exact_scale)), 4
    )
    t0 = time.time()
    ann_ops.save_ivf_index(
        big_c, "vec_id", "embedding", f"{scale_dir}/index",
        n_cells=32, n_replicas=4,
    )
    extras["ivf_scale_build_sec"] = round(time.time() - t0, 3)
    idx_sc = ann_ops.load_ivf_index(spark, f"{scale_dir}/index")
    warm_runs = []
    got_w = set()
    for _ in range(3):
        t0 = time.time()
        got_w = {
            (r.query_id, r.vec_id)
            for r in ann_ops.cosine_topk_ivf_index(
                q_scale, "vec_id", "embedding", idx_sc, k=10, nprobe=8
            ).collect()
        }
        warm_runs.append(time.time() - t0)
    extras["ivf_scale_warm_sec"] = round(statistics.median(warm_runs[1:]), 3)
    extras["ivf_scale_warm_cold"] = round(warm_runs[0], 3)
    extras["ivf_scale_warm_recall"] = round(
        len(got_w & exact_scale) / max(1, len(exact_scale)), 4
    )
    # IVF-PQ at the same 64k scale: codes stored inside the probed
    # postings replace the full-vector join for every probed candidate
    # with an m-byte scan + bounded exact rerank — measure search time
    # and recall against the SAME exact set, plus build and postings
    # bytes vs the plain layout (the scan-bytes claim on disk).
    t0 = time.time()
    ann_ops.save_ivf_index(
        big_c, "vec_id", "embedding", f"{scale_dir}/index_pq",
        n_cells=32, n_replicas=4, pq_m=16,
    )
    extras["ivf_scale_pq_build_sec"] = round(time.time() - t0, 3)
    idx_pq = ann_ops.load_ivf_index(spark, f"{scale_dir}/index_pq")
    pq_runs = []
    got_pq = set()
    for _ in range(3):
        t0 = time.time()
        got_pq = {
            (r.query_id, r.vec_id)
            for r in ann_ops.cosine_topk_ivf_pq(
                q_scale, "vec_id", "embedding", idx_pq, k=10, nprobe=8
            ).collect()
        }
        pq_runs.append(time.time() - t0)
    extras["ivf_scale_pq_sec"] = round(statistics.median(pq_runs[1:]), 3)
    extras["ivf_scale_pq_cold"] = round(pq_runs[0], 3)
    extras["ivf_scale_pq_recall"] = round(
        len(got_pq & exact_scale) / max(1, len(exact_scale)), 4
    )

    def _ivf_post_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    # NB since the IVF-FLAT layout landed (r7), postings embed the full
    # vector, so these on-disk totals are ~corpus-sized by design; the
    # column-level PQ-codes-vs-vectors bytes claim lives in the
    # ivf_xover_* block below (parquet column-chunk metadata)
    extras["ivf_scale_postings_bytes_plain"] = _ivf_post_bytes(
        f"{scale_dir}/index/postings"
    )
    extras["ivf_scale_postings_bytes_pq"] = _ivf_post_bytes(
        f"{scale_dir}/index_pq/postings"
    )
    extras["ivf_scale_vectors_bytes"] = _ivf_post_bytes(
        f"{scale_dir}/index/vectors"
    )
    _sh.rmtree(scale_dir, ignore_errors=True)

    # IVF-FLAT crossover (round-6 verdict #1: "no measurement yet shows
    # the ANN index beating an exact scan"). 512k vectors (256-rep
    # deterministic tiling at sf0.1), one stored IVF-Flat+PQ index
    # (c256/r1/pq16), and the exact chunked matmul as the bar. Two
    # query shapes: a 4-point serving batch (probes ~60/256 cells) and
    # the 40-query bulk batch. The flat probe scores the cell-pruned
    # postings scan with the SAME numpy kernel as the exact path, so
    # pruned fraction converts directly to time. Probe-bytes evidence
    # is DETERMINISTIC (probed cell dirs + column-chunk bytes), per the
    # measured rule that sub-GB timings don't pin layout claims.
    reps_xo = 256
    xo_dir = _tf.mkdtemp(prefix="bench_ivf_xover_")
    xo_vec = (
        emb.select("vec_id", "embedding")
        .crossJoin(spark.range(reps_xo).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") * reps_xo + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("rep").cast("double") / reps_xo)
                * F.lit(0.05)
                * F.sin(
                    (F.col("vec_id") * reps_xo + F.col("rep")).cast("double")
                    * 0.013
                    + i.cast("double") * 1.7
                ),
            ).alias("embedding"),
        )
    )
    # 32 files: the realistic many-file corpus layout (a 1-file write
    # gave the exact scan 3 tasks and 2x-worse numbers — unfair bar)
    xo_vec.repartition(32).write.mode("overwrite").parquet(f"{xo_dir}/corpus")
    xo_c = spark.read.parquet(f"{xo_dir}/corpus")
    extras["ivf_xover_n"] = xo_c.count()
    q_xo = {
        "q4": xo_c.where(f"vec_id % {reps_xo * 500} = 0"),
        "q40": xo_c.where(f"vec_id % {reps_xo * 50} = 0"),
    }

    def _xo_med(fn):
        runs, out = [], None
        for _ in range(3):
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        return out, round(statistics.median(runs[1:]), 3), round(runs[0], 3)

    xo_exact = {}
    for tag, qdf in q_xo.items():
        xo_exact[tag], med, cold = _xo_med(
            lambda qdf=qdf: {
                (r.query_id, r.vec_id)
                for r in ann_ops.cosine_topk(
                    qdf, "vec_id", "embedding", xo_c, "vec_id", "embedding",
                    k=10,
                ).collect()
            }
        )
        extras[f"ivf_xover_exact_{tag}_sec"] = med
        extras[f"ivf_xover_exact_{tag}_cold"] = cold
    t0 = time.time()
    ann_ops.save_ivf_index(
        xo_c, "vec_id", "embedding", f"{xo_dir}/index",
        n_cells=256, n_replicas=1, pq_m=16,
    )
    extras["ivf_xover_build_sec"] = round(time.time() - t0, 3)
    idx_xo = ann_ops.load_ivf_index(spark, f"{xo_dir}/index")
    for tag, qdf in q_xo.items():
        got, med, cold = _xo_med(
            lambda qdf=qdf: {
                (r.query_id, r.vec_id)
                for r in ann_ops.cosine_topk_ivf_index(
                    qdf, "vec_id", "embedding", idx_xo, k=10, nprobe=16
                ).collect()
            }
        )
        extras[f"ivf_xover_flat_{tag}_sec"] = med
        extras[f"ivf_xover_flat_{tag}_cold"] = cold
        extras[f"ivf_xover_flat_{tag}_recall"] = round(
            len(got & xo_exact[tag]) / max(1, len(xo_exact[tag])), 4
        )
        gpq, med, cold = _xo_med(
            lambda qdf=qdf: {
                (r.query_id, r.vec_id)
                for r in ann_ops.cosine_topk_ivf_pq(
                    qdf, "vec_id", "embedding", idx_xo, k=10, nprobe=16
                ).collect()
            }
        )
        extras[f"ivf_xover_pq_{tag}_sec"] = med
        extras[f"ivf_xover_pq_{tag}_cold"] = cold
        extras[f"ivf_xover_pq_{tag}_recall"] = round(
            len(gpq & xo_exact[tag]) / max(1, len(xo_exact[tag])), 4
        )
    # deterministic probe evidence for the serving batch: which cell
    # dirs the q4 probe lists (driver assignment = the probe's own
    # routine), their bytes/files, and the column-chunk bytes a PQ
    # probe (vec_id+pq) vs a flat probe (vec_id+cv) actually reads
    import numpy as _np
    import pyarrow.parquet as _papq

    q4_pdf = (
        q_xo["q4"].select("vec_id", "embedding").toPandas()
    )
    probed_xo = sorted(
        {
            int(c)
            for row in ann_ops._assign_cells_np(
                _np.array(q4_pdf["embedding"].tolist(), dtype=_np.float64),
                idx_xo.centroids,
                16,
            )
            for c in row
        }
    )
    probed_files = [
        os.path.join(r, f)
        for cell in probed_xo
        for r, _, fs in os.walk(f"{xo_dir}/index/postings/cell={cell}")
        for f in fs
        if f.endswith(".parquet")
    ]

    def _col_bytes(files, cols):
        tot = 0
        for fp in files:
            md = _papq.ParquetFile(fp).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema.split(".")[0] in cols:
                        tot += col.total_compressed_size
        return tot

    extras["ivf_xover_probed_cells_q4"] = len(probed_xo)
    extras["ivf_xover_cells_total"] = 256
    extras["ivf_xover_probed_files_q4"] = len(probed_files)
    extras["ivf_xover_probed_bytes_q4"] = sum(
        os.path.getsize(f) for f in probed_files
    )
    extras["ivf_xover_corpus_bytes"] = _ivf_post_bytes(f"{xo_dir}/corpus")
    extras["ivf_xover_flat_col_bytes_q4"] = _col_bytes(
        probed_files, {"vec_id", "cv"}
    )
    extras["ivf_xover_pq_col_bytes_q4"] = _col_bytes(
        probed_files, {"vec_id", "pq"}
    )

    # Serving-side handles over the same stored layout (r8):
    # (a) the vectorized cell load — before = the retired per-row
    #     to_pylist materialization, after = the Arrow flat-values
    #     reshape — over the q4 probe's cells (~60 MB of float lists,
    #     the ≥50 MB cold-path evidence the r7 verdict asked for);
    # (b) the ADC serving path (search_pq), whose probe reads the pq
    #     column bytes recorded in ivf_xover_pq_col_bytes_q4 instead
    #     of the flat column, with exact rerank bounded to candidates.
    from prefixtree_spark.serving import load_local_ivf_index as _llvi

    q4_ids = [int(x) for x in q4_pdf["vec_id"]]
    q4_vecs = q4_pdf["embedding"].tolist()
    # warm the page cache first so the before/after compares the CPU
    # path (list building vs buffer reshape), not IO ordering
    for fp in probed_files:
        with open(fp, "rb") as fh:
            fh.read()
    t0 = time.time()
    for cell in probed_xo:
        tbl = _papq.read_table(
            f"{xo_dir}/index/postings/cell={cell}", columns=["vec_id", "cv"]
        )
        _np.array(tbl.column("cv").to_pylist(), dtype=_np.float64)
    extras["serving_cell_load_pylist_sec"] = round(time.time() - t0, 3)
    local_xo = _llvi(f"{xo_dir}/index")
    t0 = time.time()
    for cell in probed_xo:
        local_xo._cell(cell)
    extras["serving_cell_load_vectorized_sec"] = round(time.time() - t0, 3)
    extras["serving_cell_load_bytes"] = extras["ivf_xover_flat_col_bytes_q4"]
    exact_q4_sets = {}
    for qq, vv in xo_exact["q4"]:
        exact_q4_sets.setdefault(int(qq), set()).add(int(vv))

    def _srv_probe(handle, fn_name):
        got = {}
        t0 = time.time()
        for qid_val, v in zip(q4_ids, q4_vecs):
            hits = getattr(handle, fn_name)(v, 11, nprobe=16)
            got[qid_val] = [int(x) for x, _ in hits if int(x) != qid_val][:10]
        sec = round(time.time() - t0, 3)
        rec = sum(
            len(set(got[q]) & exact_q4_sets.get(q, set())) for q in got
        ) / max(1, sum(len(exact_q4_sets.get(q, set())) for q in got))
        return sec, round(rec, 4)

    # flat serving probe on the already-warm handle (cells cached above)
    extras["serving_flat_q4_warm_sec"], extras["serving_flat_q4_recall"] = (
        _srv_probe(local_xo, "search")
    )
    local_pq = _llvi(f"{xo_dir}/index")  # fresh handle: cold code cells
    extras["serving_pq_q4_cold_sec"], extras["serving_pq_q4_recall"] = (
        _srv_probe(local_pq, "search_pq")
    )
    extras["serving_pq_q4_warm_sec"], _ = _srv_probe(local_pq, "search_pq")
    _sh.rmtree(xo_dir, ignore_errors=True)

    # Stored-BM25 wall-clock crossover (r9 verdict #3: at sf0.1 the
    # stored probe only TIED the in-session ranker — 130 query docs hit
    # most buckets and JVM fixed costs dominate). Mirror the ivf_xover
    # method: corpus sizes 25k/100k/400k docs, built by replicating the
    # 5k-doc fixture with REP-SUFFIXED tokens so the VOCABULARY scales
    # with the corpus while each term's postings stay constant — the
    # realistic big-corpus shape (plain replication would grow every
    # queried term's postings linearly and measure nothing). Queries
    # live in replica 0's vocabulary, so the stored probe reads the
    # SAME bucket-pruned, term-pushed bytes at every size; the
    # in-session ranker re-tokenizes the whole corpus per call. The
    # claim is the slope: in-session grows with corpus, stored ~flat.
    xb_dir = _tf.mkdtemp(prefix="bench_bm25_xover_")
    from prefixtree_spark.operators import ranking as _rank_ops

    docs_xb = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q_xb = (
        docs_xb.select(
            F.col("doc_id").alias("qid"),
            F.slice(
                F.transform(
                    F.regexp_extract_all("text", F.lit(r"\S+"), 0),
                    lambda t: F.concat(t, F.lit("x0")),
                ),
                1, 3,
            ).alias("terms"),
        )
        .where("doc_id % 251 = 0 AND size(terms) >= 3")
    )
    xb_insession_small = None
    for tag, reps in (("25k", 5), ("100k", 20), ("400k", 80)):
        corp = (
            docs_xb.crossJoin(
                spark.range(reps).select(F.col("id").alias("rep"))
            )
            .select(
                (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.regexp_extract_all("text", F.lit(r"\S+"), 0),
                        lambda t: F.concat(
                            t, F.lit("x"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                ).alias("text"),
            )
        )
        corp.repartition(32).write.mode("overwrite").parquet(
            f"{xb_dir}/c{tag}"
        )
        corp_t = spark.read.parquet(f"{xb_dir}/c{tag}")
        extras[f"bm25_xover_{tag}_n"] = corp_t.count()
        got_i, med, cold = _xo_med(
            lambda corp_t=corp_t: {
                (r.query_id, r.doc_id, r.rank)
                for r in _rank_ops.bm25_rank(
                    corp_t, "doc_id", "text", q_xb, "qid", "terms",
                    idf="ratio",
                ).collect()
            }
        )
        extras[f"bm25_xover_insession_{tag}_sec"] = med
        extras[f"bm25_xover_insession_{tag}_cold"] = cold
        if tag == "25k":
            xb_insession_small = got_i
        t0 = time.time()
        _rank_ops.save_bm25_index(
            corp_t, "doc_id", "text", f"{xb_dir}/i{tag}",
            n_buckets=32, idf="ratio",
        )
        extras[f"bm25_xover_build_{tag}_sec"] = round(time.time() - t0, 3)
        got_s, med, cold = _xo_med(
            lambda tag=tag: {
                (r.query_id, r.doc_id, r.rank)
                for r in _rank_ops.bm25_rank_indexed(
                    spark, f"{xb_dir}/i{tag}", q_xb, "qid", "terms"
                ).collect()
            }
        )
        extras[f"bm25_xover_stored_{tag}_sec"] = med
        extras[f"bm25_xover_stored_{tag}_cold"] = cold
        if tag == "25k":
            # cheap correctness tether: stored probe == in-session at
            # the smallest size (both paths share the scoring column)
            assert got_s == xb_insession_small, "bm25_xover mismatch"
    # deterministic probe-bytes evidence at the largest size: the
    # stored probe's pruned input vs the whole postings layout
    xb_terms = sorted(
        {t for r in q_xb.select("terms").collect() for t in r.terms}
    )
    xb_buckets = sorted(
        {_rank_ops.term_bucket(t, 32) for t in xb_terms}
    )
    extras["bm25_xover_probed_buckets_400k"] = len(xb_buckets)
    extras["bm25_xover_probed_bytes_400k"] = sum(
        os.path.getsize(os.path.join(r, f_))
        for b in xb_buckets
        for r, _, fs_ in os.walk(f"{xb_dir}/i400k/postings/bucket={b}")
        for f_ in fs_
        if f_.endswith(".parquet")
    )
    extras["bm25_xover_postings_bytes_400k"] = sum(
        os.path.getsize(os.path.join(r, f_))
        for r, _, fs_ in os.walk(f"{xb_dir}/i400k/postings")
        for f_ in fs_
        if f_.endswith(".parquet")
    )
    _sh.rmtree(xb_dir, ignore_errors=True)

    # Filtered-ANN selectivity sweep (r9 verdict #3): recall, result
    # count, and escalation work vs filter selectivity at a PRUNED
    # nprobe, with the probe-escalation ladder (the shipped behavior).
    # `pre_escalation_shortfall` counts the result rows the pre-r9
    # code would silently have been short (passing rows inside each
    # query's initially probed cells vs k) — the starvation the ladder
    # exists to repair; `rows` is the shipped (escalated) result count,
    # which must equal Q × min(k, |filtered|) by construction.
    fsel_dir = _tf.mkdtemp(prefix="bench_ivf_fsel_")
    femb = emb.withColumn(
        "sel_bucket",
        F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(1000)).cast("int"),
    )
    ann_ops.save_ivf_index(
        femb, "vec_id", "embedding", f"{fsel_dir}/index",
        n_cells=16, sample_size=20000, payload_cols=["sel_bucket"],
    )
    fidx = ann_ops.load_ivf_index(spark, f"{fsel_dir}/index")
    fq = femb.where("vec_id % 100 = 0")  # 20 queries
    fq_pdf = fq.select("vec_id", "embedding").toPandas()
    fk, fnprobe = 10, 2
    fcells = ann_ops._assign_cells_np(
        _np.array(fq_pdf["embedding"].tolist(), dtype=_np.float64),
        fidx.centroids, fnprobe,
    )
    for lab, thr in [("50pct", 500), ("10pct", 100), ("2pct", 20),
                     ("05pct", 5)]:
        fwhere = f"sel_bucket < {thr}"
        fcorp = femb.where(fwhere)
        n_pass = fcorp.count()
        want_f = {
            (r.query_id, r.vec_id)
            for r in ann_ops.cosine_topk(
                fq, "vec_id", "embedding", fcorp, "vec_id", "embedding",
                k=fk,
            ).collect()
        }
        t0 = time.time()
        got_f = {
            (r.query_id, r.vec_id)
            for r in ann_ops.cosine_topk_ivf_index(
                fq, "vec_id", "embedding", fidx, k=fk, nprobe=fnprobe,
                where=fwhere,
            ).collect()
        }
        extras[f"ivf_filtered_{lab}_sec"] = round(time.time() - t0, 3)
        extras[f"ivf_filtered_{lab}_rows"] = len(got_f)
        extras[f"ivf_filtered_{lab}_rows_exact"] = len(want_f)
        extras[f"ivf_filtered_{lab}_recall"] = round(
            len(got_f & want_f) / max(1, len(want_f)), 4
        )
        extras[f"ivf_filtered_{lab}_passing"] = n_pass
        # pre-escalation shortfall: per query, passing rows within its
        # initially probed cells vs what exclude_self-adjusted k needs
        cellcnt = {
            r.cell: r.n
            for r in fidx.postings.where(fwhere)
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        from collections import Counter as _Counter

        shipped_per_q = _Counter(qv for qv, _ in got_f)
        short = 0
        for i, qid_v in enumerate(fq_pdf["vec_id"]):
            in_probed = sum(int(cellcnt.get(int(c), 0)) for c in fcells[i])
            # conservative (the query's own passing row isn't
            # discounted from in_probed): rows the shipped result has
            # that the initially probed cells could not have supplied
            short += max(0, shipped_per_q.get(int(qid_v), 0) - in_probed)
        extras[f"ivf_filtered_{lab}_pre_escalation_shortfall"] = short
    _sh.rmtree(fsel_dir, ignore_errors=True)

    # SQ8 storage economics: the int8 claim is an IO claim, so measure
    # it as bytes on disk — the stored quantized column vs the float
    # column, same corpus, same codec defaults — plus the query path
    # that scans the STORED qv8 (quantized=) instead of re-deriving it.
    sq8_dir = _tf.mkdtemp(prefix="bench_sq8_")
    scales_sq8 = ann_ops.int8_scales(emb, "embedding")
    ann_ops.quantize_embeddings(emb, "vec_id", "embedding", scales_sq8).write.mode(
        "overwrite"
    ).parquet(f"{sq8_dir}/qv8")
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(
        f"{sq8_dir}/float"
    )

    def _dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    b8, bf = _dir_bytes(f"{sq8_dir}/qv8"), _dir_bytes(f"{sq8_dir}/float")
    extras["sq8_bytes_int8"] = b8
    extras["sq8_bytes_float"] = bf
    extras["sq8_bytes_ratio"] = round(bf / max(1, b8), 2)
    qv8_stored = spark.read.parquet(f"{sq8_dir}/qv8")
    bench(
        "ann_topk_int8_stored",
        lambda: ann_ops.cosine_topk_int8(
            q_emb, "vec_id", "embedding", emb, "vec_id", "embedding",
            k=10, scales=scales_sq8, quantized=qv8_stored,
        ).count(),
    )
    _sh.rmtree(sq8_dir, ignore_errors=True)

    # PQ storage economics: the step past SQ8 — m bytes per vector
    # instead of dim. Same bytes-on-disk measurement, same stored-codes
    # query entry; exactness at gate scale is the oracle's job
    # (ann_topk_pq), recall at selective pads is the test suite's.
    pq_dir = _tf.mkdtemp(prefix="bench_pq_")
    pq_books = ann_ops.pq_fit(emb, "embedding", m=16)
    ann_ops.pq_encode(emb, "vec_id", "embedding", pq_books).write.mode(
        "overwrite"
    ).parquet(f"{pq_dir}/codes")
    bpq = _dir_bytes(f"{pq_dir}/codes")
    extras["pq_bytes_codes"] = bpq
    extras["pq_bytes_ratio_vs_float"] = round(bf / max(1, bpq), 2)
    extras["pq_bytes_ratio_vs_int8"] = round(b8 / max(1, bpq), 2)
    pq_stored = spark.read.parquet(f"{pq_dir}/codes")
    bench(
        "ann_topk_pq_stored",
        lambda: ann_ops.cosine_topk_pq(
            q_emb, "vec_id", "embedding", emb, "vec_id", "embedding",
            k=10, codebooks=pq_books, codes=pq_stored,
        ).count(),
    )
    _sh.rmtree(pq_dir, ignore_errors=True)

    # clustered corpus (20 spherical clusters, same row count/dim as the
    # fixture): recall at a 25% probe fraction with no replicas
    n_emb = emb.count()
    clus = (
        spark.range(n_emb)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), d ->"
                " cast(sin((id % 20 + 1) * 7919 * d) +"
                " 0.25 * sin((id * 104729 + d) * 2654435761) as float))"
            ).alias("embedding"),
        )
        .cache()
    )
    clus.count()
    q_clus = clus.where("vec_id % 50 = 0")
    t0 = time.time()
    clus_exact = {
        (r.query_id, r.vec_id)
        for r in ann_ops.cosine_topk(
            q_clus, "vec_id", "embedding", clus, "vec_id", "embedding", k=10
        ).collect()
    }
    extras["ivf_clustered_exact_sec"] = round(time.time() - t0, 3)
    ivf_point("clustered_c32_p8_r1", q_clus, clus, clus_exact, n_cells=32, nprobe=8)
    clus.unpersist()

    # Sparse (BM25) storage economics — round 9: the persisted
    # inverted index vs the per-call postings rebuild. bm25_rank pays
    # the corpus tokenize+shuffle EVERY call; bm25_rank_indexed reads
    # only the query terms' hash-bucket partitions of bytes at rest.
    # The bytes extra records the layout size (what a replica must
    # host); the build extra is the one-time cost the stored probe
    # amortizes away.
    import shutil as _bm_sh
    import tempfile as _bm_tf

    from prefixtree_spark.operators import ranking as rank_ops

    bm_dir = _bm_tf.mkdtemp(prefix="bench_bm25_")
    docs_bm = load_table(spark, sf_dir, "documents")
    q_bm = docs_bm.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("doc_id % 41 = 0 AND size(terms) >= 3")
    t0 = time.time()
    rank_ops.save_bm25_index(
        docs_bm, "doc_id", "text", f"{bm_dir}/idx", n_buckets=32, idf="ratio"
    )
    extras["bm25_build_sec"] = round(time.time() - t0, 3)
    extras["bm25_index_bytes"] = _dir_bytes(f"{bm_dir}/idx")
    bench(
        "bm25_rank_docs",
        lambda: rank_ops.bm25_rank(
            docs_bm, "doc_id", "text", q_bm, "qid", "terms", idf="ratio"
        ).count(),
    )
    bench(
        "bm25_rank_stored",
        lambda: rank_ops.bm25_rank_indexed(
            spark, f"{bm_dir}/idx", q_bm, "qid", "terms"
        ).count(),
    )
    # r13 verdict #7: core-scaling probe for the BM25-postings family —
    # same protocol as scaleprobe_traversal (untimed extra, shape
    # pinned via explicit shuffle partitioning, warm run comparable).
    # Every document is a query (5,000 x 3-term), so the postings/
    # scoring join carries ~40x the headline entry's query terms and
    # the probe is join-compute bound instead of fixed-cost bound.
    q_sp_bm = docs_bm.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("size(terms) >= 3")
    _saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        for tag in ("cold", "warm"):
            t0 = time.time()
            n_spb = rank_ops.bm25_rank(
                docs_bm, "doc_id", "text", q_sp_bm, "qid", "terms", idf="ratio"
            ).count()
            extras[f"scaleprobe_bm25_{tag}_sec"] = round(time.time() - t0, 3)
        extras["scaleprobe_bm25_rows"] = n_spb
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _saved_sp)

    # replica-side latency (untimed extras): one LocalSparseIndex
    # lookup and one fused /hybrid-equivalent (sparse + dense + RRF,
    # in-process — HTTP adds only transport) — the keep-alive serving
    # economics for the hybrid endpoint
    from prefixtree_spark.serving import (
        load_local_bm25_index as _load_sp,
        rrf_fuse_local as _rrf_local,
    )

    sp_handle = _load_sp(f"{bm_dir}/idx")
    terms_bm = [r.terms for r in q_bm.limit(1).collect()][0]
    t0 = time.time()
    sp_handle.search(terms_bm, 10)
    extras["serving_sparse_cold_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    for _ in range(20):
        sp_handle.search(terms_bm, 10)
    extras["serving_sparse_warm_ms"] = round((time.time() - t0) * 50, 3)
    sparse_ids = [d for d, _ in sp_handle.search(terms_bm, 10)]
    t0 = time.time()
    for _ in range(20):
        _rrf_local([sparse_ids, sparse_ids[::-1]], 5)
    extras["serving_rrf_fuse_ms"] = round((time.time() - t0) * 50, 3)
    _bm_sh.rmtree(bm_dir, ignore_errors=True)

    # skewed-corpus stress: a pure boilerplate-heavy corpus (every doc
    # = one shared 40-token boilerplate + a unique tail) makes the
    # hot-shingle df² hazard measurable — uncapped, every doc pair is a
    # candidate AND scores above threshold (quadratic candidate set +
    # quadratic output); max_df drops the boilerplate shingles before
    # signatures and verify, so the capped run stays near the
    # clean-corpus cost. Doc count scales with sf.
    from prefixtree_spark.operators import dedup

    n_skew = max(300, int(20_000 * float(sf)))
    boiler = " ".join(f"boiler{i}" for i in range(40))
    skew = (
        spark.range(n_skew)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler + " tail "),
                F.col("id").cast("string"), F.lit(" "),
                (F.col("id") * 7 + 3).cast("string"), F.lit(" "),
                (F.col("id") * 13 + 1).cast("string"),
            ).alias("text"),
        )
        .cache()
    )
    skew.count()
    extras["skew_docs"] = n_skew
    # 5 repeats: the r05 run recorded a 27s spread at repeats=3 (one
    # GC/scheduler outlier on the capped side inverted the capped-vs-
    # uncapped comparison that every other round reproduces)
    bench(
        "dedup_minhash_skew_capped",
        lambda: dedup.minhash_lsh_pairs(
            skew, "doc_id", "text", n=3, threshold=0.8, max_df=n_skew // 10
        ).count(),
        repeats=5,
    )
    bench(
        "dedup_minhash_skew_uncapped",
        lambda: dedup.minhash_lsh_pairs(
            skew, "doc_id", "text", n=3, threshold=0.8
        ).count(),
        repeats=5,
    )
    skew.unpersist()

    # streaming-ingest economics (round-5, untimed extras): two-batch
    # greedy ingest over documents at this sf, then the isolated
    # corpus-side comparison the bands table exists for — stored-bucket
    # scan vs full shingle+minhash recompute (the per-batch O(corpus)
    # work persistence removes; SCALING.md round-5 appendix).
    import shutil
    import tempfile as _itf

    from prefixtree_spark.sources.io import read_published as _read_pub
    from prefixtree_spark.streaming.ingest import _doc_bands, ingest_batch

    ing_dir = _itf.mkdtemp(prefix="bench_ingest_")
    docs_ing = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half_ing = (docs_ing.agg(F.max("doc_id")).first()[0] + 1) // 2
    t0 = time.time()
    extras["ingest_batch1_kept"] = ingest_batch(
        docs_ing.where(f"doc_id < {half_ing}"), f"{ing_dir}/c", "doc_id", "text"
    )
    extras["ingest_batch1_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    extras["ingest_batch2_kept"] = ingest_batch(
        docs_ing.where(f"doc_id >= {half_ing}"), f"{ing_dir}/c", "doc_id", "text"
    )
    extras["ingest_batch2_sec"] = round(time.time() - t0, 3)
    corpus_ing = _read_pub(spark, f"{ing_dir}/c")
    for tag in ("cold", "warm"):  # second pass recorded warm
        t0 = time.time()
        _read_pub(spark, f"{ing_dir}/c_bands").count()
        extras[f"ingest_bands_scan_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        _doc_bands(corpus_ing, "doc_id", "text", 3, 64, 32).count()
        extras[f"ingest_bands_recompute_{tag}"] = round(time.time() - t0, 3)
    # incremental data-card economics (untimed extras): after one more
    # append, a full-card recompute re-scans the whole published corpus
    # while corpus_report_published refreshes only the new segment's
    # partial — the O(batch)-vs-O(corpus) gap grows with corpus size.
    from prefixtree_spark.operators.text import corpus_report_published
    from prefixtree_spark.operators.text import corpus_report as _full_card
    from prefixtree_spark.sources.io import append_published as _append_pub

    t0 = time.time()
    corpus_report_published(spark, f"{ing_dir}/c", "text").count()
    extras["card_pub_initial_sec"] = round(time.time() - t0, 3)
    _append_pub(
        docs_ing.where(f"doc_id < {half_ing // 10}").withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        ),
        f"{ing_dir}/c",
    )
    t0 = time.time()
    corpus_report_published(spark, f"{ing_dir}/c", "text").count()
    extras["card_pub_refresh_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    _full_card(_read_pub(spark, f"{ing_dir}/c"), "doc_id", "text").count()
    extras["card_full_recompute_sec"] = round(time.time() - t0, 3)
    shutil.rmtree(ing_dir, ignore_errors=True)

    # ingest skew stress (round-5 verdict #6): a boilerplate-heavy
    # batch against a boilerplate corpus — every (band, bucket) is hot,
    # so the uncapped batch-vs-corpus candidate join emits m·p rows per
    # bucket; max_df drops hot buckets read-side and the capped batch
    # should stay near the clean-corpus ingest cost (ingest_batch2_sec
    # above). Same fixture family as dedup_minhash_skew_*; kept counts
    # are recorded because the cap trades recall (documented).
    skew_dir = _itf.mkdtemp(prefix="bench_ingest_skew_")
    n_sk = max(200, int(10_000 * float(sf)))
    boiler2 = " ".join(f"skw{i}" for i in range(40))

    def _skew_docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler2 + " tail "),
                F.col("id").cast("string"), F.lit(" "),
                (F.col("id") * 7 + 3).cast("string"), F.lit(" "),
                (F.col("id") * 13 + 1).cast("string"),
            ).alias("text"),
        )

    extras["ingest_skew_docs"] = n_sk
    for tag, cap in (("uncapped", None), ("capped", 50)):
        root_sk = f"{skew_dir}/{tag}"
        ingest_batch(
            _skew_docs(0, n_sk), root_sk, "doc_id", "text", max_df=cap
        )
        t0 = time.time()
        kept = ingest_batch(
            _skew_docs(n_sk, 2 * n_sk), root_sk, "doc_id", "text", max_df=cap
        )
        extras[f"ingest_skew_{tag}_sec"] = round(time.time() - t0, 3)
        extras[f"ingest_skew_{tag}_kept"] = kept
    shutil.rmtree(skew_dir, ignore_errors=True)

    # round-6 stored-evidence economics at the scale where they exist:
    # the sf-level ingest above runs on a corpus far below the pruning
    # threshold, so the two stored-evidence guard paths are measured in
    # stage isolation on a tiled staged corpus (ingest-shaped: _pt_sha
    # stored with the rows; each tile's ids contiguous, so parquet
    # files carry tight id ranges exactly like append segments).
    # Guard: the narrow hash-column join vs recomputing sha-256 over the
    # full text column. Verify fetch: the literal-IN pruned scan vs the
    # broadcast semi-join — once with CLUSTERED candidate ids (one
    # tile: range stats prune files) and once fully SPREAD (the honest
    # worst case, expected ~parity with the semi-join).
    from prefixtree_spark.operators.dedup import token_shingles as _tok_sh
    from prefixtree_spark.sources.io import publish_version as _pub_v

    scale_dir = _itf.mkdtemp(prefix="bench_ingest_scale_")
    n_base = docs_ing.count()
    k_tiles = max(2, int(6_000_000 * float(sf)) // max(n_base, 1))
    big_src = (
        spark.range(k_tiles).select(F.col("id").alias("tile"))
        .crossJoin(docs_ing)
        .select(
            (F.col("doc_id") + F.col("tile") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.concat(
                F.lit("t"), F.col("tile").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
        .withColumn("_pt_sha", F.sha2(F.col("text"), 256))
    )
    t0 = time.time()
    _pub_v(big_src, f"{scale_dir}/c")
    extras["ingest_scale_stage_sec"] = round(time.time() - t0, 3)
    big_c = _read_pub(spark, f"{scale_dir}/c")
    extras["ingest_scale_docs"] = big_c.count()
    batch_sc = (
        docs_ing.where("doc_id % 5 = 0")
        .select(F.sha2(F.concat(F.lit("t3 "), F.col("text")), 256).alias("_h"))
        .cache()
    )
    batch_sc.count()
    for tag in ("cold", "warm"):
        t0 = time.time()
        big_c.select(F.col("_pt_sha").alias("_ch"), "doc_id").join(
            batch_sc, F.col("_ch") == F.col("_h"), "left_semi"
        ).count()
        extras[f"ingest_scale_guard_hash_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        big_c.select(F.sha2(F.col("text"), 256).alias("_ch"), "doc_id").join(
            batch_sc, F.col("_ch") == F.col("_h"), "left_semi"
        ).count()
        extras[f"ingest_scale_guard_text_{tag}"] = round(time.time() - t0, 3)
    batch_sc.unpersist()
    clustered = [
        r[0]
        for r in big_c.where(
            (F.col("doc_id") >= 3 * 10_000_000)
            & (F.col("doc_id") < 4 * 10_000_000)
        ).select("doc_id").limit(2000).collect()
    ]
    spread = [
        r[0]
        for r in big_c.where("doc_id % 997 = 7")
        .select("doc_id").limit(2000).collect()
    ]
    for shape, ids in (("clustered", clustered), ("spread", spread)):
        cand_df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        for tag in ("cold", "warm"):
            t0 = time.time()
            _tok_sh(
                big_c.where(F.col("doc_id").isin(ids)), "doc_id", "text", 3
            ).count()
            extras[f"ingest_scale_verify_pruned_{shape}_{tag}"] = round(
                time.time() - t0, 3
            )
            t0 = time.time()
            _tok_sh(
                big_c.join(cand_df, "doc_id", "left_semi"),
                "doc_id", "text", 3,
            ).count()
            extras[f"ingest_scale_verify_semijoin_{shape}_{tag}"] = round(
                time.time() - t0, 3
            )
    # layout counterfactual: the tiled corpus above has tight per-file
    # id ranges (append-segment-shaped). Re-publish HASH-shuffled —
    # every file spans the whole key space, so id stats prune nothing —
    # and run the same pruned IN fetch on the clustered candidate set.
    # The gap is what maintain_ingest(cluster_ids=) buys back when
    # compaction churn would otherwise destroy the id-range layout.
    _pub_v(big_src.repartition(32), f"{scale_dir}/h")
    big_h = _read_pub(spark, f"{scale_dir}/h")
    for tag in ("cold", "warm"):
        t0 = time.time()
        _tok_sh(
            big_h.where(F.col("doc_id").isin(clustered)), "doc_id", "text", 3
        ).count()
        extras[f"ingest_scale_verify_pruned_hashlayout_{tag}"] = round(
            time.time() - t0, 3
        )
    shutil.rmtree(scale_dir, ignore_errors=True)

    # (the stateful-streaming entries moved to the TOP of the bench —
    # round-10 verdict #1: running them after the scale extras polluted
    # their micro-batch timings with JVM/GC residue)
    import shutil
    import tempfile

    # storage-format scan throughput (untimed extras — headline_total
    # unchanged): the same lineitem slice written as parquet / orc /
    # csv / json, then one filter+agg scan each. The point on record:
    # columnar formats give scan pruning + predicate pushdown (the
    # ReadSchema/PushedFilters the plan tests pin); row formats
    # re-parse every byte of every row — the measured gap is why the
    # engine's sinks default to parquet and `convert_to_parquet`
    # exists for CSV/JSON landings.
    from prefixtree_spark.sources.io import read_source, write_sink

    fmt_dir = tempfile.mkdtemp(prefix="bench_formats_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    )
    ddl = (
        "l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_shipdate TIMESTAMP"
    )
    for fmt in ("parquet", "orc", "csv", "json"):
        path = f"{fmt_dir}/{fmt}"
        write_sink(li, path, format=fmt)
        t0 = time.time()
        # schema supplied for row formats: columnar formats carry one;
        # csv/json would otherwise pay a full inference pass up front
        src = read_source(
            spark, path, format=fmt,
            schema=ddl if fmt in ("csv", "json") else None,
        )
        src.where("l_quantity > 25").agg(
            F.sum("l_extendedprice").alias("s")
        ).collect()
        extras[f"format_scan_{fmt}"] = round(time.time() - t0, 3)
    shutil.rmtree(fmt_dir, ignore_errors=True)

    # Z-order layout economics (sources/layout.py): the same 2D box
    # scan (user × time window — the audit-query shape) against three
    # layouts of the events table at a pinned 32-file count. The
    # x-clustered layout prunes user filters perfectly and time
    # filters not at all; the Z-curve prunes both. Files-hit counts
    # come from parquet footer stats (deterministic); timings are the
    # same filtered aggregate per layout.
    from prefixtree_spark.sources.layout import zorder_cluster

    z_dir = tempfile.mkdtemp(prefix="bench_zorder_")
    ev_src = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("long").alias("ts_l"),
        "event_type",
        "value",
    )
    u_hi, t_lo, t_hi = ev_src.agg(
        F.max("user_id"), F.min("ts_l"), F.max("ts_l")
    ).first()
    u_mid, t_q1 = u_hi // 2, t_lo + (t_hi - t_lo) // 4
    layouts = {
        "plain": ev_src.repartition(32),
        "userclustered": ev_src.repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id"),
        "zorder": zorder_cluster(
            ev_src, ["user_id", "ts_l"], num_partitions=32
        ),
    }
    import os as _zos

    import pyarrow.parquet as _zpq

    for tag, shaped in layouts.items():
        path = f"{z_dir}/{tag}"
        shaped.write.parquet(path)
        stats = []
        for fname in _zos.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = _zpq.ParquetFile(f"{path}/{fname}").metadata
            lo = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema in ("user_id", "ts_l") and c.statistics:
                        a, b = lo.get(
                            c.path_in_schema,
                            (c.statistics.min, c.statistics.max),
                        )
                        lo[c.path_in_schema] = (
                            min(a, c.statistics.min), max(b, c.statistics.max)
                        )
            if lo:
                stats.append(lo)
        extras[f"zorder_files_hit_{tag}"] = sum(
            1
            for r in stats
            if r["user_id"][0] <= u_mid and r["ts_l"][0] <= t_q1
        )
        # the discriminating shape: a TIME-ONLY stripe. The user-
        # clustered layout's every file spans all of ts (reads 32/32);
        # the curve gives ts real pruning power too.
        extras[f"zorder_ts_files_hit_{tag}"] = sum(
            1 for r in stats if r["ts_l"][0] <= t_q1
        )
        for run in ("cold", "warm"):
            t0 = time.time()
            spark.read.parquet(path).where(
                (F.col("user_id") <= u_mid) & (F.col("ts_l") <= t_q1)
            ).agg(F.sum("value").alias("s")).collect()
            extras[f"zorder_box_scan_{tag}_{run}"] = round(time.time() - t0, 3)
            t0 = time.time()
            spark.read.parquet(path).where(
                F.col("ts_l") <= t_q1
            ).agg(F.sum("value").alias("s")).collect()
            extras[f"zorder_ts_scan_{tag}_{run}"] = round(time.time() - t0, 3)
    shutil.rmtree(z_dir, ignore_errors=True)

    # Copy-on-write DELETE economics (sources/io.py:delete_published):
    # an 8-segment id-clustered events table, a delete whose predicate
    # hits ONE segment's id range. COW probes every segment (stats-
    # prunable scans) but rewrites only the hit one; the naive
    # alternative rewrites the whole table. The gap is the rewritten-
    # bytes ratio and widens linearly with segment count at fixed
    # segment size — 100 TB ≈ thousands of segments, same one rewritten.
    from prefixtree_spark.sources.io import (
        delete_published as _cow_del,
        publish_version as _cow_pub,
        read_published as _cow_read,
    )

    cow_dir = tempfile.mkdtemp(prefix="bench_cow_")
    cow_root = f"{cow_dir}/events"
    ev_cow = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    e_hi = ev_cow.agg(F.max("event_id")).first()[0] + 1
    step = e_hi // 8 + 1
    _cow_pub(
        ev_cow.where(F.col("event_id") < step), cow_root,
        cluster_by=["event_id"],
    )
    for i in range(1, 8):
        _append_pub(
            ev_cow.where(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            cow_root,
            cluster_by=["event_id"],
        )
    pred = f"event_id >= {6 * step} AND event_id < {6 * step + step // 2}"
    from prefixtree_spark.sources.io import (
        published_segments as _cow_segs,
    )

    segs_before = {d for d, _ in _cow_segs(spark, cow_root)}
    t0 = time.time()
    res_cow = _cow_del(spark, cow_root, pred, cluster_by=["event_id"])
    extras["cow_delete_one_segment_sec"] = round(time.time() - t0, 3)
    extras["cow_delete_rewritten_segments"] = res_cow["rewritten_segments"]
    extras["cow_delete_kept_segments"] = res_cow["kept_segments"]
    extras["cow_delete_rows"] = res_cow["deleted"]
    # the term that scales: bytes rewritten vs table bytes (wall clock
    # at this size is fixed-job-overhead-bound; at 100 TB the rewrite
    # bytes are the whole cost)
    after_segs = _cow_segs(spark, cow_root)
    extras["cow_delete_bytes_rewritten"] = sum(
        _dir_bytes(f"{cow_root}/{d}")
        for d, _ in after_segs
        if d not in segs_before
    )
    extras["cow_delete_bytes_table"] = sum(
        _dir_bytes(f"{cow_root}/{d}") for d, _ in after_segs
    )
    t0 = time.time()
    _cow_pub(
        _cow_read(spark, cow_root).where(f"NOT ({pred})"),
        cow_root,
        cluster_by=["event_id"],
    )
    extras["cow_fullrewrite_delete_sec"] = round(time.time() - t0, 3)
    shutil.rmtree(cow_dir, ignore_errors=True)

    total = round(sum(times.values()), 3)
    # Spread audit (round-5 verdict #5): a median whose spread exceeds
    # 50% of it is not a regression-grade number — name the contention
    # per entry in extras instead of publishing it silently; for
    # minhash, point at the isolated per-stage medians recorded above.
    for name, med in times.items():
        spr = extras.get(f"{name}_spread")
        if spr is not None and med > 0 and spr > 0.5 * med:
            note = (
                f"spread {spr}s exceeds 50% of median {med}s under "
                "local[32] contention; read the median, not single runs"
            )
            if name == "dedup_minhash_lsh":
                stages = {
                    k.removeprefix("minhash_stage_").removesuffix("_warm"): v
                    for k, v in extras.items()
                    if k.startswith("minhash_stage_") and k.endswith("_warm")
                }
                note += f"; isolated stage medians: {stages}"
            extras[f"{name}_contention_note"] = note
    # Small-entry drift audit (round-7 verdict #7, band widened per
    # round-9 verdict #5): entries under the 50%-of-median spread
    # rule's radar — sub-second ones trivially satisfy it, and the
    # 1-3 s band (r9's events_topk_stream +21% went unnoted there)
    # sits between both automated rules. Compare against the newest
    # recorded round bench at the SAME sf and note any entry under 3 s
    # whose median moved more than 20% either way — the note is the
    # record the round writeup must either explain or carry as a
    # watch item.
    comparable: dict = {}
    try:
        import glob as _glob

        prev, prev_name = None, None
        for p in sorted(
            _glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_r*.json",
                )
            ),
            reverse=True,
        ):
            with open(p) as f:
                d = json.load(f)
            # driver records wrap the headline under "parsed"
            d = d.get("parsed") or d
            if abs(float(d.get("sf", -1)) - float(sf)) < 1e-9:
                prev, prev_name = d, os.path.basename(p)
                break
        if prev:
            for name, med in times.items():
                old = prev.get("queries", {}).get(name)
                if (
                    old
                    and min(old, med) < 3.0
                    and abs(med - old) > 0.2 * old
                ):
                    extras[f"{name}_drift_note"] = (
                        f"small-entry drift vs {prev_name}: {old}s -> "
                        f"{med}s ({(med - old) / old:+.0%}); under the "
                        "spread rule's radar, flagged by the 20% "
                        "absolute-delta rule (band <3s)"
                    )
            # Like-for-like round comparison IN the JSON (r12 verdict
            # #4): the raw headline total moves whenever an entry is
            # promoted into or retired from the headline (r12's
            # fuzzy_both_big_auto added ~32 s and read as a phantom 39%
            # regression). Rule: `comparable_total` sums ONLY the
            # entries present in BOTH this run and the newest recorded
            # round bench at the same sf; `comparable_prev_total` is
            # the same intersection summed from that record. A judge
            # reading only the JSON compares those two; `value` stays
            # the full total for absolute tracking.
            shared = [
                n for n in times if n in prev.get("queries", {})
            ]
            comparable.update(
                comparable_total=round(sum(times[n] for n in shared), 3),
                comparable_prev_total=round(
                    sum(prev["queries"][n] for n in shared), 3
                ),
                comparable_vs=prev_name,
                comparable_n=len(shared),
            )
    except Exception:
        pass  # a malformed historical record must not fail the bench
    # The driver captures only the last ~2KB of stdout and parses the
    # final JSON line; round 4's single line grew past that (extras) and
    # recorded parsed:null. So: extras go to a side file AND their own
    # earlier stdout line, and the FINAL line stays a compact headline
    # core with a hard length assert well under the capture window.
    extras_line = json.dumps({"metric": "bench_extras", "extras": extras})
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_EXTRAS.json"),
            "w",
        ) as f:
            f.write(extras_line + "\n")
    except OSError:
        pass
    print(extras_line)
    headline = json.dumps(
        {
            "metric": "headline_total",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": float(sf),
            "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            **comparable,
        }
    )
    assert len(headline) <= 1800, (
        f"headline bench line is {len(headline)} bytes; must stay <=1800 "
        "so the driver's 2KB tail capture contains it whole — move any "
        "new detail into extras"
    )
    print(headline)
    spark.stop()


if __name__ == "__main__":
    main()
