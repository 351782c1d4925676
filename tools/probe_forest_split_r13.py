"""r13 optimization-round-2 probe: the per-chunk floor of the both-big
chunk loop is the max SINGLE-forest walk (~1.9 s at bench shape).

Question 1 (forest split): does resharding the tree to MORE, SMALLER
forests before the chunk loop cut the chunk wall by more than the
reshard costs, at the bench's 3-chunk shape?  Sweep forest counts
{par, 2*par, 4*par, 8*par} and time (a) the reshard, (b) the chunk
traversal jobs.

Question 2 (QueryBatch broadcast): each traversal task builds
QueryBatch(bq.value) from the broadcast strings.  How much per-task
fixed cost is that at 5000 queries, and does broadcasting the PREBUILT
QueryBatch (unpickled once per reused worker via the pyspark broadcast
registry) cut the chunk wall?

Usage: python tools/probe_forest_split_r13.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import pandas as pd

    from prefixtree_spark import create
    from prefixtree_spark.operators import query as qmod
    from prefixtree_spark.functions.levenshtein import QueryBatch
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_forest_split")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    cust = load_table(spark, sf_dir, "customer")
    perturb = (
        "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)),"
        " substring(c_name, cast(c_custkey % length(c_name) as int) + 2))"
    )
    dict_exprs = [
        perturb,
        "concat(c_name, '_', cast(c_custkey % 7 as string))",
        "upper(reverse(c_name))",
        "concat(substring(c_name, 2, 30), cast(c_custkey % 13 as string))",
    ]
    words_big = cust.selectExpr(f"{dict_exprs[0]} as w")
    for e in dict_exprs[1:]:
        words_big = words_big.union(cust.selectExpr(f"{e} as w"))

    qdf = (
        cust.select(F.expr(perturb).alias("q"))
        .where(F.col("q").isNotNull())
        .distinct()
        .persist()
    )
    n_q = qdf.count()
    k = 2
    chunk_size = 5000
    qs_all = [r[0] for r in qdf.collect()]
    chunks_q = [qs_all[i : i + chunk_size] for i in range(0, len(qs_all), chunk_size)]
    print(f"n_q={n_q} chunks={len(chunks_q)} par={par}")

    # QueryBatch init cost at chunk size (per-task fixed cost today)
    for rep in range(3):
        t0 = time.time()
        QueryBatch(chunks_q[0])
        print(f"[qbinit rep{rep}] {time.time()-t0:.3f}s for {len(chunks_q[0])} queries")

    def run_chunks(pt, use_prebuilt: bool) -> tuple[float, list[float], int]:
        walls = []
        outs = []
        t_all = time.time()
        for qs in chunks_q:
            t0 = time.time()
            if use_prebuilt:
                bq = spark.sparkContext.broadcast(QueryBatch(qs))

                def run_partition(batches, bq=bq):
                    frames = [pdf for pdf in batches if len(pdf)]
                    if not frames:
                        return
                    pdf = (
                        pd.concat(frames, ignore_index=True)
                        if len(frames) > 1
                        else frames[0]
                    )
                    yield qmod._traverse_pdf(pdf, bq.value, k)

                res = pt.mapInPandas(
                    run_partition, schema=qmod.RESULT_SCHEMA
                ).localCheckpoint(eager=True)
            else:
                res = qmod._query_broadcast_queries(
                    pt, qs, k, colocated=True
                ).localCheckpoint(eager=True)
            walls.append(time.time() - t0)
            outs.append(res)
        out = outs[0]
        for c in outs[1:]:
            out = out.unionByName(c)
        n = out.count()
        return time.time() - t_all, walls, n

    results = {}
    for n_forests in (par, 2 * par, 4 * par, 8 * par):
        t0 = time.time()
        if n_forests == par:
            pt = create(words_big, "w", num_partitions=n_forests).persist()
        else:
            base = create(words_big, "w", num_partitions=par).persist()
            base.count()
            pt = qmod.reshard(base, num_partitions=n_forests).persist()
        n_nodes = pt.count()
        build_t = time.time() - t0
        t0 = time.time()
        ptc = qmod._colocate_forests(pt).persist()
        ptc.count()
        coloc_t = time.time() - t0
        parts = ptc.groupBy(F.spark_partition_id().alias("p")).count().collect()
        cnts = sorted(r["count"] for r in parts)
        for use_prebuilt in (False, True):
            for rep in range(3):
                tot, walls, n = run_chunks(ptc, use_prebuilt)
                tag = "prebuilt" if use_prebuilt else "strings"
                print(
                    f"[forests={n_forests} {tag} rep{rep}] total={tot:.2f}s "
                    f"walls={[round(w,2) for w in walls]} rows={n}"
                )
                results[(n_forests, tag, rep)] = tot
        print(
            f"[forests={n_forests}] nodes={n_nodes} build={build_t:.2f}s "
            f"colocate={coloc_t:.2f}s parts={len(cnts)} "
            f"nonempty={sum(1 for c in cnts if c)} max={cnts[-1]}"
        )
        ptc.unpersist()
        pt.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
