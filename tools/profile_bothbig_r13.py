"""r13 optimization probe: where does fuzzy_both_big_auto spend time?

Reconstructs the bench's both-big shape at sf0.1 (4-perturbation
dictionary ~60k words, ~15k queries, k=2, chunk_size forced to 5000)
and measures:
  1. phase walls: tree build+preshard, per-chunk iterator fetch,
     per-chunk traversal job (mapInPandas + eager checkpoint);
  2. a driver-side cProfile of ONE forest partition's traversal with a
     5000-query batch (the task inner loop, minus Spark).

Usage: python tools/profile_bothbig_r13.py [--profile-only]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from prefixtree_spark import create
    from prefixtree_spark.operators import query as qmod
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_bothbig")
    spark.sparkContext.setLogLevel("ERROR")

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

    t0 = time.time()
    pt_big = create(
        words_big, "w", num_partitions=spark.sparkContext.defaultParallelism
    ).persist()
    n_nodes = pt_big.count()
    print(f"[phase] build+persist: {time.time()-t0:.2f}s  nodes={n_nodes}")

    q_big = cust.select(F.expr(perturb).alias("q"))
    qdf = q_big.where(F.col("q").isNotNull()).distinct().persist()
    n_q = qdf.count()
    print(f"[phase] query distinct+persist: {time.time()-t0:.2f}s cum  n_q={n_q}")

    # per-partition node counts (forest balance)
    parts = pt_big.groupBy(F.spark_partition_id().alias("p")).count().collect()
    cnts = sorted(r["count"] for r in parts)
    print(f"[shape] forests={len(cnts)} min={cnts[0]} med={cnts[len(cnts)//2]} max={cnts[-1]}")

    k = 2
    chunk_size = 5000

    if "--profile-only" not in sys.argv:
        # ---- phase timing of the chunk loop (mirrors
        # _query_broadcast_queries_chunked, instrumented) ----
        import pandas as pd

        from prefixtree_spark.functions.levenshtein import QueryBatch

        for rep in range(2):
            buf = []
            fetch_t = 0.0
            trav_t = []
            t_loop = time.time()
            chunks = []
            tf0 = time.time()
            for row in qdf.toLocalIterator():
                buf.append(row[0])
                if len(buf) >= chunk_size:
                    fetch_t += time.time() - tf0
                    tt0 = time.time()
                    chunks.append(
                        qmod._query_broadcast_queries(
                            pt_big, buf, k, colocated=True
                        ).localCheckpoint(eager=True)
                    )
                    trav_t.append(time.time() - tt0)
                    buf = []
                    tf0 = time.time()
            fetch_t += time.time() - tf0
            if buf:
                tt0 = time.time()
                chunks.append(
                    qmod._query_broadcast_queries(
                        pt_big, buf, k, colocated=True
                    ).localCheckpoint(eager=True)
                )
                trav_t.append(time.time() - tt0)
            out = chunks[0]
            for c in chunks[1:]:
                out = out.unionByName(c)
            n_rows = out.count()
            print(
                f"[loop rep{rep}] total={time.time()-t_loop:.2f}s "
                f"fetch={fetch_t:.2f}s trav={[round(t,2) for t in trav_t]} "
                f"rows={n_rows}"
            )

    if "--profile-only" not in sys.argv:
        # ---- the real chunked entry point, end to end ----
        for rep in range(2):
            t0 = time.time()
            n = qmod._query_broadcast_queries_chunked(
                pt_big, qdf, k, colocated=True, chunk_size=chunk_size
            ).count()
            print(f"[chunked rep{rep}] total={time.time()-t0:.2f}s rows={n}")

    # ---- driver-side cProfile of one forest traversal ----
    import pandas as pd

    from prefixtree_spark.functions.levenshtein import QueryBatch

    # biggest forest partition
    pidx = max(range(len(parts)), key=lambda i: parts[i]["count"])
    target_p = parts[pidx]["p"]
    pdf = (
        pt_big.withColumn("_pid", F.spark_partition_id())
        .where(F.col("_pid") == int(target_p))
        .drop("_pid")
        .toPandas()
    )
    qs = [r[0] for r in qdf.limit(chunk_size).collect()]
    print(f"[profile] forest nodes={len(pdf)} batch={len(qs)} k={k}")

    batch = QueryBatch(qs)
    idx = qmod.LocalIndex(pdf, merge=False)
    # warm
    t0 = time.time()
    qmod._traverse_auto(batch, k, idx)
    print(f"[profile] one traversal wall: {time.time()-t0:.2f}s")

    pr = cProfile.Profile()
    pr.enable()
    qmod._traverse_auto(batch, k, idx)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())

    spark.stop()


if __name__ == "__main__":
    main()
