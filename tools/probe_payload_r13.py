"""Follow-up to probe_forest_split_r13: A/B the worker-cached
QueryBatch payload (now the package implementation of
``_query_broadcast_queries``) against the previous per-task-rebuild
code (inlined here as the control), at the bench both-big shape
(32 forests, 3 chunks of 5000, k=2).  Also asserts identical rows.
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
    spark = get_spark("probe_payload")
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
    qdf.count()
    k = 2
    chunk_size = 5000
    qs_all = [r[0] for r in qdf.collect()]
    chunks_q = [qs_all[i : i + chunk_size] for i in range(0, len(qs_all), chunk_size)]

    pt = create(words_big, "w", num_partitions=par).persist()
    pt.count()
    ptc = qmod._colocate_forests(pt).persist()
    ptc.count()

    def old_chunk(qs):
        bq = spark.sparkContext.broadcast(qs)

        def run_partition(batches, bq=bq):
            frames = [pdf for pdf in batches if len(pdf)]
            if not frames:
                return
            pdf = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0]
            )
            yield qmod._traverse_pdf(pdf, QueryBatch(bq.value), k)

        return ptc.mapInPandas(run_partition, schema=qmod.RESULT_SCHEMA)

    def run_chunks(variant: str):
        outs = []
        t_all = time.time()
        for qs in chunks_q:
            if variant == "old":
                res = old_chunk(qs)
            else:
                res = qmod._query_broadcast_queries(ptc, qs, k, colocated=True)
            outs.append(res.localCheckpoint(eager=True))
        out = outs[0]
        for c in outs[1:]:
            out = out.unionByName(c)
        n = out.count()
        return time.time() - t_all, n

    for rep in range(4):
        line = []
        for v in ("old", "new"):
            tot, n = run_chunks(v)
            line.append(f"{v}={tot:.2f}s(rows={n})")
        print(f"[rep{rep}] " + " ".join(line), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
