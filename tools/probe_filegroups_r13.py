"""A/B the per-worker file-group QueryBatch memo (_filegroup_batch) at
the bench filegroups_10x shape: cache on (new) vs capacity=0 (old
behavior: every task re-reads the group parquet and rebuilds the
QueryBatch).  Alternating order across reps to cancel warm-up bias."""

from __future__ import annotations

import os
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
    spark = get_spark("probe_filegroups")
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
    pt_big = create(words_big, "w", num_partitions=par).persist()
    pt_big.count()

    q10 = cust.crossJoin(
        spark.range(10).withColumnRenamed("id", "i")
    ).selectExpr(f"concat({perturb}, '_', cast(i as string)) as q").distinct()
    q10 = q10.persist()
    print(f"queries={q10.count()}")

    # capacity is read at call time inside the worker from the shipped
    # module — monkeypatching the driver module does NOT reach workers.
    # Instead, disable the cache by pointing tasks at per-variant qcol?
    # No: ship the choice via the spark conf read inside run_partition
    # is overkill — instead A/B by toggling the module-level capacity
    # BEFORE the session ships the function closure?  mapInPandas
    # pickles run_partition, which references the module FUNCTION
    # _filegroup_batch by name; workers import the module fresh, so
    # the capacity constant comes from the module file — the same for
    # both variants.  So for the "old" control we inline the previous
    # task body here instead.
    import pandas as pd
    from prefixtree_spark.functions.levenshtein import QueryBatch

    def old_query_filegroup(pt, chunk_path, qcol, k):
        def run_partition(batches):
            import pyarrow.parquet as pq

            frames = [pdf for pdf in batches if len(pdf)]
            if not frames:
                return
            strings = [
                s
                for s in pq.read_table(chunk_path, columns=[qcol])
                .column(0)
                .to_pylist()
                if s is not None
            ]
            if not strings:
                return
            pdf = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0]
            )
            yield qmod._traverse_pdf(pdf, QueryBatch(strings), k)

        return pt.mapInPandas(run_partition, schema=qmod.RESULT_SCHEMA)

    def run(variant: str) -> tuple[float, int]:
        orig = qmod._query_filegroup
        if variant == "old":
            qmod._query_filegroup = old_query_filegroup
        try:
            t0 = time.time()
            n = qmod._query_broadcast_queries_filegroups(
                pt_big, q10, 2, colocated=True, chunk_size=25_000
            ).count()
            return time.time() - t0, n
        finally:
            qmod._query_filegroup = orig

    for rep in range(3):
        order = ("old", "new") if rep % 2 == 0 else ("new", "old")
        line = []
        for v in order:
            tot, n = run(v)
            line.append(f"{v}={tot:.2f}s(rows={n})")
        print(f"[rep{rep}] " + " ".join(line), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
