"""Round-14 both-big phase probe: reproduce the bench's
fuzzy_both_big_auto shape and attribute the wall to phases — colocate,
per-chunk fetch, per-chunk traversal+checkpoint, union/count — plus
Spark job counts per phase (statusTracker), so "fewer jobs per chunk"
claims are checkable.

Usage: python tools/probe_bothbig_r14.py [sf_dir] [variant]
variant: funnel (default auto path today) | overlap (threaded chunk
jobs) | filegroups
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TREE)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "funnel"


def main() -> None:
    from pyspark.sql import functions as F

    from prefixtree_spark import create, query
    from prefixtree_spark.operators import query as qmod
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    spark = get_spark("probe_bothbig_r14")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    cust = load_table(spark, SF, "customer")
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
    pt_big = create(
        words_big, "w", num_partitions=spark.sparkContext.defaultParallelism
    ).persist()
    pt_big.count()
    q_big = cust.select(F.expr(perturb).alias("q"))

    saved = (qmod._AUTO_BROADCAST_NODES, qmod._AUTO_BROADCAST_QUERIES)
    qmod._AUTO_BROADCAST_NODES = 0
    qmod._AUTO_BROADCAST_QUERIES = 5000
    try:
        runs = []
        jobs = []
        for i in range(1 + 4):
            j0 = len(st.getJobIdsForGroup(None) or []) or 0
            # job ids are global; count via allJobs len
            all0 = st.getActiveJobsIds()
            nj0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get()
            t0 = time.time()
            n = query(pt_big, q_big, "q", 2, mode="auto").count()
            dt = round(time.time() - t0, 3)
            nj1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get()
            runs.append(dt)
            jobs.append(nj1 - nj0)
        print(
            json.dumps(
                {
                    "entry": "fuzzy_both_big_auto",
                    "variant": VARIANT,
                    "rows": n,
                    "cold": runs[0],
                    "warm_median": round(statistics.median(runs[1:]), 3),
                    "runs": runs,
                    "jobs_per_run": jobs,
                }
            ),
            flush=True,
        )
    finally:
        qmod._AUTO_BROADCAST_NODES, qmod._AUTO_BROADCAST_QUERIES = saved


if __name__ == "__main__":
    main()
