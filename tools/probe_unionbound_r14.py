"""Round-14 probe for the bounded chunk-result union (r13 verdict #6):
drive query_groups at >=1k file groups (tiny chunks so the traversals
are cheap and the UNION/plan machinery dominates) and record driver
RSS, plan-build/first-action time, and row parity against a one-shot
traversal of the same query side.

Usage: python tools/probe_unionbound_r14.py [sf_dir] [n_groups] [fanout]
fanout 0 = disable the collapse (pure balanced tree) for the A/B.
"""

from __future__ import annotations

import json
import os
import sys
import time

_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TREE)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_GROUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
FANOUT = int(sys.argv[3]) if len(sys.argv) > 3 else None


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from prefixtree_spark import create
    from prefixtree_spark.operators import query as qmod
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    if FANOUT is not None:
        if FANOUT <= 0:
            qmod._UNION_COLLAPSE_FANOUT = 10**9
        else:
            qmod._UNION_COLLAPSE_FANOUT = FANOUT

    spark = get_spark("probe_unionbound")
    spark.sparkContext.setLogLevel("ERROR")

    cust = load_table(spark, SF, "customer")
    words = cust.selectExpr("trim(c_name) as w").where("w <> ''")
    pt = create(words, "w", num_partitions=8).persist()
    pt.count()
    qdf = cust.where("c_custkey % 10 = 3").selectExpr(
        "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)),"
        " substring(c_name, cast(c_custkey % length(c_name) as int) + 2)) as q"
    )
    n_q = qdf.distinct().count()
    chunk = max(1, -(-n_q // N_GROUPS))
    root = tempfile.mkdtemp(prefix="probe_unionbound_")
    try:
        t0 = time.time()
        n_files = qmod.write_query_groups(qdf, "q", root, chunk_size=chunk)
        t_write = round(time.time() - t0, 3)
        rss0 = _rss_mb()
        t0 = time.time()
        res = qmod.query_groups(pt, root, 1, colocated=True)
        t_loop = round(time.time() - t0, 3)
        t0 = time.time()
        n_rows = res.count()
        t_first_action = round(time.time() - t0, 3)
        t0 = time.time()
        n_rows2 = res.count()
        t_second_action = round(time.time() - t0, 3)
        rss1 = _rss_mb()
        # parity: one-shot broadcast traversal of the same strings
        qs = [r[0] for r in qdf.distinct().collect()]
        n_ref = qmod._query_broadcast_queries(pt, qs, 1, colocated=True).count()
        print(
            json.dumps(
                {
                    "n_groups": n_files,
                    "fanout": qmod._UNION_COLLAPSE_FANOUT,
                    "n_queries": n_q,
                    "rows": n_rows,
                    "rows_second": n_rows2,
                    "rows_ref": n_ref,
                    "write_sec": t_write,
                    "chunk_loop_sec": t_loop,
                    "first_action_sec": t_first_action,
                    "second_action_sec": t_second_action,
                    "rss_before_mb": rss0,
                    "rss_after_mb": rss1,
                    "rss_delta_mb": round(rss1 - rss0, 1),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
