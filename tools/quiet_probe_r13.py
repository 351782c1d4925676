"""Round-13 quiet probe for the four entries that crept in BENCH_r12
vs r11 (``events_sessionize_stream`` 1.553→2.759 s +78%,
``events_topk_stream`` 1.336→1.942 s +45%, ``build_index`` +33%,
``fuzzy_tree_k1`` +29%): a FRESH session per entry, 1 cold + 6 warm
runs, on a machine running nothing else — the same-machine code A/B
method from SCALING r12 (which root-caused the damerau/minhash creep
to machine drift, not code).

Usage:
  python tools/quiet_probe_r13.py [sf_dir] [tree_root]

``tree_root`` is the repo tree whose ``prefixtree_spark`` package to
measure (default: this repo). Run once with the current tree and once
with the r11 commit extracted via ``git archive`` to attribute each
delta to code or machine. Prints one JSON line per measurement;
SCALING.md gets the conclusion.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

_TREE = (
    os.path.abspath(sys.argv[2])
    if len(sys.argv) > 2
    else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _TREE)


def timed(fn, label, n_warm=6):
    runs = []
    for _ in range(1 + n_warm):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    print(json.dumps({
        "entry": label, "tree": _TREE, "cold": runs[0],
        "warm_median": round(statistics.median(runs[1:]), 3),
        "warm_min": min(runs[1:]), "warm_max": max(runs[1:]),
        "runs": runs,
    }), flush=True)
    return statistics.median(runs[1:])


def probe_streams(sf_dir):
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )
    from prefixtree_spark.streaming.sessionize import streaming_sessionize
    from prefixtree_spark.streaming.topk import latest_topk, streaming_topk

    spark = get_spark("probe_streams")
    spark.sparkContext.setLogLevel("ERROR")
    stream_dir = tempfile.mkdtemp(prefix="probe_events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")

    def sessionize_stream():
        stream = read_events_stream(spark, stream_dir)
        sink = run_stream_to_memory(
            spark,
            streaming_sessionize(stream, gap_minutes=30),
            "probe_sessionize_stream",
            output_mode="append",
            timeout_s=300,
        )
        return sink.count()

    timed(sessionize_stream, "events_sessionize_stream")

    def topk_stream():
        stream = read_events_stream(spark, stream_dir)
        sink = run_stream_to_memory(
            spark,
            streaming_topk(stream, k=10),
            "probe_topk_stream",
            output_mode="append",
            timeout_s=300,
        )
        return latest_topk(sink).count()

    timed(topk_stream, "events_topk_stream")
    shutil.rmtree(stream_dir, ignore_errors=True)
    spark.stop()


def probe_build_query(sf_dir):
    from pyspark.sql import functions as F

    from prefixtree_spark.operators.build import create
    from prefixtree_spark.operators.query import query
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    spark = get_spark("probe_build_query")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, sf_dir, "customer")
    perturb = (
        "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)),"
        " substring(c_name, cast(c_custkey % length(c_name) as int) + 2))"
    )
    qdf = cust.where("c_custkey % 20 = 3").select(F.expr(perturb).alias("q")).cache()
    qdf.count()

    pt_holder = {}

    def build():
        if "pt" in pt_holder:
            pt_holder["pt"].unpersist()
        pt = create(cust, "c_name").persist()
        n = pt.count()
        pt_holder["pt"] = pt
        return n

    timed(build, "build_index")
    timed(
        lambda: query(pt_holder["pt"], qdf, "q", 1, mode="broadcast_tree").count(),
        "fuzzy_tree_k1",
    )
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    probe_streams(sf)
    probe_build_query(sf)
