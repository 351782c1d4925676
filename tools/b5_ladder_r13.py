"""B5 scale ladder (r12 verdict #7): the both-sides-big bar exists at
sf0.1 only — this experiment scales BOTH sides 1x/3x/5x beyond that
shape and pins the auto-vs-brute ratio trend, confirming the crossover
model extrapolates.

Scaling method: each rung r multiplies the sf0.1 both-big shape
(4 perturbation families of customer.c_name as the dictionary, the
deletion-perturbed name as the query) by |ROTS[r]| string ROTATIONS —
rotating a word by 0/3/6/9/12 characters yields families far apart in
edit distance, so each query keeps matching (approximately) only its
own rotation family and result density stays ~linear in scale, unlike
suffix-tagged variants which sit 1-2 edits apart and inflate the
result superlinearly.

Brute force at rung 3/5 is EXTRAPOLATED from a deterministic
1,000-query sample (cross-join DP cost is linear in the query count;
the r12 full-shape measurement 632.4 s anchors the method at 1x).

Usage: python tools/b5_ladder_r13.py [sf_dir]
Prints one JSON line per rung; results recorded in B5_LADDER_r13.json
and SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROTS = {1: [0], 3: [0, 5, 9], 5: [0, 3, 6, 9, 12]}


def rot(expr: str, r: int) -> str:
    if r == 0:
        return expr
    return (
        f"concat(substring({expr}, {r + 1}, 200), substring({expr}, 1, {r}))"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import prefixtree_spark.operators.query as _qmod
    from prefixtree_spark.operators.build import create
    from prefixtree_spark.operators.query import query
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    spark = get_spark("b5_ladder")
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

    results = []
    for scale, rots in ROTS.items():
        words = None
        for r in rots:
            for e in dict_exprs:
                part = cust.selectExpr(f"{rot(e, r)} as w")
                words = part if words is None else words.union(part)
        qdf = None
        for r in rots:
            part = cust.selectExpr(f"{rot(perturb, r)} as q")
            qdf = part if qdf is None else qdf.union(part)
        qdf = qdf.distinct().persist()
        n_q = qdf.count()

        t0 = time.time()
        pt = create(
            words, "w", num_partitions=spark.sparkContext.defaultParallelism
        ).persist()
        n_nodes = pt.count()
        build_sec = round(time.time() - t0, 3)
        n_words = words.distinct().count()

        saved = (_qmod._AUTO_BROADCAST_NODES, _qmod._AUTO_BROADCAST_QUERIES)
        try:
            _qmod._AUTO_BROADCAST_NODES = 0
            _qmod._AUTO_BROADCAST_QUERIES = 5000
            t0 = time.time()
            n_rows = query(pt, qdf, "q", 2, mode="auto").count()
            auto_sec = round(time.time() - t0, 3)
        finally:
            _qmod._AUTO_BROADCAST_NODES, _qmod._AUTO_BROADCAST_QUERIES = saved

        # brute on a deterministic query sample, extrapolated linearly
        wb = words.select(F.trim("w").alias("w2")).where("w2 <> ''").distinct()
        n_sample = min(n_q, 1000)
        qs = qdf.orderBy(F.xxhash64("q")).limit(n_sample).persist()
        qs.count()
        t0 = time.time()
        nb = (
            qs.crossJoin(wb).where(F.levenshtein("q", "w2", 2) >= 0).count()
        )
        brute_sample_sec = round(time.time() - t0, 3)
        brute_est_sec = round(brute_sample_sec * n_q / n_sample, 1)
        qs.unpersist()
        row = {
            "scale": scale,
            "n_words": n_words,
            "n_queries": n_q,
            "n_nodes": n_nodes,
            "build_sec": build_sec,
            "auto_sec": auto_sec,
            "auto_rows": n_rows,
            "brute_sample_queries": n_sample,
            "brute_sample_sec": brute_sample_sec,
            "brute_est_sec": brute_est_sec,
            "brute_sample_rows": nb,
            "ratio_est": round(brute_est_sec / auto_sec, 1),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
        pt.unpersist()
        qdf.unpersist()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "B5_LADDER_r13.json",
    )
    with open(out, "w") as f:
        json.dump({"metric": "b5_ladder", "sf_dir": sf_dir, "rungs": results}, f)
    spark.stop()


if __name__ == "__main__":
    main()
