"""Regenerate PLANS.md: the physical plans of the engine's headline
operators, with the properties each plan must keep (asserted in tests).

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from prefixtree_spark import create, query
    from prefixtree_spark.operators import dedup, relational
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    cust = load_table(spark, sf, "customer")
    docs = load_table(spark, sf, "documents")

    sections: list[tuple[str, str, str]] = []

    def grab(title: str, df, commentary: str) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections.append((title, commentary, plan))

    pt = create(cust, "c_name", num_partitions=4)
    grab(
        "Index build — `create`",
        pt,
        "One Exchange (the reference's single DISTRIBUTE) feeding the "
        "per-partition builder; everything else narrow. "
        "`test_build_single_shuffle_plan` pins the Exchange count at 1.",
    )

    qdf = cust.where("c_custkey % 100 = 7").select(
        F.expr("substring(c_name, 1, 12)").alias("q")
    )
    res = query(pt, qdf, "q", 1, mode="broadcast_queries", colocated=True)
    grab(
        "Fuzzy query — distributed tree, colocated (zero-shuffle) traversal",
        res,
        "The dictionary side is NEVER shuffled: mapInPandas runs the "
        "vectorized branch-and-bound traversal in place; only the "
        "(small, broadcast) query batch moves. "
        "`test_colocated_zero_shuffle_plan_and_results` pins this.",
    )

    q3 = relational.top_revenue_orders(
        cust, load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )
    grab(
        "Top-k revenue join — Q3 shape",
        q3,
        "Filtered dimension explicitly broadcast (BroadcastHashJoin — the "
        "fact table never shuffles for the join) and the global top-k is "
        "TakeOrderedAndProject, not a full sort. Pinned by "
        "`test_q3_broadcasts_dim_and_takeordered`. The lineitem scan also "
        "shows parquet filter pushdown + column pruning (PushedFilters / "
        "ReadSchema).",
    )

    # disable result pinning so explain() shows the operator's real
    # plan, not the checkpoint scan it is pinned into
    dedup.PIN_RESULTS = False
    try:
        mh = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
        grab(
            "MinHash-LSH dedup — candidate generation",
            mh,
            "All candidate generation is equi-join shaped (band-bucket keys); "
            "nothing quadratic shuffles. Signatures are JVM-side xxhash64 in "
            "whole-stage codegen; exact verification touches candidates only. "
            "(At runtime the result is pinned and the shingle cache released — "
            "dedup._pin_release; disabled here so the plan is visible.)",
        )
    finally:
        dedup.PIN_RESULTS = True

    events = load_table(spark, sf, "events")
    views = events.where("event_type = 'view'").select("user_id", "ts", "event_id")
    purchases = events.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    aj = relational.asof_join(
        purchases, views, on="ts", by="user_id", right_cols=["event_id"], suffix="_v"
    )
    grab(
        "As-of join — union + carry-forward window",
        aj,
        "ONE shuffle (hash on the by-key feeding the window sort); no "
        "range join, no nested loop — both sides union into a single "
        "ordered pass where left rows inherit the last right payload. "
        "Oracled against DuckDB's native ASOF JOIN (events_asof_join).",
    )

    hour = 3_600_000_000
    signups = events.where("event_type = 'signup'").select(
        F.col("event_id").alias("signup_id"), "user_id",
        F.unix_micros("ts").alias("lo"), (F.unix_micros("ts") + 2 * hour).alias("hi"),
    )
    clicks = events.where("event_type = 'click'").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    rj = relational.range_join(
        clicks, signups, on="ts_us", lo="lo", hi="hi", by="user_id", bucket=hour
    )
    grab(
        "Range join — bucketed interval overlap",
        rj,
        "The interval predicate becomes an EQUI-join on (bucket, by) "
        "(SortMerge/Hash, broadcastable) with the exact range check as "
        "a post-filter — Spark's native plan for this θ-join is a "
        "BroadcastNestedLoopJoin, which is quadratic at scale. Explode "
        "fan-out is ~(interval/bucket + 1) rows per interval.",
    )

    from prefixtree_spark.operators import ann

    emb = load_table(spark, sf, "embeddings")
    qv = emb.where("vec_id % 50 = 0")
    topk = ann.cosine_topk(qv, "vec_id", "embedding", emb, "vec_id", "embedding", k=10)
    grab(
        "Exact ANN — cosine_topk (single chunk)",
        topk,
        "Corpus side: one narrow mapInPandas prefilter (tie-aware bounded "
        "candidates), NO corpus shuffle; candidates rejoin vectors and the "
        "broadcast query chunk; the rank window touches only |Q|*~2k rows. "
        "Query sets beyond query_chunk_rows run this same plan per bounded "
        "chunk (driver memory is one chunk; see cosine_topk docstring).",
    )

    from prefixtree_spark.operators import ranking, sampling

    bm_q = docs.select(
        F.col("doc_id").alias("qid"),
        F.slice(F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3).alias("terms"),
    ).where("doc_id % 41 = 0 AND size(terms) >= 3")
    dedup.PIN_RESULTS = False  # keep the LAZY plan (shared flag — see dedup sections)
    bm = ranking.bm25_rank(docs, "doc_id", "text", bm_q, "qid", "terms", idf="ratio")
    dedup.PIN_RESULTS = True
    grab(
        "BM25 retrieval — bm25_rank",
        bm,
        "Inverted-index retrieval: ONE tokenize+hash-agg pass builds the "
        "postings (cached — shared by the df-statistics branch and the "
        "probe), corpus stats are a 1-row broadcast, and the enriched "
        "query-term side is BROADCAST into the postings probe so the "
        "corpus never shuffles for the lookup. Scoring is one hash-agg "
        "on (query_id, doc_id); contributions are DECIMAL-cast before "
        "the sum (order-independent, cross-engine exact — oracled).",
    )

    quota = sampling.top_n_per_group(docs, ["source"], 20, id_col="doc_id", seed="q3")
    grab(
        "Per-group quota — top_n_per_group",
        quota,
        "The rank-filter window compiles to WindowGroupLimit: every map "
        "task keeps only its local top-n per group BEFORE the exchange, "
        "so the shuffle carries O(n·groups·tasks) rows, not the corpus "
        "(pinned by test_top_n_per_group_hash_stable_and_plan).",
    )

    pv = relational.pivot_counts(
        events, "user_id", "event_type",
        ["click", "error", "purchase", "signup", "view"],
    )
    grab(
        "Explicit-value pivot — pivot_counts",
        pv,
        "ONE HashAggregate with a conditional accumulator per output "
        "column and exactly one Exchange — no distinct scan over the "
        "pivot column, no data-decided schema width (pinned by "
        "test_pivot_counts_single_aggregate_plan).",
    )

    rs = relational.resample_carry_forward(
        events.select("user_id", "ts", "value"),
        ts_col="ts", by_col="user_id", value_cols=["value"],
    )
    grab(
        "Time-series resample — resample_carry_forward",
        rs,
        "Grid rows come from a NARROW sequence/explode over the "
        "per-group bounds aggregate; the carry is the asof_join "
        "union+window pass — shuffles only on the group key, never a "
        "range join (oracled: events_resampled_hourly).",
    )

    out = ["# PLANS — physical-plan audit of headline operators", ""]
    out.append(
        "Generated by `tools/dump_plans.py` (re-run after plan-affecting "
        "changes). Each section states the property the plan must keep "
        "and which test pins it.\n"
    )
    for title, commentary, plan in sections:
        out.append(f"## {title}\n")
        out.append(commentary + "\n")
        out.append("```")
        out.append(plan.strip())
        out.append("```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
