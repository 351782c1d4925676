"""Plan dumps for the r13 optimization-round work on the LSH verify
fusion and the BM25 dfreq semi-join.

The catalog dumps of these entries (r13_plans.py) are truncated to a
``Scan ExistingRDD`` because ``_pin_release`` eagerly checkpoints the
result; this script disables result pinning (dedup.PIN_RESULTS) so the
REAL operator plan is visible, and additionally reconstructs the
PRE-change pipelines inline so the before/after diff is on record:

  plans/r13/dedup_minhash_lsh_fused_{before,after}.txt
  plans/r13/dedup_incremental_lsh_fused_{before,after}.txt
  plans/r13/bm25_rank_docs_semijoin_{before,after}.txt
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import Window


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import prefixtree_spark.operators.dedup as dedup
    from prefixtree_spark.operators.dedup import (
        _band_buckets,
        _jaccard_from_shingles,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        token_shingles,
    )
    from prefixtree_spark.operators import ranking
    from prefixtree_spark.operators.ranking import (
        _bm25_contrib,
        _tokenize_postings,
    )
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13_plans_fused")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    dedup.PIN_RESULTS = False  # dump the REAL plan, not the checkpoint scan

    def grab(name: str, df) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}.txt")

    docs = load_table(spark, sf_dir, "documents")

    # ---- minhash LSH: the pre-fusion pipeline (exploded-shingle
    # verify + size groupBy), reconstructed ----
    def old_lsh_pairs():
        sh = token_shingles(docs, "doc_id", "text", 3)
        banded = _band_buckets(minhash_signatures(sh, num_perm=64), 32, 2)
        x, y = banded.alias("x"), banded.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
            .distinct()
        )
        return _jaccard_from_shingles(sh, 0.8, candidates=cand)

    grab("dedup_minhash_lsh_fused_before", old_lsh_pairs())
    grab(
        "dedup_minhash_lsh_fused_after",
        minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8),
    )

    # ---- incremental LSH ----
    new_df = docs.where("doc_id % 5 = 0")
    corpus_df = docs.where("doc_id % 5 <> 0")

    def old_incremental():
        sh_new = token_shingles(new_df, "doc_id", "text", 3)
        sh_cor = token_shingles(corpus_df, "doc_id", "text", 3)
        b_new = _band_buckets(minhash_signatures(sh_new, num_perm=64), 32, 2)
        b_cor = _band_buckets(minhash_signatures(sh_cor, num_perm=64), 32, 2)
        cand = (
            b_new.select(F.col("doc").alias("new_id"), "band", "bucket")
            .join(
                b_cor.select(F.col("doc").alias("corpus_id"), "band", "bucket"),
                ["band", "bucket"],
            )
            .select("new_id", "corpus_id")
            .distinct()
        )
        a = sh_new.select(F.col("doc").alias("new_id"), F.col("shingle").alias("s"))
        b = sh_cor.select(F.col("doc").alias("corpus_id"), F.col("shingle").alias("s"))
        inter = (
            cand.join(a, "new_id")
            .join(b, ["corpus_id", "s"])
            .groupBy("new_id", "corpus_id")
            .agg(F.count(F.lit(1)).alias("ic"))
        )
        sz_new = sh_new.groupBy("doc").agg(F.count(F.lit(1)).alias("sz1")).select(
            F.col("doc").alias("new_id"), "sz1"
        )
        sz_cor = sh_cor.groupBy("doc").agg(F.count(F.lit(1)).alias("sz2")).select(
            F.col("doc").alias("corpus_id"), "sz2"
        )
        jac = F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic"))
        return (
            inter.join(sz_new, "new_id")
            .join(sz_cor, "corpus_id")
            .where(jac >= 0.8)
            .select("new_id", "corpus_id", F.round(jac, 6).alias("jaccard"))
        )

    grab("dedup_incremental_lsh_fused_before", old_incremental())
    grab(
        "dedup_incremental_lsh_fused_after",
        incremental_lsh_pairs(new_df, corpus_df, "doc_id", "text"),
    )

    # ---- BM25: full-term dfreq groupBy vs query-term semi-join ----
    q = docs.select(
        F.col("doc_id").alias("qid"),
        F.slice(F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3).alias(
            "terms"
        ),
    ).where("doc_id % 41 = 0 AND size(terms) >= 3")

    def old_bm25():
        postings = _tokenize_postings(docs, "doc_id", "text")
        stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
            postings.agg(
                F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("total_len")
            )
        )
        dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        qterms = (
            q.select(F.col("qid").alias("query_id"), F.explode("terms").alias("term"))
            .distinct()
        )
        qenriched = qterms.join(dfreq, "term").crossJoin(F.broadcast(stats))
        scored = (
            F.broadcast(qenriched)
            .join(postings, "term")
            .groupBy("query_id", "doc_id")
            .agg(F.sum(_bm25_contrib(1.25, 0.75, "ratio")).alias("score"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
            .select("query_id", "doc_id", "rank")
        )

    grab("bm25_rank_docs_semijoin_before", old_bm25())
    grab(
        "bm25_rank_docs_semijoin_after",
        ranking.bm25_rank(docs, "doc_id", "text", q, "qid", "terms", idf="ratio"),
    )

    spark.stop()


if __name__ == "__main__":
    main()
