"""BM25 / TF-IDF relevance ranking over a document corpus — the
retrieval primitive a training-data pipeline uses for quality-targeted
sampling ("find documents like this seed set") and for building
retrieval-augmented eval sets.

Shape, built for 100 TB:
  - ONE tokenize pass builds the postings list ``(term, doc_id, tf,
    dl)`` — document length rides along from before the explode, so tf
    and dl need no second shuffle or self-join. Postings are cached
    (and released via the shared ``_pin_release`` hygiene helper) so
    the df-statistics branch and the probe join share one pass; only
    the cheap column-pruned scalar-stats scan re-reads the corpus.
  - Corpus statistics (N, total length) are a scalar aggregate joined
    in by broadcast; per-term document frequencies are joined to the
    QUERY terms first, so the expensive postings join only ever sees
    the (tiny) enriched query-term side — Spark broadcasts it and the
    postings never shuffle for the probe.
  - Scoring is one hash-agg shuffle on (query_id, doc_id) and a
    per-query top-k window. No cross join anywhere; cost is bounded by
    the postings of the queried terms (inverted-index retrieval).

Determinism / oracle notes: per-term contributions are computed in
IEEE double arithmetic (identical correctly-rounded ops in Spark and
DuckDB) and cast to DECIMAL(28,9) BEFORE the sum, so the aggregate is
exact and independent of partition order — the cross-engine FP-sum
trap from SURVEY/FIXTURES. With ``idf="ratio"`` the whole score uses
only +,-,*,/ (no transcendentals), making ranks bit-stable across
engines; ``idf="log"`` is the textbook Robertson idf (ln-based) and is
pinned by a pure-Python brute-force test instead of the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from prefixtree_spark.operators import dedup as _dedup


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str,
    id_col: str,
    rank_col: str = "rank",
    *,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N per-query rankings — the standard
    hybrid-retrieval combiner (lexical + semantic + priors):
    ``score(q, d) = Σ_r 1 / (c + rank_r(q, d))`` over the rankings
    that contain (q, d). Returns ``(query_col, id_col, rrf_rank)``
    with the top ``k`` fused results per query, ties on ``id_col``.

    Fusion needs only rank positions, never the incomparable raw
    scores — which is also what makes it oracle-exact: 1/(c+rank) is
    one correctly-rounded IEEE division (identical in any engine),
    cast to DECIMAL before the sum so aggregation order can't perturb
    ties. Plan shape: union of (tiny) top-k candidate sets → one
    hash-agg on (query, id) → per-query top-k window; cost is bounded
    by Σ|rankings|, independent of corpus size.
    """
    if not rankings:
        raise ValueError("at least one ranking required")
    contrib = (F.lit(1.0) / (F.lit(c) + F.col(rank_col))).cast("decimal(28,18)")
    tagged = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            contrib.alias("contrib"),
        )
        for r in rankings
    ]
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionByName(t)
    scored = allr.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        scored.withColumn("rrf_rank", F.row_number().over(w))
        .where(F.col("rrf_rank") <= k)
        .select(
            F.col("query_id").alias(query_col),
            F.col("doc_id").alias(id_col),
            "rrf_rank",
        )
    )


def bm25_rank(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    qid_col: str,
    qterms_col: str,
    *,
    k1: float = 1.25,
    b: float = 0.75,
    topk: int = 10,
    idf: str = "log",
) -> DataFrame:
    """Rank documents for each query by BM25 over whitespace tokens.

    ``queries`` carries one row per query with ``qterms_col`` an
    ``array<string>`` of query terms (deduplicated internally; BM25's
    sum is over distinct query terms here). Returns
    ``(query_id, doc_id, rank)`` with ``rank`` 1..topk per query,
    ordered by score descending, ties broken on ``doc_id`` ascending.

    ``idf="log"``: ln((N - df + 0.5) / (df + 0.5) + 1)  (Robertson+).
    ``idf="ratio"``: (N - df + 0.5) / (df + 0.5) — a monotone per-term
    variant using only exact-rounded IEEE ops, for cross-engine
    bit-stable ranks (the DuckDB oracle runs this variant).
    """
    if idf not in ("log", "ratio"):
        raise ValueError(f"idf must be 'log' or 'ratio', got {idf!r}")

    from prefixtree_spark.operators.text import _nonspace_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _nonspace_tokens(text_col).alias("ts"),
    )
    # dl rides along from before the explode: (doc_id, dl) is
    # functionally dependent, so grouping on both costs nothing extra.
    # cached: consumed by BOTH the df-statistics branch and the probe
    # join below — without the cache Spark tokenizes and shuffles the
    # whole corpus twice. Released by _pin_release once the (tiny,
    # top-k-per-query) result is materialized.
    postings = (
        toks.select("doc_id", F.size("ts").cast("long").alias("dl"), F.explode("ts").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # scalar corpus stats — a 1-row broadcast join. total_len comes
    # from the CACHED postings (Σtf ≡ Σ|tokens|), and n_docs from a
    # column-pruned count — neither re-runs the regex tokenize over
    # the corpus (empty docs still count toward n_docs, as in the
    # oracle).
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("total_len")
        )
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        queries.select(F.col(qid_col).alias("query_id"), F.explode(qterms_col).alias("term"))
        .distinct()
    )
    # enrich the SMALL side with df + stats so the big postings join
    # probes with everything it needs — qenriched stays broadcastable.
    qenriched = (
        qterms.join(dfreq, "term")  # inner: terms absent from the corpus score 0 anyway
        .crossJoin(F.broadcast(stats))
    )

    avgdl = F.col("total_len") * F.lit(1.0) / F.col("n_docs")
    if idf == "log":
        idf_col = F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
    else:
        idf_col = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))

    tf_num = F.col("tf") * F.lit(k1 + 1.0)
    tf_den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    contrib = ((idf_col * tf_num) / tf_den).cast("decimal(28,9)")

    scored = (
        F.broadcast(qenriched)
        .join(postings, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rank")
    )
    return _dedup._pin_release(out, postings)
