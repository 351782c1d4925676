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

    # dl rides along from before the explode: (doc_id, dl) is
    # functionally dependent, so grouping on both costs nothing extra.
    # cached: consumed by BOTH the df-statistics branch and the probe
    # join below — without the cache Spark tokenizes and shuffles the
    # whole corpus twice. Released by _pin_release once the (tiny,
    # top-k-per-query) result is materialized.
    postings = _tokenize_postings(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
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

    scored = (
        F.broadcast(qenriched)
        .join(postings, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(_bm25_contrib(k1, b, idf)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rank")
    )
    return _dedup._pin_release(out, postings)


def _tokenize_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One tokenize pass → the postings frame ``(doc_id, dl, term,
    tf)`` — shared by the in-session ranker and the persisted-layout
    builder so the two can never drift on tokenization or tf/dl
    semantics."""
    from prefixtree_spark.operators.text import _nonspace_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _nonspace_tokens(text_col).alias("ts"),
    )
    return (
        toks.select(
            "doc_id",
            F.size("ts").cast("long").alias("dl"),
            F.explode("ts").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _bm25_contrib(k1: float, b: float, idf: str):
    """The per-(query-term, doc) BM25 contribution column over
    ``(tf, dl, df, n_docs, total_len)`` — ONE definition consumed by
    both the in-session ranker and the stored-index probe, cast to
    DECIMAL(28,9) before the sum for partition-order-independent
    aggregation (the cross-engine FP-sum rule from the module
    docstring)."""
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
    return ((idf_col * tf_num) / tf_den).cast("decimal(28,9)")


# ---------------------------------------------------------------------------
# Persisted BM25 layout — the sparse twin of ``ann.save_ivf_index``.
#
# Until round 9 the postings were rebuilt per session (``bm25_rank``
# caches within one call); a serving replica or a repeated-probe
# pipeline paid the full corpus tokenize every time. The stored layout
# makes sparse retrieval a FIRST-CLASS index with the same lifecycle as
# the vector side: save → append (exactly-once txn markers, per-table
# replay guards) → maintain (compaction, staged recoverable swap) →
# serve (``serving.LocalSparseIndex``, Spark-free, generation-pinned).
#
#   path/meta/          n_buckets, k1, b, idf  (scoring params frozen
#                       at save so every probe scores identically)
#   path/postings/bucket=B/   (term, doc_id, tf, dl) — term-hash
#                       bucketed: a probe reads ONLY its query terms'
#                       buckets (partition pruning), never the corpus
#   path/dfreq/bucket=B/      (term, df, txn) — df is MERGE-ON-READ:
#                       appends add increment rows, readers sum per
#                       term, maintenance compacts to one row
#   path/stats/         (n_docs, total_len, txn) — same merge-on-read
#   path/_txns/         retired-txn markers (sources.io machinery)
#   path/_generation    serving reload signal, bumped after writes
#
# The bucket hash is a 60-bit md5 prefix — computable identically in
# Spark SQL (md5/conv/pmod) and plain Python (hashlib) so the
# Spark-free serving handle prunes the same buckets the cluster probe
# does. xxhash64 would be cheaper JVM-side but has no stdlib twin.
# ---------------------------------------------------------------------------

_BM25_GUARD_STATIC_MAX = 100_000  # same bound as ann._APPEND_GUARD_STATIC_MAX


def term_bucket(term: str, n_buckets: int) -> int:
    """Python twin of the layout's bucket assignment (60-bit md5
    prefix, UTF-8 bytes) — exact match with ``_term_bucket_col`` so a
    Spark-free replica prunes the same bucket directories."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def _term_bucket_col(col, n_buckets: int):
    """Spark twin of ``term_bucket``: md5 → first 15 hex digits →
    base-10 long (60 bits, never overflows) → pmod. Deterministic and
    engine-portable, unlike hash()/xxhash64 which have no pure-Python
    counterpart for the serving handle."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def save_bm25_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    n_buckets: int = 32,
    k1: float = 1.25,
    b: float = 0.75,
    idf: str = "log",
) -> None:
    """Build and persist the inverted-index layout (see the section
    comment for the directory contract). ONE tokenize pass, ONE
    bucket shuffle: postings repartition on the bucket column before
    ``partitionBy`` so each bucket directory is one file, not
    writers×buckets tiny files (the r7 IVF postings lesson). Scoring
    params (k1, b, idf) freeze into meta — every later probe, cluster
    or replica, scores with the build's parameters."""
    import pandas as _pd

    if idf not in ("log", "ratio"):
        raise ValueError(f"idf must be 'log' or 'ratio', got {idf!r}")
    spark = docs.sparkSession
    docs = docs.where(F.col(id_col).isNotNull())
    postings = _tokenize_postings(docs, id_col, text_col).withColumn(
        "bucket", _term_bucket_col(F.col("term"), n_buckets)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        total_len = postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long")
        ).collect()[0][0]
        n_docs = docs.count()  # empty docs count toward n_docs (oracle rule)
        (
            postings.repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/postings")
        )
        (
            postings.groupBy("bucket", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .withColumn("txn", F.lit(None).cast("string"))
            .repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/dfreq")
        )
    finally:
        postings.unpersist()
    # tiny sidecars through pandas/Arrow, never a list-backed local
    # relation (the 4-9 s per 16-row write lesson, SCALING r8)
    spark.createDataFrame(
        _pd.DataFrame(
            {"n_docs": [int(n_docs)], "total_len": [int(total_len)],
             "txn": _pd.array([None], dtype="object")}
        ),
        schema="n_docs long, total_len long, txn string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    spark.createDataFrame(
        _pd.DataFrame(
            {"n_buckets": [int(n_buckets)], "k1": [float(k1)],
             "b": [float(b)], "idf": [str(idf)]}
        ),
        schema="n_buckets int, k1 double, b double, idf string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    from prefixtree_spark.operators.ann import _bump_ivf_generation

    _bump_ivf_generation(spark, path)


def append_bm25_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    txn: str | None = None,
) -> int:
    """Incrementally add documents to a persisted BM25 index — the
    sparse twin of ``ann.append_ivf_index``, same cost shape
    (O(|delta|), no touch of existing corpus files) and the same
    exactly-once contract:

    - ``txn`` recorded → return the original count (marker fast path,
      ``sources.io`` retired-txn files under ``path/_txns``);
    - unrecorded replay (crash before the marker) → per-table guards:
      postings are guarded by doc_id presence (literal-IN pruned scan
      for collectable deltas, semi-join past the static cap), dfreq
      and stats increments carry the txn tag and are guarded by a
      tag-presence probe — any crash point replays to the same
      complete state, no double counting.

    df and corpus stats are MERGE-ON-READ increments (readers sum;
    ``maintain_bm25_index`` compacts), which is what makes the append
    one delta-sized job instead of a corpus-wide dfreq rewrite — the
    deletion-tombstone trade, applied to additive statistics.

    Contract (as the IVF side): delta doc_ids are NEW — re-appending a
    live doc_id double-counts its terms' df. NULL ids are dropped
    (invisible to the guards, unservable). Single-writer."""
    from prefixtree_spark.operators.ann import _bump_ivf_generation
    from prefixtree_spark.sources.io import _retire_txn, _retired_txn_version

    if txn is not None:
        rv = _retired_txn_version(spark, path, txn)
        if rv is not None:
            return rv
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets = int(meta.n_buckets)
    docs = new_docs.where(F.col(id_col).isNotNull())
    postings = _tokenize_postings(docs, id_col, text_col).withColumn(
        "bucket", _term_bucket_col(F.col("term"), n_buckets)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_docs_delta = docs.count()
        if n_docs_delta == 0:
            return 0
        total_len_delta = postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long")
        ).collect()[0][0]
        post_delta = postings
        write_posts, write_incr = True, True
        if txn is not None:
            # per-table replay guards (docstring): which halves of the
            # crashed append already landed?
            ids = None
            dids = postings.select("doc_id").distinct()
            n_ids = dids.count()
            if n_ids <= _BM25_GUARD_STATIC_MAX:
                ids = [r[0] for r in dids.collect()]
                present = {
                    r[0]
                    for r in spark.read.parquet(f"{path}/postings")
                    .select("doc_id")
                    .where(F.col("doc_id").isin(ids))
                    .distinct()
                    .collect()
                }
                if present:
                    post_delta = postings.where(
                        ~F.col("doc_id").isin(list(present))
                    )
                    if len(present) >= n_ids:
                        write_posts = False
            else:
                existing = spark.read.parquet(f"{path}/postings").select(
                    "doc_id"
                )
                post_delta = postings.join(existing, "doc_id", "left_anti")
                write_posts = post_delta.limit(1).count() > 0
            # dfreq/stats increments are tag-keyed: one narrow probe
            # answers "did this txn's increments land?" for both tables
            # (they are written back-to-back, stats last)
            tagged = (
                spark.read.parquet(f"{path}/stats")
                .where(F.col("txn") == txn)
                .limit(1)
                .count()
            )
            if tagged:
                write_incr = False
            elif (
                spark.read.parquet(f"{path}/dfreq")
                .where(F.col("txn") == txn)
                .limit(1)
                .count()
            ):
                # dfreq landed, stats didn't (crash between the two):
                # replay only the stats half
                write_incr = "stats_only"
        if write_posts:
            (
                post_delta.repartition(n_buckets, "bucket")
                .write.mode("append")
                .partitionBy("bucket")
                .parquet(f"{path}/postings")
            )
        if write_incr:
            if write_incr is True:  # "stats_only" skips the dfreq half
                (
                    postings.groupBy("bucket", "term")
                    .agg(F.count(F.lit(1)).cast("long").alias("df"))
                    .withColumn("txn", F.lit(txn).cast("string"))
                    .repartition(n_buckets, "bucket")
                    .write.mode("append")
                    .partitionBy("bucket")
                    .parquet(f"{path}/dfreq")
                )
            import pandas as _pd

            spark.createDataFrame(
                _pd.DataFrame(
                    {"n_docs": [int(n_docs_delta)],
                     "total_len": [int(total_len_delta)],
                     "txn": _pd.array([txn], dtype="object")}
                ),
                schema="n_docs long, total_len long, txn string",
            ).coalesce(1).write.mode("append").parquet(f"{path}/stats")
        if txn is not None:
            _retire_txn(spark, path, txn, n_docs_delta)
        _bump_ivf_generation(spark, path)
    finally:
        postings.unpersist()
    return int(n_docs_delta)


def maintain_bm25_index(
    spark,
    path: str,
    *,
    max_files_per_bucket: float = 4.0,
) -> dict:
    """Maintenance for a persisted BM25 layout — the sparse twin of
    ``ann.maintain_ivf_index``'s compaction half (there is no trained
    quantizer here, so no retrain concept): when appends have grown the
    per-bucket file count past ``max_files_per_bucket``, rewrite
    postings and dfreq one-file-per-bucket (dfreq increments roll up to
    one row per term, stats rows to one row) through a STAGED,
    crash-recoverable swap — each table stages next to the live layout
    and moves with stats LAST as the completeness marker; a call that
    finds a complete stage finishes the swap first, an incomplete one
    is deleted as garbage. Bumps the generation so replicas reload.

    Returns ``{"compacted", "files_per_bucket", "recovered"}``."""
    import pandas as _pd

    from prefixtree_spark.operators.ann import _bump_ivf_generation
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    _SWAP_ORDER = ("postings", "dfreq", "stats")
    staged_root = f"{path}/_compact"

    def _swap_in() -> None:
        for sub in _SWAP_ORDER:
            src = P(f"{staged_root}/{sub}")
            if fs.exists(src):
                dst = P(f"{path}/{sub}")
                if fs.exists(dst):
                    fs.delete(dst, True)
                if not fs.rename(src, dst):
                    raise IOError(f"rename {src} -> {dst} failed")
        fs.delete(P(staged_root), True)

    recovered = False
    if fs.exists(P(staged_root)):
        if fs.exists(P(f"{staged_root}/stats")):
            _swap_in()  # complete stage from a crashed swap: finish it
            recovered = True
            _bump_ivf_generation(spark, path)
        else:
            fs.delete(P(staged_root), True)  # mid-write garbage

    n_files, n_dirs = 0, 0
    for st in fs.listStatus(P(f"{path}/postings")):
        if not (st.isDirectory() and st.getPath().getName().startswith("bucket=")):
            continue
        n_dirs += 1
        for f in fs.listStatus(st.getPath()):
            if f.getPath().getName().endswith(".parquet"):
                n_files += 1
    files_per_bucket = n_files / max(1, n_dirs)
    compacted = False
    if files_per_bucket > max_files_per_bucket:
        compacted = True
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        n_buckets = int(meta.n_buckets)
        (
            spark.read.parquet(f"{path}/postings")
            .repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{staged_root}/postings")
        )
        (
            spark.read.parquet(f"{path}/dfreq")
            .groupBy("bucket", "term")
            .agg(F.sum("df").cast("long").alias("df"))
            .withColumn("txn", F.lit(None).cast("string"))
            .repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{staged_root}/dfreq")
        )
        srow = (
            spark.read.parquet(f"{path}/stats")
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("total_len").cast("long").alias("total_len"),
            )
            .collect()[0]
        )
        spark.createDataFrame(
            _pd.DataFrame(
                {"n_docs": [int(srow.n_docs)],
                 "total_len": [int(srow.total_len)],
                 "txn": _pd.array([None], dtype="object")}
            ),
            schema="n_docs long, total_len long, txn string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{staged_root}/stats")
        _swap_in()
        _bump_ivf_generation(spark, path)
    return {
        "compacted": compacted,
        "files_per_bucket": round(files_per_bucket, 2),
        "recovered": recovered,
    }


def bm25_rank_indexed(
    spark,
    path: str,
    queries: DataFrame,
    qid_col: str,
    qterms_col: str,
    *,
    topk: int = 10,
) -> DataFrame:
    """Rank against a PERSISTED BM25 layout — identical semantics to
    ``bm25_rank`` over the same corpus (same tokenizer, same
    ``_bm25_contrib`` expression, params from the layout's meta), but
    the corpus-sized tokenize is already paid: the probe reads ONLY the
    query terms' bucket directories (static literal-IN partition
    pruning — the measured rule over dynamic pruning) and within them
    only the queried terms' rows (term predicate pushed to parquet).
    Cost is bounded by the queried terms' postings, independent of
    corpus size — inverted-index retrieval against bytes at rest.

    Serving-shaped bounded-batch assumption (as
    ``ann.cosine_topk_ivf_index`` documents): the DISTINCT query-term
    set collects to the driver to drive the pruning literals — fine
    for retrieval batches (≤ ~10^5 distinct terms); a corpus-scale
    term set belongs on ``bm25_rank`` instead."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets, k1, b, idf = (
        int(meta.n_buckets), float(meta.k1), float(meta.b), str(meta.idf)
    )
    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"), F.explode(qterms_col).alias("term")
        )
        .distinct()
    )
    terms = sorted({r.term for r in qterms.select("term").distinct().collect()})
    if not terms:
        # empty typed frame: doc_id takes the LAYOUT's type, not term's
        return (
            qterms.select("query_id")
            .limit(0)
            .crossJoin(
                spark.read.parquet(f"{path}/postings").select("doc_id").limit(0)
            )
            .withColumn("rank", F.lit(0).cast("int"))
        )
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    stats = spark.read.parquet(f"{path}/stats").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_len").cast("long").alias("total_len"),
    )
    dfreq = (
        spark.read.parquet(f"{path}/dfreq")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))  # merge-on-read increments
    )
    posts = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    qenriched = qterms.join(dfreq, "term").crossJoin(F.broadcast(stats))
    scored = (
        F.broadcast(qenriched)
        .join(posts, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(_bm25_contrib(k1, b, idf)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rank")
    )
