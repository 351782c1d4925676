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

    qterms = (
        queries.select(F.col(qid_col).alias("query_id"), F.explode(qterms_col).alias("term"))
        .distinct()
    )
    # r13: pre-filter the df branch with a broadcast semi-join on the
    # query terms (broadcastable by this ranker's contract — qenriched
    # below already is). Only query-term df values survive the qterms
    # inner join anyway, but without the filter the groupBy exchange
    # carries EVERY corpus term — corpus-sized at scale where the
    # query-term postings are tiny. df for surviving terms is identical
    # by construction (the restriction commutes with the per-term
    # count); measured neutral at sf0.1 (the full-term shuffle is small
    # there — tools probe, interleaved medians 2.60 vs 2.75 s), kept
    # for the exchange-size reduction. A further restructure (persist
    # the filtered postings and probe THEM in the scoring join) was
    # measured 0.2 s SLOWER at sf0.1 — the extra materialization beats
    # the saved scan at fixture scale — and was not kept.
    dfreq = (
        postings.join(
            F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
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
#   path/docs/          (doc_id, h, txn) — one row per live document
#                       with h = xxhash64(text), the content
#                       fingerprint update/delete reconcile diffs
#                       against the corpus (r10; absent on pre-r10
#                       layouts — reconcile then directs callers to
#                       rebuild_from). Also the authoritative doc
#                       list: n_docs corrections count from it, so
#                       EMPTY documents (no postings rows) delete
#                       exactly too.
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


def _docs_fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, h)`` with ``h = xxhash64(text)`` — ONE definition of
    the content fingerprint, shared by save/append (writers) and
    reconcile (the differ), so the change detector can never drift
    from the stored hashes. xxhash64 is JVM-built-in (no Python twin
    needed: reconcile runs on the cluster) and hashes NULL text to the
    seed constant, so NULL==NULL compares equal — a doc whose text
    stays NULL is correctly 'unchanged'."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("h"),
    )


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
        if n_docs == 0:
            # fail loudly like save_ivf_index: zero-row partitionBy
            # writes create FILE-LESS table dirs that brick every later
            # probe; use maintain_bm25_index's drain for an
            # intentionally-empty layout (r10 review follow-up)
            raise ValueError("save_bm25_index: empty corpus")
        dfreq_df = (
            postings.groupBy("bucket", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .withColumn("txn", F.lit(None).cast("string"))
        )
        if total_len == 0:
            # corpus of only EMPTY documents: same file-less hazard —
            # one schema-bearing empty file per bucketed table, inside
            # a bucket=0 partition dir (the ann._drain layout trick).
            # The table ROOTS are deleted first: the bucket=0 write
            # overwrites only its own subdirectory, and a re-save over
            # an existing layout would otherwise leave the old
            # bucket=1..N files silently ranking the previous corpus
            # (r10 review)
            from prefixtree_spark.sources.io import _fs as _sfs

            _f, _j = _sfs(spark, path)
            for _sub in ("postings", "dfreq"):
                _f.delete(
                    _j.org.apache.hadoop.fs.Path(f"{path}/{_sub}"), True
                )
            postings.drop("bucket").limit(0).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{path}/postings/bucket=0")
            dfreq_df.drop("bucket").limit(0).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{path}/dfreq/bucket=0")
        else:
            (
                postings.repartition(n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{path}/postings")
            )
            (
                dfreq_df
                .repartition(n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{path}/dfreq")
            )
        # per-doc content fingerprints — the reconcile diff target.
        # Derived from the DOCS frame (not postings) so empty
        # documents get a row too.
        _docs_fingerprints(docs, id_col, text_col).withColumn(
            "txn", F.lit(None).cast("string")
        ).write.mode("overwrite").parquet(f"{path}/docs")
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
    from prefixtree_spark.operators.ann import (
        _bump_ivf_generation,
        _clear_stale_sidecars,
    )

    # a fresh save over an existing layout must not inherit its
    # lifecycle sidecars: stale tombstones would mask the new rows and
    # block their re-append, stale txn markers would no-op appends the
    # new layout never saw (ADVICE r9 #1); bump=False — the
    # unconditional bump below covers the reload signal
    _clear_stale_sidecars(spark, path, bump=False)
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
    - with ``txn``, docs ALREADY in the index are dropped up front
      (doc_id presence: literal-IN pruned scan for collectable deltas,
      anti-join past the static cap), so overlapping candidate sets —
      a sync replaying a compacted corpus snapshot — append only the
      genuinely-new documents and count df/stats from exactly them;
    - unrecorded replay (crash before the marker) → per-table guards:
      dfreq and stats increments carry the txn tag (a narrow probe
      answers "did this txn's increments land?"), postings by the same
      presence filter. Write order is increments FIRST, postings LAST:
      the presence filter that sizes the increments only moves when
      postings land, so any replay recomputes the SAME increments —
      any crash point replays to the same complete state, no double
      counting. (Per-write atomicity rides Spark's job commit, the
      standing caveat from ``append_ivf_index``.)

    df and corpus stats are MERGE-ON-READ increments (readers sum;
    ``maintain_bm25_index`` compacts), which is what makes the append
    one delta-sized job instead of a corpus-wide dfreq rewrite — the
    deletion-tombstone trade, applied to additive statistics.

    Without ``txn`` the presence scan is skipped: delta doc_ids must
    be NEW (re-appending a live doc_id double-counts its terms' df —
    the raw caller contract, as the IVF side). NULL ids are dropped
    (invisible to the guards, unservable). Single-writer. Returns the
    number of documents actually appended."""
    from prefixtree_spark.operators.ann import _bump_ivf_generation
    from prefixtree_spark.sources.io import _retire_txn, _retired_txn_version

    if txn is not None:
        rv = _retired_txn_version(spark, path, txn)
        if rv is not None:
            return rv
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets = int(meta.n_buckets)
    docs = new_docs.where(F.col(id_col).isNotNull())
    ts = _load_bm25_tombstones(spark, path)
    if ts:
        if len(ts) <= _BM25_GUARD_STATIC_MAX:
            hit = docs.where(F.col(id_col).isin(list(ts))).limit(1).count()
        else:
            # past the literal cap: semi-join the (broadcastable)
            # sidecar instead of inlining 10^5+ ids into the plan
            tsf = _bm25_tombstones_frame(spark, path)
            hit = (
                docs.join(
                    F.broadcast(tsf.toDF(id_col)), id_col, "left_semi"
                ).limit(1).count()
                if tsf is not None else 0
            )
        if hit:
            # the tombstoned doc's OLD postings are still physical: the
            # presence filter would skip the new rows and clearing the
            # tombstone would resurrect the stale document — reject
            # until maintenance compacts (same contract as
            # append_ivf_index)
            raise ValueError(
                "append_bm25_index: delta contains tombstoned doc_ids; "
                "run maintain_bm25_index to compact deletions first"
            )
    postings = _tokenize_postings(docs, id_col, text_col).withColumn(
        "bucket", _term_bucket_col(F.col("term"), n_buckets)
    )
    # pre-r10 layouts have no docs/ fingerprint table; appends keep
    # working (reconcile is what requires it). Computed up front: the
    # presence filter below also reads it.
    from prefixtree_spark.sources.io import _fs as _fs_

    _dfs, _djvm = _fs_(spark, path)
    has_docs = _dfs.exists(
        _djvm.org.apache.hadoop.fs.Path(f"{path}/docs")
    )
    if txn is not None:
        # presence filter BEFORE anything is counted: increments and
        # postings both derive from the genuinely-new rows, and the
        # filter's outcome is stable across unrecorded replays because
        # postings (the table it reads) land last
        dids = docs.select(F.col(id_col).alias("doc_id")).distinct()
        n_ids = dids.count()
        # empty-text docs never emit postings, so the postings-keyed
        # filter cannot see a re-offered empty doc (r10 advice): a new
        # txn would append a duplicate fingerprint row that
        # reconcile_with then counts twice. When docs/ exists, the
        # fingerprint table is a second presence source — EXCLUDING
        # rows tagged with THIS txn, so an unrecorded replay (crash
        # between the docs/ write and postings) recomputes the same
        # delta instead of seeing its own partial write.
        presence_srcs = [spark.read.parquet(f"{path}/postings")]
        if has_docs:
            presence_srcs.append(
                spark.read.parquet(f"{path}/docs").where(
                    ~F.col("txn").eqNullSafe(F.lit(txn))
                )
            )
        if n_ids <= _BM25_GUARD_STATIC_MAX:
            ids = [r[0] for r in dids.collect()]
            present = {
                r[0]
                for src in presence_srcs
                for r in src.select("doc_id")
                .where(F.col("doc_id").isin(ids))
                .distinct()
                .collect()
            }
            if present:
                postings = postings.where(
                    ~F.col("doc_id").isin(list(present))
                )
                docs = docs.where(~F.col(id_col).isin(list(present)))
        else:
            for src in presence_srcs:
                existing = src.select("doc_id")
                postings = postings.join(existing, "doc_id", "left_anti")
                docs = docs.join(
                    existing.withColumnRenamed("doc_id", id_col).distinct(),
                    id_col,
                    "left_anti",
                )
    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_new = docs.count()
        if n_new == 0:
            if txn is not None:
                # distinguish "genuinely nothing new" from "unrecorded
                # replay after a crash between the postings write and
                # the marker" (ADVICE r9 #3): in the crash case the
                # presence filter drops every doc (postings landed),
                # but the txn-tagged stats increment ALSO landed
                # (increments write first) and carries the original
                # count — retire with it so the marker fast path and
                # sync_bm25_from_published report the real number.
                landed = (
                    spark.read.parquet(f"{path}/stats")
                    .where(F.col("txn") == txn)
                    .agg(F.sum("n_docs").cast("long"))
                    .collect()[0][0]
                )
                _retire_txn(spark, path, txn, int(landed or 0))
                if landed:
                    # the crashed attempt DID change the layout and
                    # never bumped — replicas must reload (r10 review)
                    _bump_ivf_generation(spark, path)
                return int(landed or 0)
            return 0
        total_len_delta = postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long")
        ).collect()[0][0]
        write_df, write_stats, write_docs = True, True, True
        if txn is not None:
            if (
                spark.read.parquet(f"{path}/dfreq")
                .where(F.col("txn") == txn)
                .limit(1)
                .count()
            ):
                write_df = False
            if (
                spark.read.parquet(f"{path}/stats")
                .where(F.col("txn") == txn)
                .limit(1)
                .count()
            ):
                write_stats = False
            if has_docs and (
                spark.read.parquet(f"{path}/docs")
                .where(F.col("txn") == txn)
                .limit(1)
                .count()
            ):
                write_docs = False
        if write_df:
            (
                postings.groupBy("bucket", "term")
                .agg(F.count(F.lit(1)).cast("long").alias("df"))
                .withColumn("txn", F.lit(txn).cast("string"))
                .repartition(n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term")
                .write.mode("append")
                .partitionBy("bucket")
                .parquet(f"{path}/dfreq")
            )
        if write_stats:
            import pandas as _pd

            spark.createDataFrame(
                _pd.DataFrame(
                    {"n_docs": [int(n_new)],
                     "total_len": [int(total_len_delta)],
                     "txn": _pd.array([txn], dtype="object")}
                ),
                schema="n_docs long, total_len long, txn string",
            ).coalesce(1).write.mode("append").parquet(f"{path}/stats")
        if has_docs and write_docs:
            # fingerprint rows ride the increments-first discipline:
            # they land before postings, so a replay's presence filter
            # (which keys on postings) recomputes the same delta and
            # the txn guard above skips the duplicate write
            _docs_fingerprints(docs, id_col, text_col).withColumn(
                "txn", F.lit(txn).cast("string")
            ).write.mode("append").parquet(f"{path}/docs")
        (
            postings.repartition(n_buckets, "bucket")
            .sortWithinPartitions("bucket", "term")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{path}/postings")
        )
        if txn is not None:
            _retire_txn(spark, path, txn, n_new)
        _bump_ivf_generation(spark, path)
    finally:
        postings.unpersist()
    return int(n_new)


def maintain_bm25_index(
    spark,
    path: str,
    *,
    max_files_per_bucket: float = 4.0,
    rebuild_from: "DataFrame | None" = None,
    reconcile_with: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: "int | None" = None,
    lease_ttl_s: float = 3600.0,
) -> dict:
    """``_maintain_bm25_index_locked`` under the layout's single-writer
    lease — the same writer-writer exclusion as
    ``ann.maintain_ivf_index`` (r11 verdict #3): a concurrent
    maintainer raises ``MaintenanceLeaseHeld`` instead of interleaving
    staged renames; a crashed maintainer's lease is stolen after
    ``lease_ttl_s`` and its half-done swap healed by the recovery
    path. Maintenance semantics in the locked body's docstring."""
    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    token = acquire_maintenance_lease(spark, path, ttl_s=lease_ttl_s)
    try:
        return _maintain_bm25_index_locked(
            spark,
            path,
            max_files_per_bucket=max_files_per_bucket,
            rebuild_from=rebuild_from,
            reconcile_with=reconcile_with,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
            _lease_token=token,
        )
    finally:
        release_maintenance_lease(spark, path, token)


def _maintain_bm25_index_locked(
    spark,
    path: str,
    *,
    max_files_per_bucket: float = 4.0,
    rebuild_from: "DataFrame | None" = None,
    reconcile_with: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: "int | None" = None,
    _lease_token: "str | None" = None,
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

    ``rebuild_from``: the converge-to-corpus form (the IVF side's
    ``reconcile_with`` analog, simpler here because there is no trained
    state to preserve) — pass the live corpus (``id_col``,
    ``text_col``) and the index rebuilds from it wholesale through the
    same staged swap: deleted documents drop, rewritten text
    re-postings, df/stats recompute exactly. BM25's rebuild is one
    tokenize pass (no quantizer training), so corpus-driven rebuilds
    ARE the reconcile path; ``sync_bm25_from_published`` keeps handling
    the cheap add half between rebuilds. Layout params carry over from
    the live meta, EXCEPT ``n_buckets=`` which may override: the
    bucket count freezes at save, so a corpus that grows 100× would
    otherwise serve from 100×-fat buckets — re-bucketing rides the
    rebuild (the IVF side's retrain analog; size buckets so a bucket's
    postings stay read-able in one replica fetch, e.g. corpus tokens /
    target-bucket-bytes). Returns ``rebuilt: True`` and skips the
    compaction check (the rebuild is already one-file-per-bucket).

    ``reconcile_with``: the UPDATE/DELETE-aware incremental form (the
    sparse twin of ``ann.maintain_ivf_index(reconcile_with=)``, closing
    r9's top next-round item) — pass the live corpus (``id_col``,
    ``text_col``). Stored per-doc content fingerprints (``docs/``,
    ``h = xxhash64(text)``) diff against the corpus in two narrow
    passes: documents GONE from the corpus and documents whose text
    CHANGED. If any exist (or tombstones are pending), ONE staged
    rebuild replaces them: surviving postings are REUSED as-is (read,
    not re-tokenized), only the changed documents re-tokenize, and
    df/stats/docs recompute exactly from the merged result — cost is
    O(corpus bytes + changed-docs tokenize), never a corpus-wide
    re-tokenize like ``rebuild_from``. Unchanged corpora no-op
    (convergence: a second call does nothing). Additions remain
    ``sync_bm25_from_published``'s job, as on the dense side. Pending
    tombstones fold into the same rebuild and WIN over corpus
    presence (a tombstoned id still in the corpus stays out — the
    documented delete-then-re-add contract). Requires a layout with
    the ``docs/`` fingerprint table (any save/append since r10);
    pre-r10 layouts must converge via ``rebuild_from`` once, which
    stamps the fingerprints.

    **Merge-on-read tombstones** (``delete_bm25_ids``) force a
    compaction regardless of file counts: the rewrite physically drops
    the deleted postings, recomputes df/stats EXACTLY from the
    survivors (ending the documented soft-delete stale-idf interim),
    and clears the sidecar.

    Returns ``{"compacted", "files_per_bucket", "recovered",
    "rebuilt", "reconciled", "updated", "tombstones_compacted"}``."""
    import pandas as _pd

    from prefixtree_spark._generation import (
        clear_swapping as _clear_swapping,
        mark_swapping as _mark_swapping,
        refresh_maintenance_lease as _refresh_lease,
    )
    from prefixtree_spark.operators.ann import _bump_ivf_generation
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    # meta moves with the swap when staged (a re-bucketing rebuild
    # changes n_buckets — stale meta against new-bucketed tables would
    # hash probes to the wrong buckets). Completeness is an EXPLICIT
    # `_complete` marker written after a stage's last table, not the
    # presence of any particular table: the compaction and rebuild
    # paths write their tables in different orders (save_bm25_index
    # ends with meta, compaction with stats), and inferring
    # completeness from one table's presence recovered a re-bucketing
    # rebuild that crashed between stats and meta into a layout whose
    # live meta disagreed with its physical bucketing (r9 review).
    _SWAP_ORDER = ("postings", "dfreq", "docs", "meta", "stats")
    staged_root = f"{path}/_compact"

    def _mark_complete() -> None:
        out = fs.create(P(f"{staged_root}/_complete"), True)
        try:
            out.write(bytearray(b"1"))
        finally:
            out.close()

    def _fence() -> None:
        # heartbeat + steal fence (r12 advice #2): refresh the lease
        # TTL at phase boundaries, and abort BEFORE any live-layout
        # mutation if the lease was stolen mid-run
        if _lease_token is not None:
            _refresh_lease(spark, path, _lease_token)

    def _swap_in() -> None:
        _fence()
        # the _swapping intent marker opens here and is cleared by
        # _finish_swap AFTER the generation bump (r10 review: clearing
        # at rename-end with the bump still pending let a probe that
        # overlapped the renames pass both probe_consistent checks —
        # no marker, unmoved generation — and return a mixed read;
        # with bump-before-clear, any read overlapping the window sees
        # the marker or the new generation, never neither)
        _mark_swapping(spark, path)
        for sub in _SWAP_ORDER:
            src = P(f"{staged_root}/{sub}")
            if fs.exists(src):
                dst = P(f"{path}/{sub}")
                if fs.exists(dst):
                    fs.delete(dst, True)
                if not fs.rename(src, dst):
                    raise IOError(f"rename {src} -> {dst} failed")
        fs.delete(P(staged_root), True)

    def _finish_swap() -> None:
        _bump_ivf_generation(spark, path)
        _clear_swapping(spark, path)

    # RECOVERY FIRST, marker cleanup AFTER (r11 review, the IVF twin's
    # finding applied here too: clearing a crashed writer's marker
    # BEFORE the recovery renames opened a window in which a probe saw
    # marker-down + unmoved generation over a half-renamed layout — a
    # silent mixed read). _swap_in re-raises the marker for its own
    # rename window and _finish_swap bumps-then-clears; a marker still
    # up after the block is stray over a CONSISTENT layout (crash
    # after the renames finished, before the writer's clear) and is
    # garbage-collected then.
    recovered = False
    if fs.exists(P(staged_root)):
        if fs.exists(P(f"{staged_root}/_complete")):
            _swap_in()  # complete stage from a crashed swap: finish it
            recovered = True
            _finish_swap()
        else:
            fs.delete(P(staged_root), True)  # mid-write garbage
    _clear_swapping(spark, path)

    def _clear_tombstones() -> None:
        fs.delete(P(f"{path}/_tombstones"), True)

    def _stage_drained() -> None:
        # index drained (corpus emptied / every doc stale): a zero-row
        # partitionBy write creates NO files — an unreadable directory
        # for every later probe (the ann._drain lesson). Truncate the
        # data tables with ONE schema-bearing empty file each, placed
        # INSIDE a bucket=0 partition dir for the bucketed tables so
        # partition discovery keeps working and later partitionBy
        # appends don't mix flat/partitioned structures. meta stays —
        # the layout's params outlive its rows.
        posts0 = spark.read.parquet(f"{path}/postings").drop("bucket").limit(0)
        posts0.coalesce(1).write.mode("overwrite").parquet(
            f"{staged_root}/postings/bucket=0"
        )
        (
            spark.read.parquet(f"{path}/dfreq").drop("bucket").limit(0)
            .coalesce(1).write.mode("overwrite")
            .parquet(f"{staged_root}/dfreq/bucket=0")
        )
        if fs.exists(P(f"{path}/docs")):  # pre-r10 layouts lack it
            (
                spark.read.parquet(f"{path}/docs").limit(0)
                .coalesce(1).write.mode("overwrite")
                .parquet(f"{staged_root}/docs")
            )
        spark.createDataFrame(
            _pd.DataFrame(
                {"n_docs": [0], "total_len": [0],
                 "txn": _pd.array([None], dtype="object")}
            ),
            schema="n_docs long, total_len long, txn string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{staged_root}/stats")
        _mark_complete()
        _swap_in()
        _clear_tombstones()
        _finish_swap()

    ts = _load_bm25_tombstones(spark, path)
    n_ts0 = len(ts)

    if rebuild_from is not None and reconcile_with is not None:
        raise ValueError(
            "maintain_bm25_index: pass rebuild_from OR reconcile_with, "
            "not both"
        )
    if rebuild_from is not None:
        # corpus-driven rebuild (docstring): one tokenize pass into the
        # staged root with the LIVE layout's params, then the explicit
        # _complete marker and the same recoverable swap.
        # Pending tombstones clear with the swap — the corpus is the
        # source of truth here, so an id the corpus still carries
        # comes BACK (a corpus-level delete is the caller's job before
        # a rebuild; delete_bm25_ids is the index-level fast path).
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        if (
            rebuild_from.where(F.col(id_col).isNotNull())
            .limit(1).count() == 0
        ):
            # empty corpus: save_bm25_index would brick the layout
            # (zero-row partitionBy writes no files) — drain instead
            # (r10 review)
            _stage_drained()
        else:
            _fence()  # heartbeat before the long staged save
            save_bm25_index(
                rebuild_from, id_col, text_col, staged_root,
                n_buckets=int(n_buckets or meta.n_buckets),
                k1=float(meta.k1), b=float(meta.b), idf=str(meta.idf),
            )
            _mark_complete()
            _swap_in()
            _clear_tombstones()
            _finish_swap()
        return {
            "compacted": False,
            "files_per_bucket": 1.0,
            "recovered": recovered,
            "rebuilt": True,
            "reconciled": 0,
            "updated": 0,
            "tombstones_compacted": n_ts0,
        }

    if reconcile_with is not None:
        if not fs.exists(P(f"{path}/docs")):
            raise ValueError(
                "maintain_bm25_index: reconcile_with needs the docs/ "
                "fingerprint table, absent on layouts saved before it "
                "existed — run maintain_bm25_index(rebuild_from=corpus) "
                "once to converge and stamp fingerprints"
            )
        corp = reconcile_with.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_rtext")
        ).where(F.col("doc_id").isNotNull())
        corp_h = _docs_fingerprints(corp, "doc_id", "_rtext")
        stored = spark.read.parquet(f"{path}/docs").select("doc_id", "h")
        # two narrow diff passes — no postings touched yet
        deleted_df = (
            stored.select("doc_id")
            .join(corp_h.select("doc_id"), "doc_id", "left_anti")
        )
        changed_df = (
            stored.withColumnRenamed("h", "_sh")
            .join(corp_h, "doc_id")
            .where(F.col("_sh") != F.col("h"))
            .select("doc_id")
        )
        n_deleted, n_changed = deleted_df.count(), changed_df.count()
        if n_deleted or n_changed or ts:
            meta = spark.read.parquet(f"{path}/meta").collect()[0]
            nb = int(meta.n_buckets)
            posts = spark.read.parquet(f"{path}/postings")
            docs_tbl = spark.read.parquet(f"{path}/docs").select("doc_id", "h")
            # stale = deleted ∪ changed ∪ pending tombstones; tombstones
            # WIN over corpus presence (a tombstoned id the corpus still
            # carries stays out until re-added through the normal path).
            # Small stale sets go as literal NOT-IN inside the scans
            # (id-stats file pruning); past the measured cap the ids stay
            # distributed and anti-join instead — the same crossover as
            # the append presence guard.
            if n_deleted + n_changed + len(ts) <= _BM25_GUARD_STATIC_MAX:
                changed_set = frozenset(r[0] for r in changed_df.collect())
                stale = (
                    frozenset(r[0] for r in deleted_df.collect())
                    | changed_set
                    | ts
                )
                surv_posts = posts.where(~F.col("doc_id").isin(list(stale)))
                docs_surv = docs_tbl.where(~F.col("doc_id").isin(list(stale)))
                changed_live = [i for i in changed_set if i not in ts]
                changed_src = (
                    corp.where(F.col("doc_id").isin(changed_live))
                    if changed_live else None
                )
            else:
                import pandas as _tspd

                ts_df = spark.createDataFrame(
                    _tspd.DataFrame({"doc_id": list(ts)}),
                    schema=docs_tbl.select("doc_id").schema,
                ) if ts else deleted_df.limit(0)
                stale_df = (
                    deleted_df.unionByName(changed_df)
                    .unionByName(ts_df).distinct()
                )
                surv_posts = posts.join(stale_df, "doc_id", "left_anti")
                docs_surv = docs_tbl.join(stale_df, "doc_id", "left_anti")
                changed_src = corp.join(
                    changed_df.join(ts_df, "doc_id", "left_anti"),
                    "doc_id", "left_semi",
                )
            new_posts = surv_posts
            if changed_src is not None:
                new_posts = surv_posts.unionByName(
                    _tokenize_postings(
                        changed_src, "doc_id", "_rtext"
                    ).withColumn("bucket", _term_bucket_col(F.col("term"), nb))
                )
            new_posts = new_posts.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                # surviving docs may ALL be empty-text (postings zero
                # but n_docs > 0): partitionBy would write file-less
                # dirs — same hazard class as the full drain below,
                # guarded per table (r10 review)
                _np_empty = new_posts.limit(1).count() == 0
                if _np_empty:
                    new_posts.drop("bucket").limit(0).coalesce(1)                         .write.mode("overwrite").parquet(
                            f"{staged_root}/postings/bucket=0"
                        )
                else:
                    (
                        new_posts.repartition(nb, "bucket")
                        .sortWithinPartitions("bucket", "term")
                        .write.mode("overwrite")
                        .partitionBy("bucket")
                        .parquet(f"{staged_root}/postings")
                    )
                _dfq = (
                    new_posts.groupBy("bucket", "term")
                    .agg(F.count(F.lit(1)).cast("long").alias("df"))
                    .withColumn("txn", F.lit(None).cast("string"))
                )
                if _np_empty:
                    _dfq.drop("bucket").limit(0).coalesce(1)                         .write.mode("overwrite").parquet(
                            f"{staged_root}/dfreq/bucket=0"
                        )
                else:
                    (
                        _dfq
                        .repartition(nb, "bucket")
                        .sortWithinPartitions("bucket", "term")
                        .write.mode("overwrite")
                        .partitionBy("bucket")
                        .parquet(f"{staged_root}/dfreq")
                    )
                new_docs = docs_surv
                if changed_src is not None:
                    new_docs = new_docs.unionByName(
                        _docs_fingerprints(changed_src, "doc_id", "_rtext")
                    )
                new_docs = new_docs.withColumn(
                    "txn", F.lit(None).cast("string")
                ).persist(StorageLevel.MEMORY_AND_DISK)
                # docs/ is the authoritative doc list, so n_docs counts
                # empty documents exactly — no postings-presence drift
                n_docs = new_docs.count()
                if n_docs == 0:
                    # every document stale (corpus emptied, or an
                    # empty reconcile frame marked all docs deleted):
                    # the zero-row partitionBy writes above produced
                    # FILE-LESS staged tables that would brick the
                    # layout on swap (r10 review) — discard the stage
                    # and drain instead
                    new_docs.unpersist()
                    new_posts.unpersist()
                    fs.delete(P(staged_root), True)
                    _stage_drained()
                    return {
                        "compacted": True,
                        "files_per_bucket": 1.0,
                        "recovered": recovered,
                        "rebuilt": False,
                        "reconciled": n_deleted + n_changed,
                        "updated": n_changed,
                        "tombstones_compacted": n_ts0,
                    }
                new_docs.write.mode("overwrite").parquet(f"{staged_root}/docs")
                new_docs.unpersist()
                total_len = new_posts.agg(
                    F.coalesce(F.sum("tf"), F.lit(0)).cast("long")
                ).collect()[0][0]
                spark.createDataFrame(
                    _pd.DataFrame(
                        {"n_docs": [int(n_docs)],
                         "total_len": [int(total_len)],
                         "txn": _pd.array([None], dtype="object")}
                    ),
                    schema="n_docs long, total_len long, txn string",
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{staged_root}/stats"
                )
            finally:
                new_posts.unpersist()
            _mark_complete()
            _swap_in()
            _clear_tombstones()
            _finish_swap()
            return {
                "compacted": True,
                "files_per_bucket": 1.0,
                "recovered": recovered,
                "rebuilt": False,
                "reconciled": n_deleted + n_changed,
                "updated": n_changed,
                "tombstones_compacted": n_ts0,
            }

        # converged (nothing deleted/changed, no tombstones): no swap,
        # no generation bump — but FALL THROUGH to the fragmentation
        # check below (r10 review: returning here meant
        # maintain_ingest(bm25_reconcile=True) never compacted append
        # fragmentation while corpus content was unchanged — the
        # steady state of a healthy pipeline)

    from prefixtree_spark.operators.ann import _partition_dir_stats

    _pstats = _partition_dir_stats(fs, P, f"{path}/postings", "bucket=")
    files_per_bucket = _pstats["files"] / max(1, _pstats["dirs"])
    compacted = False
    # tombstones force a compaction regardless of file counts: the
    # rewrite is what physically drops the deleted postings and
    # re-exacts df/stats (ending the soft-delete stale-idf interim)
    if files_per_bucket > max_files_per_bucket or ts:
        compacted = True
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        n_buckets = int(meta.n_buckets)
        posts = spark.read.parquet(f"{path}/postings")
        has_docs_tbl = fs.exists(P(f"{path}/docs"))
        if ts:
            from prefixtree_spark.operators.ann import (
                _APPEND_GUARD_STATIC_MAX as _TS_CAP,
                _without_ids,
            )

            ts_frame = (
                _bm25_tombstones_frame(spark, path)
                if len(ts) > _TS_CAP else None
            )
            # n_docs correction BEFORE filtering. With the docs/
            # fingerprint table (r10+) the count comes from it — the
            # authoritative doc list — so tombstoned EMPTY documents
            # (no postings rows) delete exactly too. Pre-r10 layouts
            # fall back to postings presence: their tombstoned empty
            # docs stay in n_docs until a corpus rebuild (idf-only,
            # bounded drift — they can never match a query).
            src_ids = (
                spark.read.parquet(f"{path}/docs").select("doc_id")
                if has_docs_tbl else posts.select("doc_id")
            )
            if ts_frame is not None:
                # inclusive membership past the literal cap: the
                # semi-join twin of the NOT-IN crossover
                n_deleted = (
                    src_ids.join(F.broadcast(ts_frame), "doc_id",
                                 "left_semi")
                    .distinct().count()
                )
            else:
                n_deleted = (
                    src_ids.where(F.col("doc_id").isin(list(ts)))
                    .distinct().count()
                )
            posts = _without_ids(posts, "doc_id", ts, ts_frame)
        else:
            n_deleted = 0
        posts = posts.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # zero surviving postings (every posting-bearing doc
            # tombstoned) would make the partitionBy writes below
            # file-less and brick the layout on swap — the same r10
            # hazard the reconcile/save paths guard; fall back to one
            # schema-bearing empty file per table, keeping the
            # SURVIVING doc list and stats exact (empty-text docs may
            # outlive their corpus-mates)
            _posts_empty = posts.limit(1).count() == 0
            if _posts_empty:
                posts.drop("bucket").limit(0).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{staged_root}/postings/bucket=0")
            else:
                (
                    posts.repartition(n_buckets, "bucket")
                    .sortWithinPartitions("bucket", "term")
                    .write.mode("overwrite")
                    .partitionBy("bucket")
                    .parquet(f"{staged_root}/postings")
                )
            if ts:
                # df can't roll up from the dfreq table any more (it
                # counts deleted docs): recompute EXACTLY from the
                # surviving postings — one row per (doc, term), so df
                # is a plain per-term row count
                _dfq = (
                    posts.groupBy("bucket", "term")
                    .agg(F.count(F.lit(1)).cast("long").alias("df"))
                    .withColumn("txn", F.lit(None).cast("string"))
                )
                if _posts_empty:
                    _dfq.drop("bucket").limit(0).coalesce(1).write.mode(
                        "overwrite"
                    ).parquet(f"{staged_root}/dfreq/bucket=0")
                else:
                    (
                        _dfq
                        .repartition(n_buckets, "bucket")
                        .sortWithinPartitions("bucket", "term")
                        .write.mode("overwrite")
                        .partitionBy("bucket")
                        .parquet(f"{staged_root}/dfreq")
                    )
                total_len = posts.agg(
                    F.coalesce(F.sum("tf"), F.lit(0)).cast("long")
                ).collect()[0][0]
                n_docs = (
                    spark.read.parquet(f"{path}/stats")
                    .agg(F.sum("n_docs").cast("long"))
                    .collect()[0][0]
                ) - n_deleted
            else:
                _dfq = (
                    spark.read.parquet(f"{path}/dfreq")
                    .groupBy("bucket", "term")
                    .agg(F.sum("df").cast("long").alias("df"))
                    .withColumn("txn", F.lit(None).cast("string"))
                )
                if _posts_empty:
                    _dfq.drop("bucket").limit(0).coalesce(1).write.mode(
                        "overwrite"
                    ).parquet(f"{staged_root}/dfreq/bucket=0")
                else:
                    (
                        _dfq
                        .repartition(n_buckets, "bucket")
                        .sortWithinPartitions("bucket", "term")
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
                n_docs, total_len = int(srow.n_docs), int(srow.total_len)
            spark.createDataFrame(
                _pd.DataFrame(
                    {"n_docs": [int(n_docs)],
                     "total_len": [int(total_len)],
                     "txn": _pd.array([None], dtype="object")}
                ),
                schema="n_docs long, total_len long, txn string",
            ).coalesce(1).write.mode("overwrite").parquet(f"{staged_root}/stats")
            if has_docs_tbl:
                # roll the fingerprint table up too: drop tombstoned
                # docs' rows, clear txn tags, coalesce append files
                docs_tbl = spark.read.parquet(f"{path}/docs").select(
                    "doc_id", "h"
                )
                if ts:
                    # _without_ids already in scope: the same truthy-ts
                    # guard imported it above
                    docs_tbl = _without_ids(docs_tbl, "doc_id", ts, ts_frame)
                _docs_out = docs_tbl.withColumn(
                    "txn", F.lit(None).cast("string")
                )
                if _docs_out.limit(1).count() == 0:
                    # zero-row non-coalesced write makes a file-less
                    # dir; one schema-bearing file keeps it readable
                    _docs_out = _docs_out.coalesce(1)
                _docs_out.write.mode("overwrite").parquet(
                    f"{staged_root}/docs"
                )
        finally:
            posts.unpersist()
        _mark_complete()
        _swap_in()
        _clear_tombstones()
        _finish_swap()
    return {
        "compacted": compacted,
        "files_per_bucket": round(files_per_bucket, 2),
        "recovered": recovered,
        "rebuilt": False,
        "reconciled": 0,
        "updated": 0,
        "tombstones_compacted": n_ts0 if compacted else 0,
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
        # NULL array elements survive explode; they can never match a
        # posting (and sorted()/term_bucket() on None throws), so drop
        # them here — matching bm25_rank, where they harmlessly fail
        # the join
        .where(F.col("term").isNotNull())
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
    ts = _load_bm25_tombstones(spark, path)
    if ts:
        # merge-on-read deletes (delete_bm25_ids), soft-delete
        # semantics: tombstoned docs drop out of RESULTS here, while
        # df/stats above keep counting them until compaction — the
        # Lucene contract, documented on delete_bm25_ids. Literal
        # NOT-IN up to the measured cap, broadcast anti-join past it
        # (ann._without_ids — the plan-size crossover, r9 verdict #2)
        from prefixtree_spark.operators.ann import (
            _APPEND_GUARD_STATIC_MAX as _TS_CAP,
            _without_ids,
        )

        posts = _without_ids(
            posts, "doc_id", ts,
            # sidecar frame only built past the literal cap — the hot
            # probe path must not pay a parquet listing it won't use
            # (r10 review)
            _bm25_tombstones_frame(spark, path)
            if len(ts) > _TS_CAP else None,
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


def sync_bm25_from_published(
    spark,
    root: str,
    index_path: str,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 32,
    k1: float = 1.25,
    b: float = 0.75,
    idf: str = "log",
) -> int:
    """Catch a persisted BM25 index up to a ``publish_index`` corpus —
    the sparse twin of ``ann.sync_ivf_from_published``, same contract:
    the corpus commit is the single source of truth, the index is a
    follower. Reads the corpus ``_manifest`` version, compares against
    the index's ``_synced`` watermark, and appends the delta (new
    append-mode segments only; any replace-mode entry in range falls
    back to the whole live snapshot — safe here because
    ``append_bm25_index(txn=)`` presence-filters candidates, so
    overlapping snapshots append nothing twice and df/stats count only
    the genuinely-new documents). First call bootstraps the layout
    with the given parameters; later calls ignore them (the saved meta
    governs). Returns documents appended (or the bootstrap count).

    APPEND-ONLY: documents DELETED from the corpus keep ranking, and
    documents whose TEXT was rewritten in place keep their old
    postings (presence guards are doc_id-only) — run
    ``maintain_bm25_index(rebuild_from=read_published(...))`` to
    converge deletes and updates; this sync closes the add half.
    Single-writer, crash-replay safe via the txn machinery."""
    import hashlib

    from prefixtree_spark.operators.ann import (
        _read_sync_watermark,
        _write_sync_watermark,
    )
    from prefixtree_spark.sources.io import (
        _fs,
        _manifest_entries,
        _parse_entry,
        _read_small_file,
        published_version,
        read_published,
    )

    live = published_version(spark, root)
    if live == 0:
        return 0
    w = _read_sync_watermark(spark, index_path)
    if w >= live:
        return 0
    fs, jvm = _fs(spark, index_path)
    has_index = fs.exists(jvm.org.apache.hadoop.fs.Path(f"{index_path}/meta"))
    if not has_index:
        corpus = read_published(spark, root)
        if corpus.where(F.col(id_col).isNotNull()).limit(1).count() == 0:
            # nothing indexable yet (empty live snapshot, or only
            # NULL-id rows): the follower no-ops rather than crashing
            # on save_bm25_index's empty-corpus raise (r10 review);
            # the watermark advances so repeated syncs don't re-read
            # the snapshot, and a later version with data re-enters
            # this bootstrap (has_index is still False)
            _write_sync_watermark(spark, index_path, live)
            return 0
        save_bm25_index(
            corpus, id_col, text_col, index_path,
            n_buckets=n_buckets, k1=k1, b=b, idf=idf,
        )
        _write_sync_watermark(spark, index_path, live)
        return int(
            spark.read.parquet(f"{index_path}/stats")
            .agg(F.sum("n_docs")).collect()[0][0]
        )
    new_entries = [
        (n, mpath)
        for n, mpath in _manifest_entries(spark, root)
        if w < n <= live
    ]
    seg_dirs: list[str] = []
    all_appends = True
    for n, mpath in new_entries:
        vdirs, fmt, mode = _parse_entry(_read_small_file(spark, mpath))
        if mode != "append" or fmt != "parquet":
            all_appends = False
            break
        seg_dirs.extend(vdirs)
    if all_appends and seg_dirs:
        parts = [spark.read.parquet(f"{root}/{d}") for d in seg_dirs]
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p, allowMissingColumns=True)
    else:
        cand = read_published(spark, root)
    ts = _load_bm25_tombstones(spark, index_path)
    if ts:
        # explicit index-level deletes win over corpus presence until
        # maintenance compacts: append rejects tombstoned ids outright
        # (resurrection hazard), so the sync must not hand them back
        from prefixtree_spark.operators.ann import (
            _APPEND_GUARD_STATIC_MAX as _TS_CAP,
            _without_ids,
        )

        cand = _without_ids(
            cand, id_col, ts,
            _bm25_tombstones_frame(spark, index_path)
            if len(ts) > _TS_CAP else None,
        )
    tag = hashlib.sha256(root.encode()).hexdigest()[:12]
    appended = append_bm25_index(
        spark, index_path, cand, id_col, text_col, txn=f"sync.{tag}.v{live}"
    )
    _write_sync_watermark(spark, index_path, live)
    return appended


def _load_bm25_tombstones(spark, path: str) -> frozenset:
    """doc_ids deleted merge-on-read (``delete_bm25_ids``) and not yet
    compacted. Missing/empty sidecar answers the empty set."""
    try:
        return frozenset(
            r[0]
            for r in spark.read.parquet(f"{path}/_tombstones")
            .select("doc_id").distinct().collect()
        )
    except Exception:
        return frozenset()


def _bm25_tombstones_frame(spark, path: str) -> "DataFrame | None":
    """The sidecar as a lazy distributed frame — the anti-join side of
    the probe filter's plan-size crossover (``ann._without_ids``)."""
    try:
        return (
            spark.read.parquet(f"{path}/_tombstones")
            .select("doc_id").distinct()
        )
    except Exception:
        return None


def delete_bm25_ids(spark, path: str, ids) -> int:
    """Merge-on-read deletion for a persisted BM25 index — the sparse
    twin of ``ann.delete_ivf_ids``, with Lucene's soft-delete
    semantics: tombstoned documents stop appearing in results
    IMMEDIATELY (every probe — cluster and ``LocalSparseIndex`` —
    filters them), while df/corpus statistics keep counting them until
    the next ``maintain_bm25_index`` compaction/rebuild recomputes
    exactly — surviving ranks are computed with slightly stale idf in
    the interim, exactly as a Lucene index between soft-delete and
    segment merge. Cost: one tiny sidecar append now, a doc_id filter
    per probe (bounded by tombstone count), physical reclaim at
    maintenance cadence.

    ``ids``: a one-column DataFrame or an iterable; NULLs dropped.
    Returns the number of NEW tombstones. Re-appending a tombstoned
    doc_id is rejected by ``append_bm25_index`` until compaction — the
    old postings are still physical, so clearing the tombstone would
    resurrect the stale document."""
    import pandas as _pd

    from prefixtree_spark.operators.ann import _bump_ivf_generation

    if isinstance(ids, DataFrame):
        id_list = [r[0] for r in ids.distinct().collect()]
    else:
        id_list = list(dict.fromkeys(ids))
    id_list = [i for i in id_list if i is not None]
    have = _load_bm25_tombstones(spark, path)
    id_list = [i for i in id_list if i not in have]
    if not id_list:
        return 0
    dt = (
        spark.read.parquet(f"{path}/postings")
        .schema["doc_id"].dataType.simpleString()
    )
    spark.createDataFrame(
        _pd.DataFrame({"doc_id": id_list}), schema=f"doc_id {dt}"
    ).coalesce(1).write.mode("append").parquet(f"{path}/_tombstones")
    _bump_ivf_generation(spark, path)
    return len(id_list)


def describe_bm25_index(spark, path: str) -> dict:
    """One-call operator's health view of a persisted BM25 layout —
    metadata only (directory listings, parquet footers, tiny
    sidecars), nothing corpus-sized is scanned. The numbers feed the
    same decisions ``maintain_bm25_index`` automates: files-per-bucket
    vs the compaction threshold, pending merge-on-read debt
    (tombstones, dfreq/stats increment rows), bucket byte skew (the
    re-bucketing signal), plus the serving generation, sync watermark
    and whether a swap is in flight."""
    from prefixtree_spark._generation import (
        is_swapping,
        read_generation_cluster,
    )
    from prefixtree_spark.operators.ann import _read_sync_watermark
    from prefixtree_spark.sources.io import _fs

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path

    def _bucket_stats(sub: str) -> dict:
        from prefixtree_spark.operators.ann import _partition_dir_stats

        st = _partition_dir_stats(fs, P, f"{path}/{sub}", "bucket=")
        return {"buckets": st["dirs"], "files": st["files"],
                "bytes": st["bytes"], "max_bucket_bytes": st["max_dir_bytes"]}

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    posts = _bucket_stats("postings")
    dfreq = _bucket_stats("dfreq")
    srow = (
        spark.read.parquet(f"{path}/stats")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_len").cast("long").alias("total_len"),
        )
        .collect()[0]
    )
    out = {
        "n_buckets": int(meta.n_buckets),
        "k1": float(meta.k1),
        "b": float(meta.b),
        "idf": str(meta.idf),
        "n_docs": int(srow.n_docs or 0),
        "total_len": int(srow.total_len or 0),
        "postings": posts,
        "dfreq": dfreq,
        "files_per_bucket": round(
            posts["files"] / max(1, posts["buckets"]), 2
        ),
        # merge-on-read debt the next maintenance pass retires
        "stats_increments": int(srow.rows) - 1,
        "tombstones": len(_load_bm25_tombstones(spark, path)),
        "has_fingerprints": bool(fs.exists(P(f"{path}/docs"))),
        "generation": read_generation_cluster(spark, path),
        "synced_version": _read_sync_watermark(spark, path),
        "swap_in_progress": is_swapping(spark, path),
    }
    return out
