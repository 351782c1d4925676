"""Streaming corpus ingest with near-dup rejection — the end-to-end
composition an always-on training-data pipeline runs at the crawl
boundary, built from this engine's oracled primitives:

  per micro-batch:
    1. exact dedup WITHIN the batch (keep the minimum id per exact
       text — catches short docs below the shingle length);
    2. near-dup dedup WITHIN the batch (MinHash-LSH pairs → connected
       components → keep each cluster's min id; ``dedup.dedup_corpus``);
    3. near-dup rejection AGAINST the published corpus
       (``dedup.incremental_lsh_pairs`` — bipartite, |batch| × bands
       work, never corpus²);
    4. atomic APPEND of the survivors to the published table
       (``sources.io.append_published`` — an add-segment manifest
       commit, O(|batch|) per batch; readers always see a complete
       snapshot).

Semantics are GREEDY FIRST-ARRIVAL: a doc survives iff it is not a
near-dup of any doc already accepted (earlier batch, or an in-batch
cluster minimum). This differs from global batch dedup
(``dedup.dedup_corpus`` over the union) exactly where transitivity
differs: for A < B < C with A~B, B~C, A≁C, the global pass keeps only
A (one component) while greedy ingest keeps A and C (B was rejected
against A; C matches nothing accepted). Greedy is what an online
ingest can compute without revisiting history — and it is
deterministic given the batch sequence, which is what the batch twin
test pins.

Scale shape: the corpus side's evidence is PERSISTED — each batch
appends its survivors' (doc, band, bucket) rows to a side table
(``<root>_bands``, same atomic add-segment commits), so batch N+1's
candidate join reads stored buckets instead of re-shingling and
re-hashing the whole corpus. Exact verification then re-shingles only
the CANDIDATE corpus docs (semi-join on candidate ids — at 100 TB,
thousands of docs, not the corpus). The exact-text guard is stored
evidence too: survivors carry a ``_pt_sha`` column (sha-256 of the
text — collision-resistant, so no crafted pair of distinct documents
can make one be rejected as an "exact duplicate" of the other, which
md5's broken collision resistance allowed) INSIDE the corpus
segments — atomic with the corpus commit by construction, no
cross-table crash ordering — so the guard scans a fixed-width hash
column plus the id, never the text column. Legacy segments published
before this column (including old ``_pt_md5``-era segments, whose
md5 evidence is deliberately NOT trusted) exist as NULL rows after
the schema-drift union; the guard computes their hashes from text on
the fly, and parquet null-count stats prune that branch to zero
files on a pure-ingest corpus. On corpora past a size threshold the near-dup
verify's corpus re-shingle pushes its bounded candidate-id set into
the scan as a literal IN: the filter reaches the scan (no join, so no
corpus shuffle), and parquet's id-range stats additionally prune
files when candidates cluster — measured 1.0-2.2 s vs 7.8-8.5 s for
the semi-join at 600k docs, spread or clustered. The remaining
per-batch corpus-side cost is one bucket-table scan plus one narrow
hash-column scan. Band parameters
(shingle n, num_perm, bands, seed) are pinned in ``<root>_bands/_params``
— a batch with different parameters fails fast instead of silently
joining incompatible buckets. ``compact_published`` folds both
tables' append chains out of band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prefixtree_spark.operators import dedup
from prefixtree_spark.operators.dedup import (
    _band_buckets,
    _grouped_shingle_hashes,
    _signatures_from_grouped,
    minhash_signatures,
    token_shingles,
)
from prefixtree_spark.sources.io import (
    _fs,
    _read_small_file,
    append_published,
    publish_version,
    published_version,
    read_published,
)


# Candidate-verify static-pruning cap: collect at most this many
# candidate corpus ids into a literal IN filter (driver cost ~8 bytes
# each; the same order as the query-chunk collects the fuzzy engine
# documents). Beyond it, the drift-tolerant semi-join runs instead.
_CAND_STATIC_MAX = 100_000

# Below this live-corpus size the verify keeps the plain semi-join:
# the id-collect is a scheduling barrier worth ~1 s that only pays for
# itself once the avoided work is real. Measured ends (BENCH_EXTRAS
# ingest_scale_*): at a 1 MB corpus the semi-join batch runs 9.2 s warm
# vs 10.1-11.0 s with the collect; at a 33 MB / 600k-doc corpus the
# pruned fetch wins 1.0-2.2 s vs 7.8-8.5 s (the IN filter spares the
# corpus both the text decode and the semi-join's shuffle). 32 MB sits
# just under the measured-win side. Tests lower it to force the static
# path.
_CAND_STATIC_MIN_CORPUS_BYTES = 32 << 20


def _published_bytes(spark: SparkSession, root: str) -> int:
    """Total bytes of the live snapshot's segment directories (one
    content-summary call per segment — metadata only, no data read).
    Any failure answers 0: callers treat that as 'small corpus' and
    take the conservative semi-join plan."""
    try:
        from prefixtree_spark.sources.io import published_segments

        fs, jvm = _fs(spark, root)
        total = 0
        for vdir, _fmt in published_segments(spark, root):
            total += fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(f"{root}/{vdir}")
            ).getLength()
        return total
    except Exception:
        return 0


def _bands_root(root: str) -> str:
    return root.rstrip("/") + "_bands"


def _doc_bands(
    df: DataFrame, id_col: str, text_col: str, n: int, num_perm: int, bands: int
) -> DataFrame:
    """(doc, band, bucket) LSH keys for every doc of ``df`` — the rows
    the side table stores. Deterministic in the doc text (seeded
    multiply-shift permutations over xxhash64 base hashes), so buckets
    computed in different batches/sessions are join-compatible."""
    sh = token_shingles(df, id_col, text_col, n)
    return _band_buckets(
        minhash_signatures(sh, num_perm=num_perm), bands, num_perm // bands
    )


def _all_segments_fully_hashed(
    spark: SparkSession, root: str, colname: str
) -> bool:
    """True iff EVERY live segment's parquet files carry ``colname``
    with ZERO nulls — the pure-ingest fast-path test for the
    stored-hash guard. Schema presence alone is NOT enough: compacting
    a mixed chain (legacy segment + ingest appends) writes one segment
    whose schema HAS the column but whose legacy rows are NULL, and a
    fast path keyed on schema would silently drop those rows from the
    guard — admitting exact re-arrivals of legacy short docs. Footer
    reads only (schema + per-row-group null counts via pyarrow), no
    Spark job; segment dirs are immutable, and the check is re-run per
    batch anyway. Any read problem or absent statistic answers False:
    the caller falls back to the drift-tolerant path."""
    try:
        import pyarrow.dataset as pads
        import pyarrow.parquet as papq

        from prefixtree_spark.sources.io import published_segments

        for vdir, fmt in published_segments(spark, root):
            if fmt != "parquet":
                return False
            path = f"{root}/{vdir}"
            if path.startswith("file:"):
                path = path[len("file:"):]
            dset = pads.dataset(path, format="parquet")
            if colname not in dset.schema.names:
                return False
            for f in dset.files:
                md = papq.ParquetFile(f).metadata
                try:
                    ci = md.schema.names.index(colname)
                except ValueError:
                    return False  # file predates the column
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or st.null_count is None or st.null_count > 0:
                        return False
        return True
    except Exception:
        return False


def _pin_band_params(
    spark: SparkSession, broot: str, n: int, num_perm: int, bands: int
) -> None:
    """First writer records (n, num_perm, bands); later batches must
    match — stored buckets hash the parameters in, so a silent change
    would turn the candidate join into noise."""
    import uuid as _uuid

    meta = f"{n},{num_perm},{bands}"
    fs, jvm = _fs(spark, broot)
    p = jvm.org.apache.hadoop.fs.Path(f"{broot}/_params")
    if fs.exists(p) and _read_small_file(spark, f"{broot}/_params") == "":
        # a writer crashed between create and write: an empty params
        # file would brick every future batch with a phantom mismatch.
        # Deleting is safe — whoever recreates it writes via tmp+rename
        # below, so no reader can see a half-written value again.
        fs.delete(p, False)
    if not fs.exists(p):
        # write-then-rename (not create-then-write): the file only
        # appears under its final name with its full content, so a
        # crash leaves a .tmp orphan instead of an empty _params
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{broot}/.tmp-params-{_uuid.uuid4().hex}"
        )
        try:
            out = fs.create(tmp, False)
            try:
                out.write(bytearray(meta.encode("utf-8")))
            finally:
                out.close()
            if not fs.rename(tmp, p):
                fs.delete(tmp, False)  # lost the race: compare below
        except Exception:
            pass  # lost the race entirely: fall through to compare
    existing = _read_small_file(spark, f"{broot}/_params")
    if existing != meta:
        raise ValueError(
            f"ingest at {broot} was built with (n, num_perm, bands) = "
            f"({existing}); this batch passed ({meta}) — stored LSH "
            f"buckets are parameter-specific, re-ingest or match them"
        )


def ingest_batch(
    batch: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    audit: bool = False,
    max_df: int | None = None,
    vec_col: str | None = None,
    ann_index_path: str | None = None,
    ann_opts: dict | None = None,
    bm25_index_path: str | None = None,
    bm25_opts: dict | None = None,
) -> int:
    """Run one ingest step (the batch twin of the streaming sink):
    dedup ``batch`` within itself and against the published corpus at
    ``root``, append the survivors atomically — docs to ``root``, their
    LSH band buckets to ``<root>_bands`` (buckets commit first: a crash
    between the two commits leaves only extra buckets for absent docs,
    which produce candidates with no shingles and therefore no pairs —
    never a corpus doc invisible to future rejection). Returns the
    number of surviving rows appended (0 appends nothing).

    ``audit=True`` additionally appends one row per REJECTED doc to
    ``<root>_audit`` — (id, reason, matched_id) where reason names the
    stage (``exact_batch`` / ``near_batch`` / ``exact_corpus`` /
    ``near_corpus``) and matched_id the surviving doc it collided with
    — the rejection lineage a training-data pipeline keeps so "why is
    this document not in the corpus?" has a queryable answer. Audit
    rows commit LAST: a crash can lose lineage for a committed batch,
    never invent lineage for an uncommitted one.

    ``max_df`` (off by default) is the boilerplate skew cap: (a) the
    within-batch LSH pass drops ubiquitous shingles
    (``dedup.minhash_lsh_pairs``'s own cap), and (b) the batch-vs-
    corpus candidate join drops (band, bucket) keys whose CORPUS
    membership exceeds ``max_df`` — a hot bucket with m corpus docs ×
    p batch docs otherwise emits m·p candidate rows, so a boilerplate-
    heavy batch against a boilerplate corpus goes quadratic. The cap
    is a READ-side filter: stored buckets stay unfiltered (computed
    deterministically from doc text, the cross-batch join-compat
    contract), so capped and uncapped batches interoperate on one
    bands table. Recall trade (same as the batch family's ``max_df``):
    a near-dup whose every band lands in hot buckets can slip through
    LSH — but the exact-text guard still rejects verbatim boilerplate
    copies regardless.

    ``_pt_sha`` is a reserved column name: survivors are appended with
    sha-256(text) under it (the stored exact-text evidence — see the
    module docstring), overwriting any same-named input column (so
    re-ingesting a published corpus recomputes rather than trusts
    it).

    ``vec_col`` + ``ann_index_path`` wire the batch into a vector
    index: after the corpus commit, ``ann.sync_ivf_from_published``
    catches the IVF index at ``ann_index_path`` up to the live corpus
    version — survivors' embeddings become probe-able under the same
    exactly-once discipline as the documents (the sync reads committed
    corpus segments, never this batch directly, so a crash between
    the corpus commit and the index append is healed by the NEXT
    batch's sync instead of losing vectors; replays land nothing —
    txn markers + per-table presence guards, see ``append_ivf_index``).
    ``ann_opts`` forwards first-build layout parameters (``n_cells``,
    ``n_replicas``, ``pq_m``, ...); an existing index ignores them.
    Retrain/compaction run out of band via ``maintain_ingest(...,
    ann_index_path=...)``, policy-gated on the appended fraction.

    ``bm25_index_path`` is the sparse twin: after the corpus commit,
    ``ranking.sync_bm25_from_published`` catches a persisted BM25
    index up to the live corpus under the same follower discipline
    (watermark + txn markers + doc_id presence filters — see
    ``append_bm25_index``), so survivors become lexically retrievable
    alongside their vectors: one ingest call feeds the corpus, the
    vector index, AND the sparse index, exactly once each.
    ``bm25_opts`` forwards first-build layout parameters
    (``n_buckets``, ``k1``, ``b``, ``idf``); compaction runs out of
    band via ``maintain_ingest(..., bm25_index_path=...)``."""
    assert num_perm % bands == 0
    if ann_index_path is not None and vec_col is None:
        # validate BEFORE any write: raising after the corpus commit
        # would make a pure config error look like a partial success
        # (documents published, vectors never synced until someone
        # re-runs with the right arguments)
        raise ValueError("ann_index_path needs vec_col")
    spark = batch.sparkSession
    broot = _bands_root(root)
    _pin_band_params(spark, broot, n, num_perm, bands)
    pins: list[DataFrame] = []
    audits: list[DataFrame] = []

    def _note(df: DataFrame, reason: str, matched) -> None:
        # (id, reason, matched_id) rows for the audit table
        if audit:
            audits.append(
                df.select(
                    F.col(id_col).cast("long").alias("id"),
                    F.lit(reason).alias("reason"),
                    matched.cast("long").alias("matched_id"),
                )
            )

    # 1. exact within-batch: min id per exact text
    keep_exact = batch.groupBy(text_col).agg(F.min(id_col).alias("_keep"))
    with_keep = batch.join(keep_exact, text_col)
    surv = with_keep.where(F.col(id_col) == F.col("_keep")).drop("_keep")
    _note(
        with_keep.where(F.col(id_col) != F.col("_keep")),
        "exact_batch",
        F.col("_keep"),
    )
    # the stored exact-text evidence rides every survivor row from here
    # on (NULL text hashes NULL — joins miss it, matching the historic
    # text-equality join's NULL semantics)
    surv = surv.withColumn("_pt_sha", F.sha2(F.col(text_col), 256))
    # 2. near-dup within-batch: LSH pairs -> components -> min-id keep
    # (dedup.dedup_corpus inlined so the component labels are available
    # for audit attribution). The pair set is eagerly pinned inside
    # minhash_lsh_pairs — an evidence-sharing variant that cached one
    # shingle/bucket lineage across steps 2 and 3 measured SLOWER
    # (batch2 10.7 s -> 16-19 s at sf0.1): the layered caches and the
    # longer lazy lineages cost more than recomputing the cheap
    # tokenization, so each step keeps its own short-lineage evidence.
    from prefixtree_spark.operators.graph import connected_components

    pairs = dedup.minhash_lsh_pairs(
        surv, id_col, text_col, n=n, threshold=threshold,
        num_perm=num_perm, bands=bands, max_df=max_df,
    )
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    labels = connected_components(nodes, edges).persist()
    pins.append(labels)
    victims_cc = labels.where(F.col("node") != F.col("component"))
    _note(
        victims_cc.select(
            F.col("node").alias(id_col), F.col("component").alias("_m")
        ),
        "near_batch",
        F.col("_m"),
    )
    surv = surv.join(
        victims_cc.select(F.col("node").alias(id_col)), id_col, "left_anti"
    )
    # 3. reject duplicates of the already-accepted corpus: exact text
    # first via the STORED ``_pt_sha`` column (catches docs shorter
    # than one shingle, which carry no LSH evidence — and is the guard
    # that makes replayed batches no-ops), then near-dup via the STORED
    # corpus buckets + exact verify over candidate corpus docs only
    bands_of_surv = None
    if published_version(spark, root) > 0:
        corpus = read_published(spark, root)
        if "_pt_sha" in corpus.columns and _all_segments_fully_hashed(
            spark, root, "_pt_sha"
        ):
            # pure-ingest fast path: ONE two-column scan, no dedup
            # shuffle — ingest stores each accepted text exactly once
            # (this very guard), so stored hashes are unique and the
            # min-id-per-hash aggregate would be a pass-through
            cor_hash = corpus.where(F.col("_pt_sha").isNotNull()).select(
                F.col("_pt_sha").alias("_ch"), F.col(id_col).alias("_cm")
            )
        else:
            if "_pt_sha" in corpus.columns:
                # mixed chain: stored rows scan two narrow columns;
                # legacy segments (published before the column) surface
                # as NULLs after the schema-drift union and hash their
                # text on the fly — parquet null-count stats prune that
                # branch's files where the column is fully populated
                cor_hash = corpus.where(F.col("_pt_sha").isNotNull()).select(
                    F.col(id_col).alias("_cid"), F.col("_pt_sha").alias("_ch")
                ).unionByName(
                    corpus.where(F.col("_pt_sha").isNull()).select(
                        F.col(id_col).alias("_cid"),
                        F.sha2(F.col(text_col), 256).alias("_ch"),
                    )
                )
            else:
                # corpus predates the hash column entirely
                cor_hash = corpus.select(
                    F.col(id_col).alias("_cid"),
                    F.sha2(F.col(text_col), 256).alias("_ch"),
                )
            # min id per hash: a legacy corpus may hold duplicate
            # texts; attribute to its first survivor, as the historic
            # text-equality join always did
            cor_hash = (
                cor_hash.where(F.col("_ch").isNotNull())
                .groupBy("_ch")
                .agg(F.min("_cid").alias("_cm"))
            )
        # self-matches (same id, same text) are REPLAYS of an already-
        # committed batch, not rejections: auditing them would answer
        # "why is doc X not in the corpus?" with a rejection row for a
        # doc that IS the corpus survivor. The rejection itself still
        # applies (idempotent replay) — only the lineage row is skipped.
        _note(
            surv.join(
                cor_hash, F.col("_pt_sha") == F.col("_ch")
            ).where(F.col(id_col) != F.col("_cm")),
            "exact_corpus",
            F.col("_cm"),
        )
        surv = surv.join(
            cor_hash, F.col("_pt_sha") == F.col("_ch"), "left_anti"
        )
        if published_version(spark, broot) > 0:
            b_cor = read_published(spark, broot)
        else:
            # corpus predates the bands table: backfill once so every
            # later batch reads stored buckets
            b_cor = _doc_bands(corpus, id_col, text_col, n, num_perm, bands)
            publish_version(b_cor, broot)
            b_cor = read_published(spark, broot)
        # r13 fusion (see dedup._grouped_shingle_hashes): pin the
        # batch's GROUPED fingerprint arrays once; the signature UDF
        # and the hash-set verify below both consume them, so the
        # exploded shingle rows are never cached or re-joined
        g_new = _grouped_shingle_hashes(
            token_shingles(surv, id_col, text_col, n)
        ).cache()
        pins.append(g_new)
        b_new = _band_buckets(
            _signatures_from_grouped(g_new, num_perm=num_perm),
            bands,
            num_perm // bands,
        ).persist()  # reused at step 4 for the survivors' bands
        pins.append(b_new)
        bands_of_surv = b_new
        b_cor_side = b_cor.select(
            F.col("doc").alias("corpus_id"), "band", "bucket"
        )
        if max_df is not None:
            # hot-bucket cap (see docstring): drop (band, bucket) keys
            # whose corpus membership exceeds max_df BEFORE the join —
            # bounds candidates at max_df × batch-bucket-size per key
            hot = (
                b_cor_side.groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") > max_df)
                .select("band", "bucket")
            )
            b_cor_side = b_cor_side.join(hot, ["band", "bucket"], "left_anti")
        candidates = (
            b_new.select(F.col("doc").alias("new_id"), "band", "bucket")
            .join(b_cor_side, ["band", "bucket"])
            .select("new_id", "corpus_id")
            .distinct()
        )
        # exact verify: shingle ONLY the candidate corpus docs. A
        # semi-join decodes the TEXT column of every row and shuffles
        # the corpus side (join keys never reach the parquet scan), so
        # past _CAND_STATIC_MIN_CORPUS_BYTES the bounded candidate-id
        # set is collected and pushed into the scan as a literal IN —
        # the filter runs in the scan stage (no shuffle) and parquet's
        # id-range stats additionally prune files when candidates
        # cluster (measured: 1.0-2.2 s vs 7.8-8.5 s semi-join at 600k
        # docs, spread or clustered). Below the size threshold (or past
        # _CAND_STATIC_MAX ids) the semi-join plan stays: the collect
        # is a scheduling barrier that costs ~1 s against a corpus too
        # small for the avoided work to matter.
        cand_corpus = None
        if _published_bytes(spark, root) >= _CAND_STATIC_MIN_CORPUS_BYTES:
            candidates = candidates.persist()  # collect + inter reuse
            pins.append(candidates)
            cand_rows = (
                candidates.select("corpus_id").distinct()
                .limit(_CAND_STATIC_MAX + 1).collect()
            )
            if len(cand_rows) <= _CAND_STATIC_MAX:
                cand_corpus = corpus.where(
                    F.col(id_col).isin([r[0] for r in cand_rows])
                )
        if cand_corpus is None:
            cand_corpus = corpus.join(
                candidates.select(F.col("corpus_id").alias(id_col)).distinct(),
                id_col,
                "left_semi",
            )
        # bipartite verify over grouped fingerprint arrays (the r13
        # fusion — no exploded candidates×shingles join, sizes read
        # from the array lengths); the corpus side still shingles ONLY
        # the candidate docs selected above
        g_cor = _grouped_shingle_hashes(
            token_shingles(cand_corpus, id_col, text_col, n)
        )
        h1 = g_new.select(F.col("doc").alias("new_id"), F.col("hs").alias("hs1"))
        h2 = g_cor.select(
            F.col("doc").alias("corpus_id"), F.col("hs").alias("hs2")
        )
        sized = (
            candidates.join(h1, "new_id")
            .join(h2, "corpus_id")
            .select(
                "new_id",
                "corpus_id",
                F.size(F.array_intersect("hs1", "hs2")).alias("ic"),
                F.size("hs1").alias("sz1"),
                F.size("hs2").alias("sz2"),
            )
        )
        jac = F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic"))
        hits = (
            sized.where(jac >= threshold)
            .groupBy("new_id")
            .agg(F.min("corpus_id").alias("_cm"))
        )
        _note(
            hits.select(F.col("new_id").alias(id_col), "_cm").where(
                F.col(id_col) != F.col("_cm")  # replay guard, as above
            ),
            "near_corpus",
            F.col("_cm"),
        )
        surv = surv.join(
            hits.select(F.col("new_id").alias(id_col)), id_col, "left_anti"
        )
    # 4. atomic append (materialize once; count from the same pass) —
    # bands first (see docstring for the crash-ordering argument),
    # audit lineage last
    surv = surv.persist()
    pins.append(surv)
    try:
        n_out = surv.count()
        if n_out:
            # survivors' bands: reuse the cached pipeline output from
            # step 3 when it exists (b_new covers a superset of the
            # final survivors — filter by id) instead of re-tokenizing
            # and re-hashing every shingle a second time; the values
            # are identical (same seeded permutations over the same
            # text). The corpus-less first batch still computes fresh.
            if bands_of_surv is not None:
                out_bands = bands_of_surv.join(
                    surv.select(F.col(id_col).alias("doc")), "doc", "left_semi"
                )
            else:
                out_bands = _doc_bands(surv, id_col, text_col, n, num_perm, bands)
            append_published(out_bands, broot)
            append_published(surv, root)
        if audit and audits:
            rejected = audits[0]
            for a in audits[1:]:
                rejected = rejected.unionByName(a)
            rejected = rejected.persist()
            pins.append(rejected)
            if rejected.count():
                append_published(rejected, root.rstrip("/") + "_audit")
        if ann_index_path is not None:
            # AFTER the corpus commit, and unconditionally (even when
            # this batch appended nothing): the sync also heals any
            # earlier batch that committed documents but crashed before
            # its index append. In-sync calls cost one manifest read.
            # (vec_col consistency was validated at the top of the call,
            # before any write.)
            from prefixtree_spark.operators.ann import sync_ivf_from_published

            sync_ivf_from_published(
                spark, root, ann_index_path, id_col, vec_col,
                **(ann_opts or {}),
            )
        if bm25_index_path is not None:
            # same placement and rationale as the ANN sync above:
            # committed-corpus follower, heals earlier crashed batches,
            # no-ops when in sync
            from prefixtree_spark.operators.ranking import (
                sync_bm25_from_published,
            )

            sync_bm25_from_published(
                spark, root, bm25_index_path, id_col, text_col,
                **(bm25_opts or {}),
            )
        return n_out
    finally:
        for p in pins:
            p.unpersist()


def streaming_ingest_corpus(
    stream: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    audit: bool = False,
    max_df: int | None = None,
    vec_col: str | None = None,
    ann_index_path: str | None = None,
    ann_opts: dict | None = None,
    bm25_index_path: str | None = None,
    bm25_opts: dict | None = None,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Attach the ingest sink to a streaming DataFrame: every
    micro-batch flows through ``ingest_batch`` via ``foreachBatch``
    and lands as one atomic append. Returns the started
    ``StreamingQuery`` (callers ``awaitTermination``).

    Exactly-once note: ``foreachBatch`` gives at-least-once batch
    delivery on restart; a replayed batch re-runs the dedup against a
    corpus that already contains its survivors, so every replayed row
    is rejected — by the corpus exact-text guard (which needs no
    shingles, so it also covers docs shorter than one shingle), and
    independently by the bipartite LSH pass (self-jaccard 1.0 ≥ any
    threshold ≤ 1). The sink is idempotent by construction; the
    replay test pins it.

    ``vec_col`` + ``ann_index_path`` additionally keep an IVF vector
    index in sync with the corpus, batch by batch, under the same
    replay discipline (see ``ingest_batch``) — the one exactly-once
    pipeline from crawl boundary to probe-able embeddings.
    ``bm25_index_path`` does the same for the sparse index: one
    streaming sink feeds the corpus, the vector index, AND the BM25
    index, exactly once each."""

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch,
            root,
            id_col,
            text_col,
            threshold=threshold,
            n=n,
            num_perm=num_perm,
            bands=bands,
            audit=audit,
            max_df=max_df,
            vec_col=vec_col,
            ann_index_path=ann_index_path,
            ann_opts=ann_opts,
            bm25_index_path=bm25_index_path,
            bm25_opts=bm25_opts,
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_ingest(
    spark: SparkSession,
    root: str,
    *,
    max_segments: int = 16,
    keep: int = 2,
    target_file_mb: int = 256,
    cluster_ids: str | None = None,
    ann_index_path: str | None = None,
    ann_retrain_frac: float = 0.3,
    ann_max_files_per_cell: float = 4.0,
    ann_reconcile_ids: str | None = None,
    ann_reconcile_with: "tuple[str, str] | None" = None,
    bm25_index_path: str | None = None,
    bm25_max_files_per_bucket: float = 4.0,
    bm25_rebuild: "bool | tuple[str, str]" = False,
    bm25_reconcile: "bool | tuple[str, str]" = False,
    lease_ttl_s: float = 3600.0,
    lease_wait: bool = False,
) -> dict[str, int]:
    """Out-of-band maintenance for an ingest pair (corpus + bands):
    when either table's live chain exceeds ``max_segments``, fold it
    into one directory (``compact_published``), then vacuum both down
    to ``keep`` snapshots. Run from a scheduler, never from the sink —
    compaction is O(corpus) by design and must not gate a micro-batch.
    Returns the new chain lengths. Safe concurrent with the sink: a
    compaction losing the manifest race to an append simply retries on
    the longer chain, and readers resolve complete snapshots
    throughout.

    ``cluster_ids`` (normally the ingest ``id_col``) range-clusters
    the CORPUS rewrite on that column, giving disjoint per-file id
    ranges — then ``ingest_batch``'s pinned literal-IN candidate fetch
    prunes whole files by parquet id stats instead of scanning every
    corpus file. The bands table stays hash-laid-out: its reader is a
    (band, bucket) equi-join, which file stats can't prune.

    ``lease_ttl_s`` passes through to the index writer leases; a
    concurrently-held lease SKIPS that index's maintenance and records
    ``<path>_lease_held: 1`` in the report (vacuum/compaction already
    ran; the next scheduled pass converges) — set ``lease_wait=True``
    to get the raising behavior instead."""
    from prefixtree_spark.sources.io import (
        compact_published,
        published_chain_length,
        vacuum_published,
    )

    from prefixtree_spark.operators.text import vacuum_card_cache

    out = {}
    for r in (root, _bands_root(root)):
        if published_chain_length(spark, r) > max_segments:
            compact_published(
                spark, r, target_file_mb=target_file_mb,
                cluster_by=[cluster_ids] if cluster_ids and r == root else None,
            )
        vacuum_published(spark, r, keep=keep)
        out[r] = published_chain_length(spark, r)
    # the incremental data-card cache rides the corpus's segment churn:
    # clear partials for segments no kept snapshot references (r5 #4)
    out[f"{root}_card_deleted"] = vacuum_card_cache(spark, root)
    if ann_index_path is not None:
        # the vector side of the same pipeline: retrain when the
        # appended fraction passes the threshold (frozen-quantizer
        # drift), compact fragmented cell lists, and — when
        # ``ann_reconcile_ids`` names the corpus id column — drop
        # index rows whose documents were COW-deleted from the corpus
        # (the deletion half of index==corpus; additions are the
        # per-batch sync's job). Policy and evidence live in
        # ann.maintain_ivf_index; this just schedules it with the
        # rest of the ingest maintenance.
        from prefixtree_spark.operators.ann import maintain_ivf_index

        reconcile = None
        if ann_reconcile_ids is not None:
            reconcile = read_published(spark, root).select(
                F.col(ann_reconcile_ids).alias("vec_id")
            )
        rec_with = None
        if ann_reconcile_with is not None:
            # the UPDATE-aware form — (id_col, vec_col) of the corpus:
            # documents whose embeddings were rewritten in place
            # (update_published) get their index vectors replaced, not
            # just deletions dropped (ann.maintain_ivf_index
            # reconcile_with semantics). Payload columns (indexes
            # saved with payload_cols=) are carried by NAME from the
            # corpus — reconcile_with requires the layout's full
            # column set, so an index whose payloads the corpus
            # doesn't carry fails loudly there rather than silently
            # dropping metadata.
            rid, rvec = ann_reconcile_with
            pub = read_published(spark, root)
            pay = [
                c
                for c in spark.read.parquet(f"{ann_index_path}/vectors").columns
                if c not in ("vec_id", "cv") and c in pub.columns
            ]
            rec_with = pub.select(
                F.col(rid).alias("vec_id"), F.col(rvec).alias("cv"), *pay
            ).where(F.col("cv").isNotNull())
        # lease discipline (r12 review #3): a held index lease must
        # not abort the whole maintenance pass after the vacuum half
        # already ran — record the skip in the report and let the next
        # scheduled run converge. lease_ttl_s passes through so
        # pipelines whose maintenance takes minutes are not blocked an
        # hour by a crashed run's stale lease.
        from prefixtree_spark._generation import MaintenanceLeaseHeld

        try:
            rep = maintain_ivf_index(
                spark, ann_index_path,
                retrain_frac=ann_retrain_frac,
                max_files_per_cell=ann_max_files_per_cell,
                reconcile_ids=reconcile,
                reconcile_with=rec_with,
                lease_ttl_s=lease_ttl_s,
            )
        except MaintenanceLeaseHeld:
            if not lease_wait:
                out[f"{ann_index_path}_lease_held"] = 1
                rep = None
            else:
                raise
        if rep is not None:
            out[f"{ann_index_path}_retrained"] = int(rep["retrained"])
            out[f"{ann_index_path}_compacted"] = int(rep["compacted"])
            out[f"{ann_index_path}_reconciled"] = int(rep["reconciled"])
    if bm25_index_path is not None:
        # the sparse side: compact merge-on-read increments when
        # appends fragment the buckets; ``bm25_reconcile=True`` (or an
        # (id_col, text_col) tuple) converges COW deletes/updates
        # INCREMENTALLY — content-fingerprint diff, only changed docs
        # re-tokenize (the dense side's reconcile_with twin, r10);
        # ``bm25_rebuild=True`` remains the wholesale form (one full
        # tokenize pass — the pre-r10 converge path, still the only
        # one for layouts without the docs/ fingerprint table).
        from prefixtree_spark.operators.ranking import maintain_bm25_index

        if bm25_rebuild and bm25_reconcile:
            raise ValueError(
                "maintain_ingest: pass bm25_rebuild OR bm25_reconcile, "
                "not both"
            )
        spec = bm25_reconcile or bm25_rebuild
        rb_id, rb_text = (
            spec if isinstance(spec, tuple) else ("doc_id", "text")
        )
        from prefixtree_spark._generation import MaintenanceLeaseHeld

        try:
            srep = maintain_bm25_index(
                spark, bm25_index_path,
                max_files_per_bucket=bm25_max_files_per_bucket,
                rebuild_from=(
                    read_published(spark, root) if bm25_rebuild else None
                ),
                reconcile_with=(
                    read_published(spark, root) if bm25_reconcile else None
                ),
                id_col=rb_id, text_col=rb_text,
                lease_ttl_s=lease_ttl_s,
            )
        except MaintenanceLeaseHeld:
            if not lease_wait:
                out[f"{bm25_index_path}_lease_held"] = 1
                srep = None
            else:
                raise
        if srep is not None:
            out[f"{bm25_index_path}_compacted"] = int(srep["compacted"])
            out[f"{bm25_index_path}_rebuilt"] = int(srep["rebuilt"])
            out[f"{bm25_index_path}_reconciled"] = int(srep["reconciled"])
    return out


def ingest_sequential(
    batches: list[DataFrame],
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    audit: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Batch twin of the streaming sink: fold the batches through
    ``ingest_batch`` in order and return the published corpus — the
    reference result the stream==batch tests (and the workload oracle)
    compare against."""
    spark = batches[0].sparkSession
    for b in batches:
        ingest_batch(
            b, root, id_col, text_col, threshold=threshold, n=n, audit=audit,
            max_df=max_df,
        )
    return read_published(spark, root)
