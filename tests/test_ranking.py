"""BM25 ranking tests: pure-Python brute force for the textbook ln-idf
path, and oracle-equivalence (DuckDB) for the exact-IEEE ratio-idf
path the correctness gate hashes."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from prefixtree_spark.operators.ranking import bm25_rank

K1, B = 1.25, 0.75


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark shuffle join spark spark aggregate"),
        (1, "join the table with the other table"),
        (2, "spark streaming watermark state"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "shuffle partitions and shuffle spill and shuffle write"),
        (5, "aggregate pushdown into the scan"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def brute_bm25(rows, query_terms, idf_mode, topk=10):
    """Reference implementation, including the operator's
    DECIMAL(28,9)-before-sum semantics (quantize HALF_UP)."""
    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) * 1.0 / n
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for doc, ts in toks.items():
        s = Decimal(0)
        for term in set(query_terms):
            if term not in df or term not in ts:
                continue
            tf = ts.count(term)
            if idf_mode == "log":
                idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            else:
                idf = (n - df[term] + 0.5) / (df[term] + 0.5)
            c = (idf * (tf * (K1 + 1.0))) / (tf + K1 * (1.0 - B + B * (len(ts) / avgdl)))
            s += Decimal(c).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        if s > 0:
            scores[doc] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return [doc for doc, _ in ranked]


@pytest.mark.parametrize("idf_mode", ["log", "ratio"])
def test_bm25_matches_brute_force(spark, corpus, idf_mode):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    queries = spark.createDataFrame(
        [(100, ["spark", "shuffle"]), (101, ["the", "table"]), (102, ["aggregate"])],
        ["qid", "terms"],
    )
    got = bm25_rank(corpus, "doc_id", "text", queries, "qid", "terms", idf=idf_mode).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    for qid, terms in [(100, ["spark", "shuffle"]), (101, ["the", "table"]), (102, ["aggregate"])]:
        expect = brute_bm25(rows, terms, idf_mode)
        ranked = [d for _, d in sorted(by_query.get(qid, []))]
        assert ranked == expect, (qid, terms, ranked, expect)


def test_bm25_dedups_query_terms(spark, corpus):
    """Repeated query terms must not double-count (sum is over
    DISTINCT terms, matching the oracle's SELECT DISTINCT)."""
    q1 = spark.createDataFrame([(1, ["spark", "spark"])], ["qid", "terms"])
    q2 = spark.createDataFrame([(1, ["spark"])], ["qid", "terms"])
    r1 = sorted((r.rank, r.doc_id) for r in bm25_rank(corpus, "doc_id", "text", q1, "qid", "terms").collect())
    r2 = sorted((r.rank, r.doc_id) for r in bm25_rank(corpus, "doc_id", "text", q2, "qid", "terms").collect())
    assert r1 == r2


def test_bm25_workload_matches_oracle(spark, duck):
    """The gate's exact comparison, pinned at sf0.001 for fast
    regression: ratio-idf ranks hash-match DuckDB."""
    from prefixtree_spark import workloads
    import prefixtree_spark.workloads_ext  # noqa: F401 — registers

    sdf = workloads.QUERIES["bm25_rank_docs"](spark, "/root/testdata/sf0.001")
    got = sorted(map(tuple, sdf.toPandas()[sorted(sdf.columns)].values.tolist()))
    odf = duck.execute(workloads.ORACLES["bm25_rank_docs"]).fetchdf()
    want = sorted(map(tuple, odf[sorted(odf.columns)].values.tolist()))
    assert got == want
    assert len(got) > 0


def test_bm25_unknown_idf_raises(corpus, spark):
    q = spark.createDataFrame([(1, ["x"])], ["qid", "terms"])
    with pytest.raises(ValueError):
        bm25_rank(corpus, "doc_id", "text", q, "qid", "terms", idf="bogus")


def test_rrf_fuse_hand_computed(spark):
    from prefixtree_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["qid", "doc", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], ["qid", "doc", "rank"]
    )
    got = [
        (r.doc, r.rrf_rank)
        for r in sorted(
            rrf_fuse([a, b], "qid", "doc", k=3).collect(), key=lambda r: r.rrf_rank
        )
    ]
    # 11: 1/62+1/61 > 10: 1/61+1/63 > 13: 1/62 (12: 1/63 just below)
    assert got == [(11, 1), (10, 2), (13, 3)]


def test_rrf_fuse_tie_breaks_on_id(spark):
    from prefixtree_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 20, 1), (1, 7, 1)], ["qid", "doc", "rank"])
    got = [(r.doc, r.rrf_rank) for r in sorted(
        rrf_fuse([a], "qid", "doc", k=2).collect(), key=lambda r: r.rrf_rank)]
    assert got == [(7, 1), (20, 2)]


def test_rrf_fuse_empty_rankings_raises(spark):
    from prefixtree_spark.operators.ranking import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([], "qid", "doc")


def test_hybrid_rrf_workload_matches_oracle(spark, duck):
    from prefixtree_spark import workloads
    import prefixtree_spark.workloads_ext  # noqa: F401

    sdf = workloads.QUERIES["hybrid_rrf_docs"](spark, "/root/testdata/sf0.001")
    got = sorted(map(tuple, sdf.toPandas()[sorted(sdf.columns)].values.tolist()))
    odf = duck.execute(workloads.ORACLES["hybrid_rrf_docs"]).fetchdf()
    want = sorted(map(tuple, odf[sorted(odf.columns)].values.tolist()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# persisted BM25 layout (save/append/maintain + indexed probe)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _doc_queries(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("doc_id % 41 = 0 AND size(terms) >= 3")


@pytest.mark.parametrize("idf_mode", ["log", "ratio"])
def test_bm25_indexed_matches_in_session(spark, sf_docs, idf_mode, tmp_path):
    """bm25_rank_indexed over a saved layout == bm25_rank over the
    same corpus, both idf modes — the stored index changes WHERE the
    postings live, never what they score."""
    from prefixtree_spark.operators import ranking

    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf=idf_mode
        ).collect()
    }
    path = str(tmp_path / "bm25")
    ranking.save_bm25_index(
        sf_docs, "doc_id", "text", path, n_buckets=8, idf=idf_mode
    )
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got == want and got


def test_bm25_indexed_prunes_buckets(spark, sf_docs, tmp_path):
    """The probe's postings scan must carry the term-bucket literals as
    PartitionFilters — the static-pruning rule: a probe reads its query
    terms' buckets, never the corpus."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_prune")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=16)
    q = spark.createDataFrame([(1, ["data"])], "qid long, terms array<string>")
    out = ranking.bm25_rank_indexed(spark, path, q, "qid", "terms")
    plan = out._jdf.queryExecution().executedPlan().toString()
    b = ranking.term_bucket("data", 16)
    import re

    assert re.search(
        rf"PartitionFilters: \[[^\]]*bucket#\d+ (= {b}|IN \({b}\))", plan
    ), plan[:2000]
    assert "EqualTo(term,data)" in plan  # term predicate reaches parquet
    # and the python/Spark bucket twins agree on real vocabulary
    terms = [
        r.term
        for r in ranking._tokenize_postings(sf_docs.limit(50), "doc_id", "text")
        .select("term").distinct().limit(200).collect()
    ]
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    spark_b = {
        r.term: r.b
        for r in tdf.select(
            "term", ranking._term_bucket_col(F.col("term"), 16).alias("b")
        ).collect()
    }
    for t in terms:
        assert ranking.term_bucket(t, 16) == spark_b[t], t


def test_bm25_append_exactly_once(spark, sf_docs, tmp_path):
    """The sparse append contract, mirroring append_ivf_index: build on
    half the corpus, append the rest — equals the full build; a
    recorded replay no-ops via the marker; an UNRECORDED replay (marker
    deleted to simulate the crash) is healed by the per-table guards
    (doc_id presence for postings, txn tags for dfreq/stats) with no
    double counting; generation bumps signal replicas."""
    from prefixtree_spark.operators import ranking
    from prefixtree_spark.serving import _read_ivf_generation

    half1 = sf_docs.where("doc_id % 2 = 0")
    half2 = sf_docs.where("doc_id % 2 = 1")
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    path = str(tmp_path / "bm25_app")
    ranking.save_bm25_index(
        half1, "doc_id", "text", path, n_buckets=8, idf="ratio"
    )
    g0 = _read_ivf_generation(path)
    n = ranking.append_bm25_index(
        spark, path, half2, "doc_id", "text", txn="batch1"
    )
    assert n == half2.count()
    assert _read_ivf_generation(path) == g0 + 1
    # recorded replay: marker fast path returns the original count
    assert ranking.append_bm25_index(
        spark, path, half2, "doc_id", "text", txn="batch1"
    ) == n
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got == want
    # unrecorded replay: delete the marker — the guards must detect
    # every table already has the batch and change NOTHING
    import os
    import shutil

    for f in os.listdir(f"{path}/_txns"):
        os.remove(os.path.join(f"{path}/_txns", f))
    ranking.append_bm25_index(
        spark, path, half2, "doc_id", "text", txn="batch1"
    )
    got2 = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got2 == want
    stats = spark.read.parquet(f"{path}/stats")
    assert stats.count() == 2  # base + ONE increment, not two
    shutil.rmtree(f"{path}/_txns", ignore_errors=True)


def test_bm25_maintain_compacts(spark, sf_docs, tmp_path):
    """Compaction rolls merge-on-read increments (dfreq rows, stats
    rows, postings files) down to one-per-bucket/one-row without
    changing any rank, through the staged recoverable swap."""
    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_cmp")
    thirds = [sf_docs.where(f"doc_id % 3 = {i}") for i in range(3)]
    ranking.save_bm25_index(
        thirds[0], "doc_id", "text", path, n_buckets=4, idf="ratio"
    )
    for i, t in enumerate(thirds[1:], 1):
        ranking.append_bm25_index(spark, path, t, "doc_id", "text", txn=f"t{i}")
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    rep = ranking.maintain_bm25_index(spark, path, max_files_per_bucket=1.0)
    assert rep["compacted"] and rep["files_per_bucket"] > 1.0
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want
    assert spark.read.parquet(f"{path}/stats").count() == 1
    dfreq = spark.read.parquet(f"{path}/dfreq")
    from pyspark.sql import functions as F

    assert (
        dfreq.groupBy("term").count().where(F.col("count") > 1).limit(1).count()
        == 0
    )
    # idempotent second call: already compact
    rep2 = ranking.maintain_bm25_index(spark, path, max_files_per_bucket=1.0)
    assert not rep2["compacted"]


def test_bm25_append_overlap_counts_only_new(spark, sf_docs, tmp_path):
    """The per-batch df/stats hazard, pinned: a txn append whose delta
    OVERLAPS the live index (a sync replaying a compacted snapshot)
    must append — and count — only the genuinely-new documents, so the
    final index is indistinguishable from a clean full build."""
    from prefixtree_spark.operators import ranking

    half1 = sf_docs.where("doc_id % 2 = 0")
    path = str(tmp_path / "bm25_ovl")
    ranking.save_bm25_index(half1, "doc_id", "text", path, n_buckets=8, idf="ratio")
    # delta = the WHOLE corpus (50% overlap with the live index)
    n = ranking.append_bm25_index(
        spark, path, sf_docs, "doc_id", "text", txn="overlap1"
    )
    assert n == sf_docs.count() - half1.count()  # only the odd half
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want
    # df/stats exactness (ranks could mask a uniform bias): totals
    # match a clean full build exactly
    ref = str(tmp_path / "bm25_ref")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", ref, n_buckets=8, idf="ratio")
    from pyspark.sql import functions as F

    for sub, key in (("stats", None), ("dfreq", "term")):
        a = spark.read.parquet(f"{path}/{sub}")
        b = spark.read.parquet(f"{ref}/{sub}")
        if key:
            at = {(r.term, r.df) for r in a.groupBy("term").agg(F.sum("df").alias("df")).collect()}
            bt = {(r.term, r.df) for r in b.groupBy("term").agg(F.sum("df").alias("df")).collect()}
            assert at == bt
        else:
            asum = a.agg(F.sum("n_docs"), F.sum("total_len")).collect()[0]
            bsum = b.agg(F.sum("n_docs"), F.sum("total_len")).collect()[0]
            assert tuple(asum) == tuple(bsum)


def test_sync_bm25_from_published(spark, sf_docs, tmp_path):
    """The corpus-follower contract, sparse form: bootstrap on first
    sync, O(new segments) catch-up on appends, watermark no-op when in
    sync, replay-rewind lands nothing (presence filters), replace-mode
    entries fall back to the full snapshot without double counting."""
    from prefixtree_spark.operators import ann, ranking
    from prefixtree_spark.sources.io import (
        append_published,
        compact_published,
        publish_version,
    )

    half1 = sf_docs.where("doc_id % 2 = 0")
    half2 = sf_docs.where("doc_id % 2 = 1")
    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "bm25_sync")
    publish_version(half1.select("doc_id", "text"), root)
    n1 = ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text", n_buckets=8, idf="ratio"
    )
    assert n1 == half1.count()  # bootstrap
    assert ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text"
    ) == 0  # watermark: in sync
    append_published(half2.select("doc_id", "text"), root)
    n2 = ranking.sync_bm25_from_published(spark, root, ipath, "doc_id", "text")
    assert n2 == half2.count()
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, ipath, q, "qid", "terms").collect()
    }
    assert got == want
    # crash-rewind replay: watermark lost → re-sync re-candidates the
    # last segments; the RECORDED txn fast path answers the original
    # count (the exactly-once contract) while landing NOTHING — pin
    # that by state, not by return value
    n_stats = spark.read.parquet(f"{ipath}/stats").count()
    ann._write_sync_watermark(spark, ipath, 1)
    assert ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text"
    ) == n2  # recorded replay reports the original count
    assert spark.read.parquet(f"{ipath}/stats").count() == n_stats
    # replace-mode entry (compaction) → full-snapshot fallback, still 0
    compact_published(spark, root)
    assert ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text"
    ) == 0
    got2 = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, ipath, q, "qid", "terms").collect()
    }
    assert got2 == want


def test_maintain_bm25_rebuild_from_converges(spark, sf_docs, tmp_path):
    """rebuild_from closes the delete AND update halves of 'the index
    converges to the corpus' (the sync handles adds): docs deleted and
    rewritten in the corpus stop ranking by their old text after one
    corpus-driven rebuild."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_reb")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=8, idf="ratio")
    # corpus evolves: every 7th doc deleted, every 11th doc's text
    # rewritten to a sentinel token
    corpus2 = sf_docs.where("doc_id % 7 <> 0").withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.lit("zzsentinel zzsentinel"))
        .otherwise(F.col("text")),
    )
    rep = ranking.maintain_bm25_index(spark, path, rebuild_from=corpus2)
    assert rep["rebuilt"]
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            corpus2, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want and got
    # the sentinel is retrievable, deleted docs are not
    qs = spark.createDataFrame([(1, ["zzsentinel"])], "qid long, terms array<string>")
    hits = {r.doc_id for r in ranking.bm25_rank_indexed(spark, path, qs, "qid", "terms").collect()}
    assert hits and all(d % 11 == 0 for d in hits)


def test_maintain_bm25_rebuild_rebuckets(spark, sf_docs, tmp_path):
    """n_buckets freezes at save (a 100x-grown corpus would serve from
    100x-fat buckets): the corpus-driven rebuild can override it, the
    staged swap moves meta WITH the data tables (stale meta against
    re-bucketed tables would hash probes into the wrong directories),
    and every rank is unchanged."""
    import os

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_rbk")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    rep = ranking.maintain_bm25_index(
        spark, path, rebuild_from=sf_docs, n_buckets=16
    )
    assert rep["rebuilt"]
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta.n_buckets == 16
    dirs = {
        d for d in os.listdir(f"{path}/postings") if d.startswith("bucket=")
    }
    assert len(dirs) > 4  # physically re-bucketed
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want and got
    # the Spark-free handle follows the new bucket count too
    from prefixtree_spark.serving import load_local_bm25_index

    h = load_local_bm25_index(path)
    assert h.n_buckets == 16
    case = [(r.qid, r.terms) for r in q.limit(1).collect()][0]
    got_srv = [int(i) for i, _ in h.search(case[1], 10)]
    want_srv = [i for _, i in sorted(
        (r.rank, r.doc_id) for r in ranking.bm25_rank_indexed(
            spark, path, q.where(f"qid = {case[0]}"), "qid", "terms"
        ).collect()
    )]
    assert got_srv == want_srv


def test_bm25_bucket_files_term_sorted_and_lazy_per_term(spark, sf_docs, tmp_path):
    """The 100 TB serving contract: bucket files are written sorted by
    term (row-group statistics prune a term-equality fetch — pinned by
    within-file order, the deterministic footer-level fact at this
    scale), and a lazy LocalSparseIndex probe caches per (bucket,
    term), never a whole-bucket dict."""
    import os

    import pyarrow.parquet as pq_arrow
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.serving import load_local_bm25_index

    path = str(tmp_path / "bm25_sorted")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    # append keeps the per-file sort too
    ranking.append_bm25_index(
        spark, path,
        sf_docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text"),
        "doc_id", "text",
    )
    n_files = 0
    for sub in ("postings", "dfreq"):
        for bd in os.listdir(f"{path}/{sub}"):
            if not bd.startswith("bucket="):
                continue
            for f in os.listdir(f"{path}/{sub}/{bd}"):
                if not f.endswith(".parquet"):
                    continue
                n_files += 1
                terms = pq_arrow.read_table(
                    f"{path}/{sub}/{bd}/{f}", columns=["term"]
                ).column("term").to_pylist()
                assert terms == sorted(terms), (sub, bd, f)
    assert n_files >= 8
    h = load_local_bm25_index(path)
    got = h.search(["the", "data"], 5)
    assert got
    assert not h._buckets and not h._dfs  # no whole-bucket dict loaded
    assert any(k[1] in ("the", "data") for k in h._term_posts)


def test_delete_bm25_ids_soft_delete_then_compact_exact(spark, sf_docs, tmp_path):
    """The sparse merge-on-read deletion contract end-to-end: an O(1)
    tombstone excludes the doc from cluster AND serving results
    immediately (df stays stale — the Lucene soft-delete interim),
    re-append is rejected, and the forced compaction physically drops
    the postings, re-exacts df/stats (ranks == a fresh build over the
    survivors), clears the sidecar, and re-opens the id for appends."""
    import os

    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.serving import load_local_bm25_index

    path = str(tmp_path / "bm25_del")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    dead = [r.doc_id for r in sf_docs.where("doc_id % 97 = 0")
            .select("doc_id").collect()]
    assert ranking.delete_bm25_ids(spark, path, dead) == len(dead)
    assert ranking.delete_bm25_ids(spark, path, dead[:2]) == 0  # no-op
    q = _doc_queries(spark)
    got = {
        (r.query_id, r.doc_id)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got and not {d for _, d in got} & set(dead)
    # serving, lazy and preloaded: same exclusion
    case = [(r.qid, list(r.terms)) for r in q.limit(3).collect()]
    for preload in (False, True):
        h = load_local_bm25_index(path, preload=preload)
        for _, terms in case:
            assert not {int(i) for i, _ in h.search(terms, 10)} & set(dead)
    # re-append of a tombstoned id: rejected (old postings physical)
    import pytest as _pt

    with _pt.raises(ValueError, match="tombstoned"):
        ranking.append_bm25_index(
            spark, path, sf_docs.where(f"doc_id = {dead[0]}"),
            "doc_id", "text",
        )
    # compaction forced by tombstones: exact recompute == fresh build
    rep = ranking.maintain_bm25_index(spark, path, max_files_per_bucket=99.0)
    assert rep["compacted"] and rep["tombstones_compacted"] == len(dead)
    assert not os.path.isdir(f"{path}/_tombstones")
    survivors = sf_docs.where("doc_id % 97 <> 0")
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            survivors, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got2 = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got2 == want
    # compacted: the id can come back through the normal add path
    assert ranking.append_bm25_index(
        spark, path, sf_docs.where(f"doc_id = {dead[0]}"), "doc_id", "text"
    ) == 1


def test_bm25_staged_swap_requires_complete_marker(spark, sf_docs, tmp_path):
    """r9 review #1: completeness is the explicit _complete marker, not
    any table's presence — a re-bucketing rebuild that crashed between
    its stats and meta writes must be treated as GARBAGE (recovering it
    would install new-bucketed tables under the old meta, hashing every
    probe into the wrong directories); a marked stage must recover."""
    import os
    import shutil

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_crash")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    # a crashed 16-bucket rebuild: full tables staged, NO _complete
    # (the crash point between save's last table and the marker)
    staged = f"{path}/_compact"
    ranking.save_bm25_index(sf_docs, "doc_id", "text", staged, n_buckets=16,
                            idf="ratio")
    rep = ranking.maintain_bm25_index(spark, path, max_files_per_bucket=99.0)
    assert not rep["recovered"] and not os.path.isdir(staged)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta.n_buckets == 4  # untouched live layout
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want
    # the same stage WITH the marker: recovery completes the swap and
    # the live meta moves with it
    ranking.save_bm25_index(sf_docs, "doc_id", "text", staged, n_buckets=16,
                            idf="ratio")
    open(f"{staged}/_complete", "w").write("1")
    rep2 = ranking.maintain_bm25_index(spark, path, max_files_per_bucket=99.0)
    assert rep2["recovered"]
    meta2 = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta2.n_buckets == 16
    got2 = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got2 == want
    shutil.rmtree(staged, ignore_errors=True)


def test_bm25_indexed_ignores_null_terms(spark, sf_docs, tmp_path):
    """r9 review #5: NULL array elements survive explode — the probe
    must ignore them (bm25_rank's behavior), not crash in sorted()."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.serving import load_local_bm25_index

    path = str(tmp_path / "bm25_null")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    q_null = spark.createDataFrame(
        [(1, ["the", None, "data"])], "qid long, terms array<string>"
    )
    q_clean = spark.createDataFrame(
        [(1, ["the", "data"])], "qid long, terms array<string>"
    )
    a = {(r.doc_id, r.rank) for r in ranking.bm25_rank_indexed(
        spark, path, q_null, "qid", "terms").collect()}
    b = {(r.doc_id, r.rank) for r in ranking.bm25_rank_indexed(
        spark, path, q_clean, "qid", "terms").collect()}
    assert a == b and a
    h = load_local_bm25_index(path)
    assert h.search(["the", None, "data"], 10) == h.search(["the", "data"], 10)


def test_bm25_layout_property_random_corpora(spark, tmp_path):
    """Property over randomized corpora (the build-twin test model):
    for random vocabularies, doc lengths, duplicate-heavy term draws,
    and any split into base+append batches, the PERSISTED layout
    answers every query identically to the in-session ranker over the
    same corpus — both idf modes, compaction interleaved."""
    import random

    from prefixtree_spark.operators import ranking

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(4):
        n_docs = rng.randint(8, 40)
        rows = []
        for d in range(n_docs):
            n_tok = rng.randint(0, 30)  # includes EMPTY docs
            rows.append(
                (d, " ".join(rng.choice(vocab) for _ in range(n_tok)))
            )
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # max(1,..): save_bm25_index rejects an empty base corpus now
        split = max(1, rng.randint(0, n_docs))
        idf = rng.choice(["log", "ratio"])
        path = str(tmp_path / f"prop_{trial}")
        ranking.save_bm25_index(
            docs.where(f"doc_id < {split}"), "doc_id", "text", path,
            n_buckets=rng.choice([2, 4, 8]), idf=idf,
        )
        ranking.append_bm25_index(
            spark, path, docs.where(f"doc_id >= {split}"), "doc_id", "text",
            txn=f"p{trial}",
        )
        if rng.random() < 0.5:
            ranking.maintain_bm25_index(spark, path, max_files_per_bucket=1.0)
        queries = spark.createDataFrame(
            [
                (qi, [rng.choice(vocab) for _ in range(rng.randint(1, 4))])
                for qi in range(5)
            ],
            "qid long, terms array<string>",
        )
        want = {
            (r.query_id, r.doc_id, r.rank)
            for r in ranking.bm25_rank(
                docs, "doc_id", "text", queries, "qid", "terms", idf=idf
            ).collect()
        }
        got = {
            (r.query_id, r.doc_id, r.rank)
            for r in ranking.bm25_rank_indexed(
                spark, path, queries, "qid", "terms"
            ).collect()
        }
        assert got == want, (trial, idf, split)


def test_save_bm25_over_stale_layout_clears_sidecars(spark, sf_docs, tmp_path):
    """ADVICE r9 #1 (sparse twin): a fresh save_bm25_index over an
    existing layout drops its _tombstones/_txns/_synced — stale
    tombstones would mask brand-new documents from every probe and
    block their re-append; stale txn markers would no-op appends the
    new layout never saw."""
    import os

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.sources.io import _retired_txn_version

    half1 = sf_docs.where("doc_id % 2 = 0")
    half2 = sf_docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "bm25_resave")
    ranking.save_bm25_index(half1, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    dead = [r.doc_id for r in half1.limit(2).collect()]
    assert ranking.delete_bm25_ids(spark, path, dead) == 2
    ranking.append_bm25_index(spark, path, half2, "doc_id", "text",
                              txn="old-batch")
    from prefixtree_spark.operators.ann import _write_sync_watermark

    _write_sync_watermark(spark, path, 9)
    # fresh save over the same path
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    assert not os.path.isdir(f"{path}/_tombstones")
    assert not os.path.isdir(f"{path}/_txns")
    assert not os.path.exists(f"{path}/_synced")
    assert _retired_txn_version(spark, path, "old-batch") is None
    # previously-tombstoned docs rank again, and the layout equals the
    # in-session ranker over the full corpus
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got == want


def test_bm25_unrecorded_replay_reports_original_count(spark, sf_docs, tmp_path):
    """ADVICE r9 #3: a replay after a crash BETWEEN the postings write
    and the txn marker sees the presence filter drop every doc — it
    must recover the original count from the landed txn-tagged stats
    increment, not retire the txn with 0 (sync_bm25_from_published
    would otherwise report 0 appended for that version forever)."""
    import os

    from prefixtree_spark.operators import ranking

    half1 = sf_docs.where("doc_id % 2 = 0")
    half2 = sf_docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "bm25_replaycnt")
    ranking.save_bm25_index(half1, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    n = ranking.append_bm25_index(spark, path, half2, "doc_id", "text",
                                  txn="b1")
    assert n == half2.count() and n > 0
    # simulate the crash: everything landed except the marker
    for f in os.listdir(f"{path}/_txns"):
        os.remove(os.path.join(f"{path}/_txns", f))
    got = ranking.append_bm25_index(spark, path, half2, "doc_id", "text",
                                    txn="b1")
    assert got == n  # NOT 0
    # and the re-recorded marker fast path reports the same
    assert ranking.append_bm25_index(
        spark, path, half2, "doc_id", "text", txn="b1"
    ) == n
    # a genuinely-empty overlap delta under a NEW txn still reports 0
    assert ranking.append_bm25_index(
        spark, path, half2, "doc_id", "text", txn="b2"
    ) == 0


def _transformed_corpus(sf_docs):
    """COW-style corpus evolution: every 89th doc deleted, every 73rd
    (surviving) doc's text rewritten in place."""
    from pyspark.sql import functions as F

    return sf_docs.where("doc_id % 89 != 0").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 73 == 0,
            F.concat(F.lit("zzupd zzfresh "), F.col("text")),
        ).otherwise(F.col("text")),
    )


@pytest.mark.parametrize("force_anti_join", [False, True])
def test_bm25_reconcile_updates_and_deletes(
    spark, sf_docs, tmp_path, monkeypatch, force_anti_join
):
    """r9 top next-round item: maintain_bm25_index(reconcile_with=)
    converges a persisted layout to a corpus whose documents were
    REWRITTEN and DELETED in place — content-fingerprint diff, only
    the changed docs re-tokenize, no corpus-wide rebuild — and a
    second call is a clean no-op. Both filter regimes (literal NOT-IN
    and the past-the-cap anti-join) must produce identical layouts."""
    from prefixtree_spark.operators import ranking
    from prefixtree_spark.serving import _read_ivf_generation

    if force_anti_join:
        monkeypatch.setattr(ranking, "_BM25_GUARD_STATIC_MAX", 0)
    path = str(tmp_path / f"bm25_rec_{force_anti_join}")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    corpus2 = _transformed_corpus(sf_docs)
    n_del = sf_docs.where("doc_id % 89 = 0").count()
    n_upd = corpus2.where("doc_id % 73 = 0").count()
    assert n_del > 0 and n_upd > 0
    rep = ranking.maintain_bm25_index(
        spark, path, reconcile_with=corpus2, id_col="doc_id",
        text_col="text",
    )
    assert rep["reconciled"] == n_del + n_upd
    assert rep["updated"] == n_upd and not rep["rebuilt"]
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            corpus2, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got == want and got
    # rewritten text is actually SERVED: a query on the new marker
    # terms hits every updated doc
    qm = spark.createDataFrame([(999, ["zzupd"])], ["qid", "terms"])
    hits = {
        r.doc_id
        for r in ranking.bm25_rank_indexed(
            spark, path, qm, "qid", "terms", topk=10_000
        ).collect()
    }
    assert hits == {
        r.doc_id for r in corpus2.where("doc_id % 73 = 0").collect()
    }
    # convergence: second call is a clean no-op, no generation bump
    g1 = _read_ivf_generation(path)
    rep2 = ranking.maintain_bm25_index(
        spark, path, reconcile_with=corpus2, id_col="doc_id",
        text_col="text",
    )
    assert rep2["reconciled"] == 0 and rep2["updated"] == 0
    assert _read_ivf_generation(path) == g1


def test_bm25_reconcile_folds_pending_tombstones(spark, sf_docs, tmp_path):
    """Pending delete_bm25_ids tombstones fold into the reconcile
    rebuild and WIN over corpus presence: a tombstoned id the corpus
    still carries stays out, the sidecar clears, and the id becomes
    re-appendable (old postings physically gone)."""
    import os

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_rec_ts")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    dead = [r.doc_id for r in sf_docs.limit(2).collect()]
    assert ranking.delete_bm25_ids(spark, path, dead) == 2
    # corpus unchanged — the only work is the tombstone fold
    rep = ranking.maintain_bm25_index(
        spark, path, reconcile_with=sf_docs, id_col="doc_id",
        text_col="text",
    )
    assert rep["reconciled"] == 0 and rep["tombstones_compacted"] == 2
    assert not os.path.isdir(f"{path}/_tombstones")
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs.where(~sf_docs.doc_id.isin(dead)), "doc_id", "text",
            q, "qid", "terms", idf="ratio",
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(
            spark, path, q, "qid", "terms"
        ).collect()
    }
    assert got == want
    # physically reclaimed -> re-append works again
    n = ranking.append_bm25_index(
        spark, path, sf_docs.where(sf_docs.doc_id.isin(dead)),
        "doc_id", "text",
    )
    assert n == 2


def test_bm25_reconcile_requires_fingerprints(spark, sf_docs, tmp_path):
    """Pre-r10 layouts (no docs/ fingerprint table) fail loudly with
    the rebuild_from escape hatch — and rebuild_from STAMPS the
    fingerprints, after which reconcile works."""
    import shutil

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_legacy")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    shutil.rmtree(f"{path}/docs")  # simulate a pre-r10 layout
    with pytest.raises(ValueError, match="rebuild_from"):
        ranking.maintain_bm25_index(
            spark, path, reconcile_with=sf_docs, id_col="doc_id",
            text_col="text",
        )
    rep = ranking.maintain_bm25_index(
        spark, path, rebuild_from=sf_docs, id_col="doc_id",
        text_col="text",
    )
    assert rep["rebuilt"]
    rep2 = ranking.maintain_bm25_index(
        spark, path, reconcile_with=sf_docs, id_col="doc_id",
        text_col="text",
    )
    assert rep2["reconciled"] == 0  # converged, fingerprints live


def test_bm25_updated_workload_matches_oracle(spark, duck):
    """Gate-equivalent pin for bm25_rank_updated: the reconciled
    stored layout's ranks hash-match DuckDB's BM25 over the EVOLVED
    corpus (deletes gone, rewritten text served)."""
    from prefixtree_spark import workloads
    import prefixtree_spark.workloads_ext  # noqa: F401 — registers

    sdf = workloads.QUERIES["bm25_rank_updated"](
        spark, "/root/testdata/sf0.001"
    )
    got = sorted(map(tuple, sdf.toPandas()[sorted(sdf.columns)].values.tolist()))
    odf = duck.execute(workloads.ORACLES["bm25_rank_updated"]).fetchdf()
    want = sorted(map(tuple, odf[sorted(odf.columns)].values.tolist()))
    assert got == want
    assert len(got) > 0
    # repeat call: the converged no-op path returns the same answer
    sdf2 = workloads.QUERIES["bm25_rank_updated"](
        spark, "/root/testdata/sf0.001"
    )
    got2 = sorted(map(tuple, sdf2.toPandas()[sorted(sdf2.columns)].values.tolist()))
    assert got2 == got


def test_bm25_tombstone_filter_anti_join_crossover(
    spark, sf_docs, tmp_path, monkeypatch
):
    """The sparse twin of the ANN tombstone-filter crossover: past the
    literal cap, bm25_rank_indexed filters deletes via broadcast
    anti-join — identical ranks in both regimes, and the append guard
    still rejects tombstoned ids."""
    from prefixtree_spark.operators import ann as _ann
    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_xover_ts")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    dead = [r.doc_id for r in sf_docs.limit(3).collect()]
    assert ranking.delete_bm25_ids(spark, path, dead) == 3
    q = _doc_queries(spark)

    def _probe():
        return {
            (r.query_id, r.doc_id, r.rank)
            for r in ranking.bm25_rank_indexed(
                spark, path, q, "qid", "terms"
            ).collect()
        }

    lit = _probe()
    monkeypatch.setattr(_ann, "_APPEND_GUARD_STATIC_MAX", 0)
    monkeypatch.setattr(ranking, "_BM25_GUARD_STATIC_MAX", 0)
    aj = _probe()
    assert aj == lit and lit
    with pytest.raises(ValueError, match="tombstoned"):
        ranking.append_bm25_index(
            spark, path, sf_docs.where(sf_docs.doc_id.isin(dead)),
            "doc_id", "text",
        )


def test_bm25_reconcile_empty_corpus_drains_not_bricks(spark, sf_docs, tmp_path):
    """r10 review: reconciling against an EMPTIED corpus (every stored
    doc stale) must drain the layout through schema-bearing empty
    tables, not swap in file-less zero-row partitionBy writes that
    brick every later probe. The drained layout keeps serving (empty
    results) and accepts re-appends."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_drain")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    empty = sf_docs.where(F.lit(False))
    rep = ranking.maintain_bm25_index(
        spark, path, reconcile_with=empty, id_col="doc_id",
        text_col="text",
    )
    assert rep["reconciled"] == sf_docs.count()
    q = _doc_queries(spark)
    # probes still work — empty, not erroring
    assert ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").count() == 0
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats.n_docs == 0 and stats.total_len == 0
    # the layout accepts a fresh append and ranks again
    n = ranking.append_bm25_index(spark, path, sf_docs, "doc_id", "text")
    assert n == sf_docs.count()
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want and got


def test_bm25_rebuild_from_empty_corpus_drains(spark, sf_docs, tmp_path):
    """The rebuild_from twin of the drain test: a wholesale rebuild
    from an empty corpus drains instead of bricking."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_drain_rb")
    ranking.save_bm25_index(sf_docs, "doc_id", "text", path,
                            n_buckets=8, idf="ratio")
    rep = ranking.maintain_bm25_index(
        spark, path, rebuild_from=sf_docs.where(F.lit(False)),
        id_col="doc_id", text_col="text",
    )
    assert rep["rebuilt"]
    q = _doc_queries(spark)
    assert ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").count() == 0


def test_bm25_reconcile_converged_still_compacts_fragmentation(
    spark, sf_docs, tmp_path
):
    """r10 review: a converged reconcile (corpus content unchanged)
    must still fall through to the fragmentation check — the steady
    state of maintain_ingest(bm25_reconcile=True) is exactly appends
    fragmenting buckets with no content churn."""
    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_rec_frag")
    thirds = [sf_docs.where(f"doc_id % 3 = {i}") for i in range(3)]
    ranking.save_bm25_index(thirds[0], "doc_id", "text", path,
                            n_buckets=4, idf="ratio")
    for i, t in enumerate(thirds[1:], 1):
        ranking.append_bm25_index(spark, path, t, "doc_id", "text",
                                  txn=f"t{i}")
    rep = ranking.maintain_bm25_index(
        spark, path, max_files_per_bucket=1.0, reconcile_with=sf_docs,
        id_col="doc_id", text_col="text",
    )
    assert rep["reconciled"] == 0  # content converged
    assert rep["compacted"]        # but fragmentation still compacts
    q = _doc_queries(spark)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            sf_docs, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()
    }
    assert got == want


def test_save_bm25_empty_and_all_empty_corpora(spark, tmp_path):
    """save_bm25_index fails loudly on an empty corpus (file-less
    partitionBy hazard; maintain's drain is the intentional form) and
    handles a corpus of only EMPTY documents with schema-bearing
    tables that keep probing and appending."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        ranking.save_bm25_index(empty, "doc_id", "text",
                                str(tmp_path / "bm25_none"), n_buckets=4)
    # all-empty documents: n_docs > 0, zero postings
    blank = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    path = str(tmp_path / "bm25_blank")
    ranking.save_bm25_index(blank, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats.n_docs == 3 and stats.total_len == 0
    q = spark.createDataFrame([(1, ["anything"])], "qid long, terms array<string>")
    assert ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").count() == 0
    # appending real documents onto the blank layout works
    real = spark.createDataFrame(
        [(10, "alpha beta"), (11, "alpha gamma")], "doc_id long, text string"
    )
    assert ranking.append_bm25_index(spark, path, real, "doc_id", "text") == 2
    q2 = spark.createDataFrame([(1, ["alpha", "beta"])], "qid long, terms array<string>")
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, path, q2, "qid", "terms").collect()
    }
    all_docs = blank.unionByName(real)
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            all_docs, "doc_id", "text", q2, "qid", "terms", idf="ratio"
        ).collect()
    }
    assert got == want and got


def test_bm25_reconcile_property_random_evolutions(spark, tmp_path):
    """Property over randomized corpus EVOLUTIONS (the reconcile twin
    of the layout property test): for random corpora and random
    add/update/delete sequences — including empty docs becoming
    non-empty and vice versa — maintain_bm25_index(reconcile_with=)
    plus append for the adds converges the layout so every query
    answers identically to a FRESH in-session ranking over the evolved
    corpus; a second reconcile is always a no-op."""
    import random

    from prefixtree_spark.operators import ranking

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(40)]

    def _text():
        return " ".join(
            rng.choice(vocab) for _ in range(rng.randint(0, 25))
        )

    for trial in range(4):
        n0 = rng.randint(6, 25)
        base = {d: _text() for d in range(n0)}
        docs0 = spark.createDataFrame(
            list(base.items()), "doc_id long, text string"
        )
        path = str(tmp_path / f"recprop_{trial}")
        ranking.save_bm25_index(
            docs0, "doc_id", "text", path,
            n_buckets=rng.choice([2, 4, 8]), idf="ratio",
        )
        # evolve: delete some, rewrite some, add some
        evolved = dict(base)
        for d in list(evolved):
            r = rng.random()
            if r < 0.2:
                del evolved[d]                # delete
            elif r < 0.5:
                evolved[d] = _text()          # rewrite (may become same/empty)
        adds = {n0 + i: _text() for i in range(rng.randint(0, 6))}
        evolved.update(adds)
        docs1 = spark.createDataFrame(
            list(evolved.items()), "doc_id long, text string"
        )
        # adds through the append path (sync's half), then reconcile
        # for updates/deletes (maintenance's half)
        if adds:
            ranking.append_bm25_index(
                spark, path,
                docs1.where(docs1.doc_id.isin(list(adds))),
                "doc_id", "text", txn=f"adds{trial}",
            )
        rep = ranking.maintain_bm25_index(
            spark, path, reconcile_with=docs1, id_col="doc_id",
            text_col="text",
        )
        n_del = len(base) - len(set(base) & set(evolved))
        # rewrites that drew identical text are NOT changes (the
        # fingerprint is content-based, not event-based)
        n_upd = sum(
            1 for d in set(base) & set(evolved) if evolved[d] != base[d]
        )
        assert rep["reconciled"] == n_del + n_upd, trial
        assert rep["updated"] == n_upd, trial
        queries = spark.createDataFrame(
            [
                (qi, [rng.choice(vocab) for _ in range(rng.randint(1, 4))])
                for qi in range(5)
            ],
            "qid long, terms array<string>",
        )
        want = {
            (r.query_id, r.doc_id, r.rank)
            for r in ranking.bm25_rank(
                docs1, "doc_id", "text", queries, "qid", "terms",
                idf="ratio",
            ).collect()
        }
        got = {
            (r.query_id, r.doc_id, r.rank)
            for r in ranking.bm25_rank_indexed(
                spark, path, queries, "qid", "terms"
            ).collect()
        }
        assert got == want, trial
        rep2 = ranking.maintain_bm25_index(
            spark, path, reconcile_with=docs1, id_col="doc_id",
            text_col="text",
        )
        assert rep2["reconciled"] == 0 and rep2["updated"] == 0, trial


def test_describe_bm25_index_reports_lifecycle_state(spark, sf_docs, tmp_path):
    """describe_bm25_index: a metadata-only health view whose numbers
    track the lifecycle — appends raise files_per_bucket and
    stats_increments, deletes raise tombstones, maintenance resets all
    three and bumps the generation."""
    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_desc")
    halves = [sf_docs.where(f"doc_id % 2 = {i}") for i in range(2)]
    ranking.save_bm25_index(halves[0], "doc_id", "text", path,
                            n_buckets=4, idf="ratio")
    d0 = ranking.describe_bm25_index(spark, path)
    assert d0["n_buckets"] == 4 and d0["idf"] == "ratio"
    assert d0["n_docs"] == halves[0].count()
    assert d0["stats_increments"] == 0 and d0["tombstones"] == 0
    assert d0["has_fingerprints"] and not d0["swap_in_progress"]
    assert d0["postings"]["bytes"] > 0
    ranking.append_bm25_index(spark, path, halves[1], "doc_id", "text",
                              txn="d1")
    dead = [r.doc_id for r in sf_docs.limit(2).collect()]
    ranking.delete_bm25_ids(spark, path, dead)
    d1 = ranking.describe_bm25_index(spark, path)
    assert d1["n_docs"] == sf_docs.count()
    assert d1["stats_increments"] == 1 and d1["tombstones"] == 2
    assert d1["files_per_bucket"] > d0["files_per_bucket"]
    assert d1["generation"] > d0["generation"]
    ranking.maintain_bm25_index(spark, path, max_files_per_bucket=1.0)
    d2 = ranking.describe_bm25_index(spark, path)
    assert d2["stats_increments"] == 0 and d2["tombstones"] == 0
    assert d2["files_per_bucket"] <= 1.0
    assert d2["n_docs"] == sf_docs.count() - 2  # re-exacted post-delete


def test_bm25_tombstone_compaction_of_last_posting_doc_drains_postings(
    spark, tmp_path
):
    """r10 review round 2: tombstoning every posting-BEARING doc while
    empty-text docs survive must not brick the layout — the compaction
    stages schema-bearing empty postings/dfreq, keeps the surviving
    (empty) docs in stats/docs, and the layout stays probe-able and
    appendable."""
    from prefixtree_spark.operators import ranking

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "doc_id long, text string"
    )
    path = str(tmp_path / "bm25_lastdoc")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    ranking.delete_bm25_ids(spark, path, [1])
    rep = ranking.maintain_bm25_index(spark, path)
    assert rep["compacted"] and rep["tombstones_compacted"] == 1
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats.n_docs == 2 and stats.total_len == 0  # empty docs live
    ids = {r.doc_id for r in spark.read.parquet(f"{path}/docs").collect()}
    assert ids == {2, 3}
    q = spark.createDataFrame([(1, ["hello"])], "qid long, terms array<string>")
    assert ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").count() == 0
    assert ranking.append_bm25_index(
        spark, path, spark.createDataFrame(
            [(10, "hello again")], "doc_id long, text string"
        ), "doc_id", "text",
    ) == 1
    got = {(r.query_id, r.doc_id) for r in
           ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").collect()}
    assert got == {(1, 10)}


def test_save_bm25_blank_resave_clears_stale_buckets(spark, tmp_path):
    """r10 review round 2: re-saving an ALL-EMPTY-docs corpus over an
    existing populated layout must clear the old bucket files — the
    blank layout must not keep ranking the previous corpus."""
    from prefixtree_spark.operators import ranking

    path = str(tmp_path / "bm25_blankover")
    real = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    ranking.save_bm25_index(real, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    blank = spark.createDataFrame(
        [(7, ""), (8, None)], "doc_id long, text string"
    )
    ranking.save_bm25_index(blank, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    q = spark.createDataFrame(
        [(1, ["alpha", "gamma"])], "qid long, terms array<string>"
    )
    assert ranking.bm25_rank_indexed(spark, path, q, "qid", "terms").count() == 0
    assert spark.read.parquet(f"{path}/postings").count() == 0


def test_sync_bm25_bootstrap_on_empty_corpus_noops(spark, tmp_path):
    """r10 review round 2: a follower sync against a published corpus
    whose live snapshot has no indexable rows returns 0 (advancing the
    watermark) instead of crashing on the empty-corpus save guard; a
    later version WITH data bootstraps normally."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.sources.io import publish_version

    root = str(tmp_path / "pub")
    ipath = str(tmp_path / "bm25_sync")
    # "no indexable rows" in its physically-publishable form: rows
    # exist but every id is NULL (save_bm25_index drops them)
    nulls = spark.createDataFrame(
        [(None, "orphan text")], "doc_id long, text string"
    )
    publish_version(nulls.coalesce(1), root)
    assert ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text", n_buckets=4, idf="ratio"
    ) == 0
    # repeated call: watermark advanced, still a clean no-op
    assert ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text", n_buckets=4, idf="ratio"
    ) == 0
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    publish_version(docs.coalesce(1), root)
    n = ranking.sync_bm25_from_published(
        spark, root, ipath, "doc_id", "text", n_buckets=4, idf="ratio"
    )
    assert n == 2
    q = spark.createDataFrame([(1, ["alpha"])], "qid long, terms array<string>")
    got = {(r.query_id, r.doc_id) for r in
           ranking.bm25_rank_indexed(spark, ipath, q, "qid", "terms").collect()}
    assert got == {(1, 1)}


def test_bm25_append_empty_doc_reoffer_no_duplicate_fingerprint(
    spark, tmp_path
):
    """r10 advice: an EMPTY-TEXT doc never emits postings, so the
    postings-keyed presence filter cannot see it when it is re-offered
    under a NEW txn — without the docs/-keyed second presence source,
    each re-offer appended a duplicate fingerprint row (reconcile then
    counted the doc twice in its n_docs stamp and duplicated rows
    through the changed-detection joins) and stats over-counted."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking

    rows = [(0, "alpha beta gamma"), (1, ""), (2, "delta alpha")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "bm25_empty_reoffer")
    ranking.save_bm25_index(
        docs, "doc_id", "text", path, n_buckets=4, idf="ratio"
    )
    # re-offer the empty doc (plus one genuinely-new doc) under a new
    # txn — the sync-replays-a-snapshot shape
    delta = spark.createDataFrame(
        [(1, ""), (3, "epsilon beta")], ["doc_id", "text"]
    )
    n = ranking.append_bm25_index(
        spark, path, delta, "doc_id", "text", txn="re1"
    )
    assert n == 1  # only doc 3 is new
    fp_counts = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{path}/docs")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert fp_counts == {0: 1, 1: 1, 2: 1, 3: 1}
    n_docs = (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert n_docs == 4
    # an unrecorded replay of the SAME txn still recomputes the same
    # delta (the docs/-filter excludes this txn's own rows), so the
    # exactly-once contract holds across the new presence source
    n2 = ranking.append_bm25_index(
        spark, path, delta, "doc_id", "text", txn="re1"
    )
    assert n2 == 1
    assert (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n_docs"))
        .collect()[0][0]
        == 4
    )
    # reconcile against the unchanged corpus: a no-op, with the exact
    # n_docs carried through
    full = docs.unionByName(delta.where("doc_id = 3"))
    rep = ranking.maintain_bm25_index(
        spark, path, reconcile_with=full, id_col="doc_id", text_col="text"
    )
    assert rep["reconciled"] == 0 and rep["updated"] == 0


def test_bm25_recovery_clears_marker_only_after_swap(
    spark, tmp_path, monkeypatch
):
    """r11 review (IVF twin's finding, applied here): a crashed
    writer's stray _swapping marker must NOT be cleared before the
    recovery swap finishes — clearing first exposes the half-renamed
    layout to probes as marker-down + unmoved-generation (a silent
    mixed read). Pin: the first clear_swapping call during a
    recovering maintain happens only once the staged root is gone."""
    import os
    import shutil as _sh

    import prefixtree_spark._generation as gen
    from prefixtree_spark.operators import ranking

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 5} shared") for i in range(40)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "bm25_rec_marker")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=4,
                            idf="ratio")
    # the crash artifact: a COMPLETE stage (copy of the live tables +
    # the _complete marker) and the stray marker a mid-swap crash
    # leaves behind
    staged = f"{path}/_compact"
    os.makedirs(staged)
    for sub in ("postings", "dfreq", "docs", "meta", "stats"):
        if os.path.isdir(f"{path}/{sub}"):
            _sh.copytree(f"{path}/{sub}", f"{staged}/{sub}")
    open(f"{staged}/_complete", "w").write("1")
    open(f"{path}/_swapping", "w").write("1")
    seen = {}
    real_clear = gen.clear_swapping

    def probing_clear(sp, p):
        seen.setdefault("staged_gone_at_first_clear",
                        not os.path.exists(staged))
        return real_clear(sp, p)

    monkeypatch.setattr(gen, "clear_swapping", probing_clear)
    rep = ranking.maintain_bm25_index(spark, path)
    assert rep["recovered"] is True
    assert seen["staged_gone_at_first_clear"] is True
    assert not os.path.exists(f"{path}/_swapping")
    # the recovered layout still serves
    q = _doc_queries_from(spark, docs)
    assert ranking.bm25_rank_indexed(
        spark, path, q, "qid", "terms"
    ).count() > 0


def _doc_queries_from(spark, docs):
    from pyspark.sql import functions as F

    return docs.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("doc_id % 4 = 0 AND size(terms) >= 3")
