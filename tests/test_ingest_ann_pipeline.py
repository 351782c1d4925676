"""The composed exactly-once pipeline: streaming document ingest
(dedup + atomic appends) feeding an IVF vector index through
``sync_ivf_from_published``. Pins the round-8 integration contract:

  - re-delivered batches append NOTHING to the index (txn markers +
    per-table presence guards);
  - a crash between the corpus commit and the index append is healed
    by the next batch's sync (catch-up from committed segments);
  - full-probe search over the synced index == exact brute force over
    the streamed corpus, at every stage;
  - the maintenance policy retrains at the appended-fraction threshold
    and is a no-op right after;
  - the retrain swap is crash-recoverable (a complete staged rebuild
    left by a dead process is swapped in on the next maintain call).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators import ann
from prefixtree_spark.sources.io import read_published
from prefixtree_spark.streaming.ingest import ingest_batch, maintain_ingest

DIM = 8


def _mk_batch(spark, rows):
    """rows: [(doc_id, text, seed)] — embedding is a deterministic
    function of the seed so replays and twins agree bit-for-bit."""
    data = []
    for doc_id, text, seed in rows:
        rng = np.random.default_rng(seed)
        data.append(
            (doc_id, text, [float(x) for x in rng.standard_normal(DIM)])
        )
    return spark.createDataFrame(
        data, "doc_id long, text string, embedding array<double>"
    )


def _index_ids(spark, ipath):
    vec = sorted(
        r.vec_id for r in spark.read.parquet(f"{ipath}/vectors").collect()
    )
    post = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{ipath}/postings")
        .select("vec_id")
        .distinct()
        .collect()
    )
    return vec, post


def _probe_equals_exact(spark, root, ipath, k=3):
    """Full-probe (nprobe = n_cells) search over the index must equal
    exact brute-force cosine over the published corpus."""
    corpus = read_published(spark, root).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    q = corpus
    idx = ann.load_ivf_index(spark, ipath)
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=k, nprobe=len(idx.centroids)
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", corpus, "vec_id", "embedding", k=k
        ).collect()
    }
    assert got == want and got


ANN_OPTS = {"n_cells": 4, "sample_size": 500}


def test_ingest_feeds_index_replay_appends_nothing(spark, tmp_path):
    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "ivf")
    toks = [f"t{i}" for i in range(40)]
    b1 = _mk_batch(
        spark,
        [
            (1, " ".join(toks[0:10]), 1),
            (2, " ".join(toks[0:10]), 2),   # exact dup of 1 → rejected
            (3, " ".join(toks[10:20]), 3),
            (4, " ".join(toks[20:30]), 4),
        ],
    )
    n1 = ingest_batch(
        b1, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    assert n1 == 3
    vec, post = _index_ids(spark, ipath)
    assert vec == [1, 3, 4] and post == [1, 3, 4]
    _probe_equals_exact(spark, root, ipath)

    # replay batch 1 verbatim: corpus dedup rejects every row, and the
    # index sync finds nothing new — NO duplicate rows land anywhere
    n1r = ingest_batch(
        b1, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    assert n1r == 0
    assert _index_ids(spark, ipath) == (vec, post)

    # batch 2 extends both tables; near-dup of doc 3 is rejected and
    # its vector therefore never becomes probe-able
    b2 = _mk_batch(
        spark,
        [
            (5, " ".join(toks[10:20]), 5),  # exact dup of corpus 3
            (6, " ".join(toks[30:40]), 6),
        ],
    )
    n2 = ingest_batch(
        b2, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    assert n2 == 1
    vec, post = _index_ids(spark, ipath)
    assert vec == [1, 3, 4, 6] and post == [1, 3, 4, 6]
    _probe_equals_exact(spark, root, ipath)


def test_crash_between_corpus_commit_and_index_heals(spark, tmp_path):
    """Simulate the crash window the sync design exists for: batch 1
    commits documents but dies before the index append (modeled by
    ingesting WITHOUT the ann wiring). The NEXT batch's sync must
    catch the index up to the full corpus, not just its own rows."""
    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "ivf")
    toks = [f"t{i}" for i in range(30)]
    b1 = _mk_batch(spark, [(1, " ".join(toks[0:10]), 1),
                           (2, " ".join(toks[10:20]), 2)])
    ingest_batch(b1, root, "doc_id", "text", threshold=0.5)  # no ann: "crash"
    b2 = _mk_batch(spark, [(3, " ".join(toks[20:30]), 3)])
    ingest_batch(
        b2, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    vec, post = _index_ids(spark, ipath)
    assert vec == [1, 2, 3] and post == [1, 2, 3]
    _probe_equals_exact(spark, root, ipath)


def test_append_guards_heal_half_applied_and_skip_recorded(spark, tmp_path):
    """append_ivf_index(txn=...) unit contract: a recorded txn replays
    as a no-op via the marker; an UNRECORDED replay (marker lost) is
    absorbed by the per-table guards; a half-applied crash (vectors
    landed, postings did not) is healed table-by-table."""
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_txn")
    ann.save_ivf_index(
        df.where("vec_id < 20"), "vec_id", "embedding", path,
        n_cells=4, sample_size=100,
    )
    delta = df.where("vec_id >= 20")
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b1") == 10
    vec, post = _index_ids(spark, path)
    assert vec == list(range(30)) and post == list(range(30))
    # recorded replay: marker fast path, same answer, nothing written
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b1") == 10
    assert _index_ids(spark, path) == (vec, post)
    # unrecorded replay: delete the marker; guards must land nothing
    import os

    from prefixtree_spark.sources.io import _txn_marker_path

    os.remove(_txn_marker_path(path, "b1"))
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b1") == 0
    assert _index_ids(spark, path) == (vec, post)
    # half-applied crash: new rows present in vectors/ only (as if the
    # process died between the two writes) — the replay must post the
    # missing lists WITHOUT duplicating the vector rows
    d2 = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(30, 35)],
        "vec_id long, embedding array<double>",
    )
    d2.select(F.col("vec_id"), F.col("embedding").alias("cv")).write.mode(
        "append"
    ).parquet(f"{path}/vectors")
    assert ann.append_ivf_index(
        spark, path, d2, "vec_id", "embedding", txn="b2") == 5
    vec, post = _index_ids(spark, path)
    assert vec == list(range(35)) and post == list(range(35))
    # every vector appears EXACTLY once in vectors/ (no dup rows)
    counts = (
        spark.read.parquet(f"{path}/vectors")
        .groupBy("vec_id").count().where("count > 1").count()
    )
    assert counts == 0


def test_maintain_retrains_at_threshold_then_noop(spark, tmp_path):
    """The policy loop on the composed pipeline: appends past the
    fraction threshold trigger ONE retrain (stamping the new trained
    base), after which the same call is a no-op; search stays exact
    throughout."""
    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "ivf")
    toks = [f"t{i}" for i in range(200)]
    b1 = _mk_batch(
        spark,
        [(i, " ".join(toks[10 * i : 10 * i + 10]), i) for i in range(4)],
    )
    ingest_batch(
        b1, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    # appended fraction after this batch: 6/10 > 0.3 → retrain fires
    b2 = _mk_batch(
        spark,
        [(i, " ".join(toks[10 * i : 10 * i + 10]), i) for i in range(4, 10)],
    )
    ingest_batch(
        b2, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    rep = maintain_ingest(spark, root, ann_index_path=ipath)
    assert rep[f"{ipath}_retrained"] == 1
    _probe_equals_exact(spark, root, ipath)
    # the retrain re-stamped n_vectors: the same policy is now a no-op
    rep2 = maintain_ingest(spark, root, ann_index_path=ipath)
    assert rep2[f"{ipath}_retrained"] == 0
    _probe_equals_exact(spark, root, ipath)
    # and the watermark survived the retrain: a replayed batch still
    # appends nothing
    vec, post = _index_ids(spark, ipath)
    ingest_batch(
        b2, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    assert _index_ids(spark, ipath) == (vec, post)


def test_maintain_recovers_crashed_swap(spark, tmp_path):
    """A complete staged rebuild whose process died mid-swap is
    detected (staged meta present) and swapped in by the next
    maintain call — the index cannot be stranded inconsistent."""
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_swap")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=100)
    # stage a complete rebuild (different seed → different centroids),
    # as a retrain that crashed right before its swap would leave it
    ann.save_ivf_index(
        spark.read.parquet(f"{path}/vectors"), "vec_id", "cv",
        f"{path}/_rebuild", n_cells=4, sample_size=100, seed=7,
    )
    staged_meta = spark.read.parquet(f"{path}/_rebuild/meta").collect()[0]
    rep = ann.maintain_ivf_index(spark, path)
    assert rep["recovered"] is True
    import os

    assert not os.path.exists(f"{path}/_rebuild")
    # the staged layout is now live and searches exactly
    idx = ann.load_ivf_index(spark, path)
    assert len(idx.centroids) == staged_meta.n_cells
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            df, "vec_id", "embedding", idx, k=3, nprobe=4
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            df, "vec_id", "embedding", df, "vec_id", "embedding", k=3
        ).collect()
    }
    assert got == want
    # an INCOMPLETE stage (no meta) is garbage-collected, not swapped
    os.makedirs(f"{path}/_rebuild/vectors", exist_ok=True)
    rep2 = ann.maintain_ivf_index(spark, path)
    assert rep2["recovered"] is False
    assert not os.path.exists(f"{path}/_rebuild")


def test_reconcile_drops_corpus_deleted_vectors(spark, tmp_path):
    """The deletion half of index == corpus: COW-deleting documents
    from the published corpus leaves their vectors probe-able until
    maintenance reconciles — after which full-probe equals exact over
    the POST-delete corpus, the drift base is re-stamped, and a second
    reconcile is a no-op."""
    from prefixtree_spark.sources.io import delete_published

    root = str(tmp_path / "corpus")
    ipath = str(tmp_path / "ivf")
    toks = [f"t{i}" for i in range(80)]
    b1 = _mk_batch(
        spark,
        [(i, " ".join(toks[10 * i : 10 * i + 10]), i) for i in range(6)],
    )
    ingest_batch(
        b1, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    _probe_equals_exact(spark, root, ipath)
    delete_published(spark, root, "doc_id IN (1, 4)")
    # deleted docs still probe-able (documented lag) until maintenance
    vec, _ = _index_ids(spark, ipath)
    assert vec == [0, 1, 2, 3, 4, 5]
    rep = maintain_ingest(
        spark, root, ann_index_path=ipath, ann_reconcile_ids="doc_id"
    )
    assert rep[f"{ipath}_reconciled"] == 2
    vec, post = _index_ids(spark, ipath)
    assert vec == [0, 2, 3, 5] and post == [0, 2, 3, 5]
    _probe_equals_exact(spark, root, ipath)
    # idempotent: nothing left to reconcile; drift base re-stamped so
    # the shrink never reads as appended drift
    rep2 = maintain_ingest(
        spark, root, ann_index_path=ipath, ann_reconcile_ids="doc_id"
    )
    assert rep2[f"{ipath}_reconciled"] == 0
    assert rep2[f"{ipath}_retrained"] == 0
    # and the pipeline keeps working: a later batch syncs new vectors
    b2 = _mk_batch(spark, [(7, " ".join(toks[60:70]), 7)])
    ingest_batch(
        b2, root, "doc_id", "text", threshold=0.5,
        vec_col="embedding", ann_index_path=ipath, ann_opts=ANN_OPTS,
    )
    vec, _ = _index_ids(spark, ipath)
    assert vec == [0, 2, 3, 5, 7]
    _probe_equals_exact(spark, root, ipath)


def test_misconfigured_ann_sync_rejected_before_any_write(spark, tmp_path):
    """ann_index_path without vec_col must fail BEFORE the corpus
    commit: the old ordering published the documents and then raised,
    leaving a partial success whose replay is dedup-rejected — the
    batch's vectors stayed unsynced until someone noticed."""
    import os

    root = str(tmp_path / "corpus_cfg")
    b = _mk_batch(spark, [(1, "alpha beta gamma delta", 1)])
    with pytest.raises(ValueError, match="vec_col"):
        ingest_batch(
            b, root, "doc_id", "text", threshold=0.5,
            ann_index_path=str(tmp_path / "ivf_cfg"),
        )
    # nothing was published — the failed call left no corpus state
    assert not os.path.exists(root)


def test_maintain_ingest_update_aware_reconcile(spark, tmp_path):
    """maintain_ingest(ann_reconcile_with=(id, vec)) propagates
    UPDATED embeddings: an update_published that rewrites a document's
    vector gets the index row replaced at maintenance cadence — the
    full converge story from the pipeline entry point."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ann
    from prefixtree_spark.sources.io import read_published, update_published
    from prefixtree_spark.streaming.ingest import ingest_batch, maintain_ingest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    both = docs.select("doc_id", "text").join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    base = str(tmp_path / "ing")
    root, ipath = f"{base}/corpus", f"{base}/ivf"
    ingest_batch(
        both, root, "doc_id", "text", threshold=0.8, n=3,
        vec_col="embedding", ann_index_path=ipath,
        ann_opts={"n_cells": 8},
    )
    # rewrite one surviving doc's embedding in place (COW update)
    survivors = {r.doc_id for r in read_published(spark, root).select("doc_id").collect()}
    target = min(survivors)
    donor = max(survivors)
    donor_vec = [
        r.embedding for r in read_published(spark, root)
        .where(F.col("doc_id") == donor).select("embedding").collect()
    ][0]
    update_published(
        spark, root, f"doc_id = {target}",
        {"embedding": F.lit(donor_vec).cast("array<float>")},
    )
    rep = maintain_ingest(
        spark, root, ann_index_path=ipath,
        ann_reconcile_with=("doc_id", "embedding"),
    )
    assert rep[f"{ipath}_reconciled"] >= 1
    # the index now serves the corpus's value for the target id
    idx = ann.load_ivf_index(spark, ipath)
    stored = {
        r.vec_id: r.cv
        for r in spark.read.parquet(f"{ipath}/vectors")
        .where(F.col("vec_id") == target).collect()
    }
    assert [round(float(x), 5) for x in stored[target]] == [
        round(float(x), 5) for x in donor_vec
    ]


@pytest.mark.parametrize("crash_point", ["before_ann", "between_ann_bm25"])
def test_crash_between_followers_each_heals_independently(
    spark, tmp_path, monkeypatch, crash_point
):
    """r9 verdict #7 — the crash-point matrix for the TRIPLE-follower
    ingest (corpus + IVF + BM25, one batch feeding three stores
    exactly-once each): kill the pipeline BETWEEN follower syncs, then
    replay the same batch — every follower converges independently,
    and the final three-store state is indistinguishable from the
    never-crashed twin."""
    from prefixtree_spark.operators import ranking
    from prefixtree_spark.operators import ann as _annmod
    from prefixtree_spark.streaming import ingest as ingest_mod

    toks = [f"w{i}" for i in range(60)]
    rows1 = [
        (1, " ".join(toks[0:10]), 1),
        (2, " ".join(toks[10:20]), 2),
        (3, " ".join(toks[20:30]), 3),
    ]
    rows2 = [
        (4, " ".join(toks[30:40]), 4),
        (5, " ".join(toks[40:50]), 5),
    ]
    BM25_OPTS = {"n_buckets": 4, "idf": "ratio"}
    kw = dict(
        threshold=0.5, vec_col="embedding", ann_opts=ANN_OPTS,
        bm25_opts=BM25_OPTS,
    )

    # ---- the never-crashed twin -------------------------------------
    troot = str(tmp_path / "twin_corpus")
    tivf, tbm = str(tmp_path / "twin_ivf"), str(tmp_path / "twin_bm25")
    for rows in (rows1, rows2):
        ingest_batch(
            _mk_batch(spark, rows), troot, "doc_id", "text",
            ann_index_path=tivf, bm25_index_path=tbm, **kw,
        )

    # ---- the crashing pipeline --------------------------------------
    root = str(tmp_path / "corpus")
    ivf, bm = str(tmp_path / "ivf"), str(tmp_path / "bm25")
    ingest_batch(
        _mk_batch(spark, rows1), root, "doc_id", "text",
        ann_index_path=ivf, bm25_index_path=bm, **kw,
    )
    real_ann_sync = _annmod.sync_ivf_from_published
    real_bm_sync = ranking.sync_bm25_from_published

    def _boom(*a, **k):
        raise RuntimeError("simulated crash")

    if crash_point == "before_ann":
        # corpus committed, NEITHER follower synced
        monkeypatch.setattr(_annmod, "sync_ivf_from_published", _boom)
    else:
        # corpus committed, ANN synced, BM25 not
        monkeypatch.setattr(ranking, "sync_bm25_from_published", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(
            _mk_batch(spark, rows2), root, "doc_id", "text",
            ann_index_path=ivf, bm25_index_path=bm, **kw,
        )
    monkeypatch.setattr(_annmod, "sync_ivf_from_published", real_ann_sync)
    monkeypatch.setattr(ranking, "sync_bm25_from_published", real_bm_sync)

    # replay the SAME batch: corpus appends nothing (dedup), each
    # follower catches up from the committed segments
    n_replay = ingest_batch(
        _mk_batch(spark, rows2), root, "doc_id", "text",
        ann_index_path=ivf, bm25_index_path=bm, **kw,
    )
    assert n_replay == 0  # every doc already committed

    # ---- three-store equivalence with the twin ----------------------
    got_corpus = sorted(
        (r.doc_id, r.text) for r in read_published(spark, root).collect()
    )
    want_corpus = sorted(
        (r.doc_id, r.text) for r in read_published(spark, troot).collect()
    )
    assert got_corpus == want_corpus and len(got_corpus) == 5
    assert _index_ids(spark, ivf) == _index_ids(spark, tivf)
    _probe_equals_exact(spark, root, ivf)
    q = spark.createDataFrame(
        [(100, toks[30:33]), (101, toks[0:3])], "qid long, terms array<string>"
    )
    got_rank = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, bm, q, "qid", "terms").collect()
    }
    want_rank = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, tbm, q, "qid", "terms").collect()
    }
    assert got_rank == want_rank and got_rank
    # df/stats converged exactly (no double counting on the replay)
    for p, tp in ((bm, tbm),):
        g = spark.read.parquet(f"{p}/stats").groupBy().sum("n_docs", "total_len").collect()[0]
        w = spark.read.parquet(f"{tp}/stats").groupBy().sum("n_docs", "total_len").collect()[0]
        assert tuple(g) == tuple(w)


def test_maintain_ingest_bm25_reconcile_converges_cow_corpus(spark, tmp_path):
    """maintain_ingest(bm25_reconcile=True) — the sparse twin of the
    ann_reconcile_with test above: COW update_published rewrites a
    document's TEXT and delete_published removes another; maintenance
    reconciles the persisted BM25 layout incrementally (fingerprint
    diff, no full rebuild) and the stored probe ranks by the NEW text
    with the deleted doc gone."""
    from pyspark.sql import functions as F

    from prefixtree_spark.operators import ranking
    from prefixtree_spark.sources.io import (
        delete_published,
        read_published,
        update_published,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = str(tmp_path / "ingb")
    root, bpath = f"{base}/corpus", f"{base}/bm25"
    ingest_batch(
        docs.select("doc_id", "text"), root, "doc_id", "text",
        threshold=0.8, n=3, bm25_index_path=bpath,
        bm25_opts={"n_buckets": 8, "idf": "ratio"},
    )
    survivors = sorted(
        r.doc_id for r in read_published(spark, root).select("doc_id").collect()
    )
    target, dead = survivors[0], survivors[-1]
    update_published(
        spark, root, f"doc_id = {target}",
        {"text": F.lit("zzrewritten zzcorpus zztext")},
    )
    delete_published(spark, root, f"doc_id = {dead}")
    rep = maintain_ingest(spark, root, bm25_index_path=bpath,
                          bm25_reconcile=True)
    assert rep[f"{bpath}_reconciled"] >= 2
    assert not rep[f"{bpath}_rebuilt"]
    # probe == in-session BM25 over the LIVE corpus
    live = read_published(spark, root)
    q = spark.createDataFrame(
        [(1, ["zzrewritten", "zzcorpus"])], "qid long, terms array<string>"
    )
    got = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank_indexed(spark, bpath, q, "qid", "terms").collect()
    }
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            live, "doc_id", "text", q, "qid", "terms", idf="ratio"
        ).collect()
    }
    assert got == want and got == {(1, target, 1)}
    # the deleted doc is gone from the layout's doc list
    ids = {
        r.doc_id for r in spark.read.parquet(f"{bpath}/docs").collect()
    }
    assert dead not in ids and target in ids
    # second maintenance: converged no-op
    rep2 = maintain_ingest(spark, root, bm25_index_path=bpath,
                           bm25_reconcile=True)
    assert rep2[f"{bpath}_reconciled"] == 0


def test_recovery_swap_clears_marker_before_maintenance_body(
    spark, tmp_path, monkeypatch
):
    """r10 advice: the recovery swap at the top of maintain_ivf_index
    must bump the generation and clear the _swapping marker
    IMMEDIATELY (mirroring ranking's _finish_swap), not hold the
    marker through the arbitrarily long count/reconcile/rebuild jobs
    that follow — probe_consistent's bounded retries would exhaust
    and blame a crashed swap while maintenance is healthy."""
    import os

    from prefixtree_spark._generation import read_generation

    rng = np.random.default_rng(23)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_rec_marker")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=100)
    # a complete staged rebuild + the stray marker a crash mid-swap
    # leaves behind
    ann.save_ivf_index(
        spark.read.parquet(f"{path}/vectors"), "vec_id", "cv",
        f"{path}/_rebuild", n_cells=4, sample_size=100, seed=7,
    )
    with open(os.path.join(path, "_swapping"), "w") as f:
        f.write("1")
    g0 = read_generation(path)
    seen = {}
    real_stats = ann._partition_dir_stats

    def probing_stats(*a, **kw):
        # first call in maintain runs right after the recovery block:
        # the marker must already be down and the generation bumped
        seen.setdefault("marker_up", os.path.exists(f"{path}/_swapping"))
        seen.setdefault("gen", read_generation(path))
        return real_stats(*a, **kw)

    monkeypatch.setattr(ann, "_partition_dir_stats", probing_stats)
    rep = ann.maintain_ivf_index(spark, path)
    assert rep["recovered"] is True
    assert seen["marker_up"] is False
    assert seen["gen"] > g0
    assert not os.path.exists(f"{path}/_swapping")
    # exactly ONE bump for one layout change (r11 review: recovery in
    # the end-of-call bump condition made replicas reload twice)
    assert read_generation(path) == seen["gen"]


def test_compact_recovery_marks_before_mutating_live_postings(
    spark, tmp_path, monkeypatch
):
    """r11 review (second pass): a compactor that crashed AFTER its
    staged write committed but BEFORE it raised the _swapping marker
    leaves a complete postings_compact stage and NO marker. The next
    maintain call's recovery must raise the marker before its
    delete+rename of the live postings dir — an unmarked mutation is
    a mixed-read window for probes whose generation check also passes
    (the recovery bump lands only after the rename)."""
    import os
    import shutil as _sh

    rng = np.random.default_rng(29)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_compact_rec")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=100)
    # the crash artifact: a complete committed stage, marker DOWN
    _sh.copytree(f"{path}/postings", f"{path}/postings_compact")
    if not os.path.exists(f"{path}/postings_compact/_SUCCESS"):
        open(f"{path}/postings_compact/_SUCCESS", "w").close()
    assert not os.path.exists(f"{path}/_swapping")
    seen = {}
    real_bump = ann._bump_ivf_generation

    def probing_bump(sp, p):
        # the recovery bump runs right after the rename: the marker
        # must be UP here (raised before the delete), proving the
        # mutation window was bracketed
        seen.setdefault("marker_up_at_bump", os.path.exists(
            f"{path}/_swapping"
        ))
        return real_bump(sp, p)

    monkeypatch.setattr(ann, "_bump_ivf_generation", probing_bump)
    rep = ann.maintain_ivf_index(spark, path)
    assert rep["recovered"] is True
    assert seen["marker_up_at_bump"] is True
    assert not os.path.exists(f"{path}/_swapping")
    assert not os.path.exists(f"{path}/postings_compact")
    # the recovered layout still searches exactly
    idx = ann.load_ivf_index(spark, path)
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            df, "vec_id", "embedding", idx, k=3, nprobe=4
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            df, "vec_id", "embedding", df, "vec_id", "embedding", k=3
        ).collect()
    }
    assert got == want
