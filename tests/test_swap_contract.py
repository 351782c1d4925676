"""The cluster-side reader-during-swap contract (r9 missing #3),
pinned on both index families: a probe wrapped in ``probe_consistent``
that races a ``maintain_*_index`` staged swap returns a result
computed entirely against ONE layout — entirely-old or entirely-new —
or cleanly retries; never a mixed or erroring read. The ``_swapping``
intent marker brackets the rename window; a crashed writer's stray
marker is recovered by the next maintenance call."""

import numpy as np
import pytest
from pyspark.sql import types as T

from prefixtree_spark import probe_consistent
from prefixtree_spark.operators import ann, ranking

DIM = 8


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, DIM)) * 5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(15):
            v = c + rng.standard_normal(DIM) * 0.3
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _doc_queries(spark):
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        F.col("doc_id").alias("qid"),
        F.slice(
            F.regexp_extract_all("text", F.lit(r"\S+"), 0), 1, 3
        ).alias("terms"),
    ).where("doc_id % 41 = 0 AND size(terms) >= 3")


def test_bm25_probe_retries_across_concurrent_swap(spark, docs, tmp_path):
    """A maintenance swap completing between the probe's generation
    capture and its materialize must be detected (generation moved)
    and retried — the retry returns the entirely-NEW answer."""
    path = str(tmp_path / "bm25_swap")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    dead = [r.doc_id for r in docs.limit(2).collect()]
    ranking.delete_bm25_ids(spark, path, dead)
    q = _doc_queries(spark)
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            # the swap races the read: it lands AFTER probe_consistent
            # captured the generation, BEFORE the result materializes
            rep = ranking.maintain_bm25_index(spark, path)
            assert rep["tombstones_compacted"] == 2
        return ranking.bm25_rank_indexed(spark, path, q, "qid", "terms")

    out = probe_consistent(spark, path, fn)
    assert calls["n"] == 2  # first attempt discarded, one retry
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ranking.bm25_rank(
            docs.where(~docs.doc_id.isin(dead)), "doc_id", "text",
            q, "qid", "terms", idf="ratio",
        ).collect()
    }
    got = {(r.query_id, r.doc_id, r.rank) for r in out.collect()}
    assert got == want and got  # entirely-new, never mixed


def test_ivf_probe_retries_across_concurrent_swap(spark, vec_df, tmp_path):
    """The dense twin: a tombstone-fold swap mid-probe is detected and
    the retry answers from the post-swap layout."""
    path = str(tmp_path / "ivf_swap")
    ann.save_ivf_index(vec_df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=100)
    ann.delete_ivf_ids(spark, path, [0, 7])
    q = vec_df.where("vec_id IN (1, 20)")
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            rep = ann.maintain_ivf_index(spark, path, retrain_frac=0.9)
            assert rep["tombstones_compacted"] == 2
        idx = ann.load_ivf_index(spark, path)
        return ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=4
        )

    out = probe_consistent(spark, path, fn)
    assert calls["n"] == 2
    live = vec_df.where("vec_id NOT IN (0, 7)")
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", live, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {(r.query_id, r.vec_id, r.rank) for r in out.collect()}
    assert got == want and got


def test_swapping_marker_blocks_then_releases(spark, docs, tmp_path):
    """A probe attempted while the _swapping intent marker is up
    discards and retries; a marker that never clears (writer crashed
    mid-rename-window) raises the documented error instead of
    returning a possibly-mixed read — and the next maintenance call
    recovers the stray marker."""
    import os

    path = str(tmp_path / "bm25_marker")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    q = _doc_queries(spark)
    with open(os.path.join(path, "_swapping"), "w") as f:
        f.write("1")
    with pytest.raises(RuntimeError, match="swap"):
        probe_consistent(
            spark, path,
            lambda: ranking.bm25_rank_indexed(spark, path, q, "qid", "terms"),
            retries=1, wait_seconds=0.01,
        )
    # the next maintenance call (the single writer) clears the stray
    # marker even when it otherwise has nothing to do
    rep = ranking.maintain_bm25_index(spark, path)
    assert not rep["compacted"]
    assert not os.path.exists(os.path.join(path, "_swapping"))
    out = probe_consistent(
        spark, path,
        lambda: ranking.bm25_rank_indexed(spark, path, q, "qid", "terms"),
    )
    assert out.count() > 0


def test_probe_consistent_consume_releases_checkpoint(spark, docs, tmp_path):
    """r10 advice (medium): the checkpointed result a successful probe
    returns is invisible to unpersist() and GC — a scheduler wrapping
    every probe would pin one result set per call for the session
    lifetime. The consume= shape hands the result to the caller inside
    the call and releases the pinned blocks before returning; the
    no-consume shape pairs with the public release_checkpoint."""
    from prefixtree_spark import release_checkpoint

    import time

    path = str(tmp_path / "bm25_consume")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    q = _doc_queries(spark)
    sc = spark.sparkContext

    def _cached_ids():
        return {
            r.id()
            for r in sc._jsc.sc().getRDDStorageInfo()
            if r.numCachedPartitions() > 0
        }

    def _settles_to(base, deadline_s=15.0):
        # release_checkpoint's unpersist is non-blocking: under a
        # loaded suite the storage listing lags the call — poll
        end = time.time() + deadline_s
        while time.time() < end:
            extra = _cached_ids() - base
            if not extra:
                return True
            time.sleep(0.2)
        return False

    base = _cached_ids()
    rows = probe_consistent(
        spark, path,
        lambda: ranking.bm25_rank_indexed(spark, path, q, "qid", "terms"),
        consume=lambda df: df.collect(),
    )
    assert rows and _settles_to(base)  # consumed AND released
    # the caller-owned shape: blocks pinned until release_checkpoint
    out = probe_consistent(
        spark, path,
        lambda: ranking.bm25_rank_indexed(spark, path, q, "qid", "terms"),
    )
    assert len(out.collect()) == len(rows)
    assert len(_cached_ids() - base) == 1  # the pinned checkpoint
    release_checkpoint(out)
    assert _settles_to(base)


# ---- writer-writer exclusion: the maintenance lease (r11 verdict #3) ----


def test_maintenance_lease_excludes_second_writer(spark, docs, tmp_path):
    """Two maintainers may not run concurrently: while one holds the
    lease, the second raises MaintenanceLeaseHeld; after release, the
    second proceeds. Pinned via the public maintain_bm25_index."""
    from prefixtree_spark import MaintenanceLeaseHeld
    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    path = str(tmp_path / "bm25_lease")
    ranking.save_bm25_index(docs, "doc_id", "text", path, n_buckets=8,
                            idf="ratio")
    token = acquire_maintenance_lease(spark, path)
    with pytest.raises(MaintenanceLeaseHeld):
        ranking.maintain_bm25_index(spark, path)
    release_maintenance_lease(spark, path, token)
    rep = ranking.maintain_bm25_index(spark, path)
    assert "compacted" in rep
    import os

    assert not os.path.exists(os.path.join(path, "_maintenance_lease"))


def test_maintenance_lease_two_thread_race_single_winner(
    spark, vec_df, tmp_path
):
    """The race the lease exists for: N threads call maintain_ivf_index
    simultaneously on one layout. Exactly the losers raise
    MaintenanceLeaseHeld, no thread corrupts the layout, and the index
    still answers probes identically afterwards."""
    import threading

    from prefixtree_spark import MaintenanceLeaseHeld

    path = str(tmp_path / "ivf_lease_race")
    ann.save_ivf_index(vec_df, "vec_id", "embedding", path, n_cells=4)
    # fragment the layout so maintenance has real rename work to do
    for k in range(3):
        delta = vec_df.where(f"vec_id % 3 = {k}").selectExpr(
            "vec_id + 1000 * (%d + 1) as vec_id" % k, "embedding"
        )
        ann.append_ivf_index(spark, path, delta, "vec_id", "embedding")

    q = vec_df.limit(4).selectExpr("vec_id as qid", "embedding")
    idx = ann.load_ivf_index(spark, path)
    before = {
        (r.query_id, r.vec_id)
        for r in ann.cosine_topk_ivf_index(
            q, "qid", "embedding", idx, k=3
        ).collect()
    }

    results: list = [None] * 4
    held = []

    def run(i):
        try:
            results[i] = ann.maintain_ivf_index(spark, path)
        except MaintenanceLeaseHeld:
            held.append(i)
        except Exception as e:  # pragma: no cover - fail loudly
            results[i] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    winners = [r for r in results if isinstance(r, dict)]
    errors = [r for r in results if r is not None and not isinstance(r, dict)]
    assert not errors, errors
    assert len(winners) >= 1 and len(winners) + len(held) == 4
    # layout intact and consistent: a fresh load answers as before
    idx2 = ann.load_ivf_index(spark, path)
    after = {
        (r.query_id, r.vec_id)
        for r in ann.cosine_topk_ivf_index(
            q, "qid", "embedding", idx2, k=3
        ).collect()
    }
    assert after == before
    import os

    assert not os.path.exists(os.path.join(path, "_maintenance_lease"))


def test_maintenance_lease_stale_steal_and_fenced_release(spark, tmp_path):
    """A crashed maintainer's lease (older than ttl) is stolen; the
    crashed holder's late release is FENCED (it cannot delete the new
    owner's lease)."""
    import os
    import time

    from prefixtree_spark import MaintenanceLeaseHeld
    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    path = str(tmp_path / "lease_steal")
    os.makedirs(path)
    crashed = acquire_maintenance_lease(spark, path)
    # fresh lease: not stealable
    with pytest.raises(MaintenanceLeaseHeld):
        acquire_maintenance_lease(spark, path, ttl_s=3600)
    # age it past the ttl (mtime-based staleness)
    lease = os.path.join(path, "_maintenance_lease")
    old = time.time() - 100
    os.utime(lease, (old, old))
    stolen = acquire_maintenance_lease(spark, path, ttl_s=5)
    assert stolen != crashed
    # the crashed holder's release must not remove the new lease
    release_maintenance_lease(spark, path, crashed)
    assert os.path.exists(lease)
    release_maintenance_lease(spark, path, stolen)
    assert not os.path.exists(lease)


def test_maintenance_lease_concurrent_stealers_single_winner(spark, tmp_path):
    """r12 review #1: N maintainers racing to steal ONE stale lease —
    the rename-fenced steal admits exactly one winner, and no loser
    deletes the winner's fresh lease on its way out (the delete-based
    steal failed exactly this way)."""
    import os
    import threading
    import time

    from prefixtree_spark import MaintenanceLeaseHeld
    from prefixtree_spark._generation import acquire_maintenance_lease

    path = str(tmp_path / "lease_stampede")
    os.makedirs(path)
    lease = os.path.join(path, "_maintenance_lease")
    with open(lease, "w") as f:
        f.write("deadbeef" * 4)  # the crashed maintainer's token
    old = time.time() - 120
    os.utime(lease, (old, old))

    tokens: list = []
    held = []
    errors = []
    barrier = threading.Barrier(6)

    def run():
        barrier.wait()
        try:
            tokens.append(acquire_maintenance_lease(spark, path, ttl_s=10))
        except MaintenanceLeaseHeld:
            held.append(1)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors[:2]
    assert len(tokens) == 1 and len(held) == 5, (tokens, held)
    # the winner's fresh lease is intact and carries the winner's token
    with open(lease) as f:
        assert f.read() == tokens[0]


def test_maintenance_lease_three_actor_release_race(spark, tmp_path):
    """r12 verdict #6 + advice #3: stale holder A, stealer B, and a
    third claimant C racing through A's late release. The r12 release
    renamed EVERY late release aside, so C could claim inside the
    aside window (two live claims) and A's rename-back could clobber
    C's fresh lease with B's. The r13 read-in-place fence means A's
    release (token mismatch) returns without touching the file, so C
    must always see B's fresh lease and lose; exactly one live lease
    survives, carrying B's token."""
    import os
    import threading
    import time

    from prefixtree_spark import MaintenanceLeaseHeld
    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    path = str(tmp_path / "lease_three_actor")
    os.makedirs(path)
    lease = os.path.join(path, "_maintenance_lease")
    for _ in range(10):
        a = acquire_maintenance_lease(spark, path, ttl_s=5)
        old = time.time() - 100
        os.utime(lease, (old, old))
        b = acquire_maintenance_lease(spark, path, ttl_s=5)  # the steal
        c_claims: list = []
        c_errors: list = []
        barrier = threading.Barrier(2)

        def release_a(a=a):
            barrier.wait()
            release_maintenance_lease(spark, path, a)

        def claim_c():
            barrier.wait()
            for _ in range(5):
                try:
                    c_claims.append(
                        acquire_maintenance_lease(spark, path, ttl_s=5)
                    )
                    return
                except MaintenanceLeaseHeld:
                    pass
                except Exception as e:  # pragma: no cover
                    c_errors.append(e)
                    return

        threads = [
            threading.Thread(target=release_a),
            threading.Thread(target=claim_c),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not c_errors, c_errors
        # B's fresh lease must have blocked C every time, and A's late
        # release must not have removed or resurrected anything
        assert not c_claims, "third claimant won against a live lease"
        with open(lease) as f:
            assert f.read() == b
        release_maintenance_lease(spark, path, b)
        assert not os.path.exists(lease)
    # after the dust settles a fresh claim works
    c = acquire_maintenance_lease(spark, path, ttl_s=5)
    release_maintenance_lease(spark, path, c)


def test_refresh_maintenance_lease_heartbeats_and_fences(spark, tmp_path):
    """r12 advice #2: refresh pushes the TTL clock forward (a long run
    that heartbeats per phase keeps exclusion past its original ttl)
    and raises MaintenanceLeaseHeld when the lease was stolen mid-run."""
    import os
    import time

    import pytest as _pytest

    from prefixtree_spark import MaintenanceLeaseHeld, refresh_maintenance_lease
    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    path = str(tmp_path / "lease_refresh")
    os.makedirs(path)
    lease = os.path.join(path, "_maintenance_lease")
    token = acquire_maintenance_lease(spark, path, ttl_s=5)
    # age past the ttl — without a heartbeat the next claim would steal
    old = time.time() - 100
    os.utime(lease, (old, old))
    refresh_maintenance_lease(spark, path, token)
    assert os.path.getmtime(lease) > time.time() - 30  # clock restarted
    with _pytest.raises(MaintenanceLeaseHeld):
        acquire_maintenance_lease(spark, path, ttl_s=5)
    # steal it for real, then the overrun holder's refresh must fence
    os.utime(lease, (old, old))
    stolen = acquire_maintenance_lease(spark, path, ttl_s=5)
    with _pytest.raises(MaintenanceLeaseHeld):
        refresh_maintenance_lease(spark, path, token)
    release_maintenance_lease(spark, path, stolen)
    # absent lease (released under us) fences too
    with _pytest.raises(MaintenanceLeaseHeld):
        refresh_maintenance_lease(spark, path, token)


def test_lease_claim_tmp_corpse_gc(spark, tmp_path):
    """r12 advice #4: a claimant that crashes between fs.create(tmp)
    and the link/rename strands a .tmp-_maintenance_lease-<uuid> file;
    acquire-time GC must collect it once it is older than the ttl."""
    import os
    import time

    from prefixtree_spark._generation import (
        acquire_maintenance_lease,
        release_maintenance_lease,
    )

    path = str(tmp_path / "lease_tmp_gc")
    os.makedirs(path)
    corpse = os.path.join(path, ".tmp-_maintenance_lease-deadbeef01")
    with open(corpse, "w") as f:
        f.write("crashed-claimant-token")
    old = time.time() - 100
    os.utime(corpse, (old, old))
    fresh = os.path.join(path, ".tmp-_maintenance_lease-deadbeef02")
    with open(fresh, "w") as f:
        f.write("in-flight-claimant-token")
    token = acquire_maintenance_lease(spark, path, ttl_s=5)
    assert not os.path.exists(corpse)  # stale corpse collected
    assert os.path.exists(fresh)  # in-flight tmp (young) untouched
    release_maintenance_lease(spark, path, token)


def test_maintain_bm25_fences_stolen_lease_before_swap(spark, docs, tmp_path):
    """End-to-end fence: a locked maintenance body holding a token its
    layout's lease no longer carries must abort BEFORE mutating the
    layout (generation unchanged, no staged swap applied)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from prefixtree_spark import MaintenanceLeaseHeld
    from prefixtree_spark._generation import read_generation
    from prefixtree_spark.operators.ranking import (
        _maintain_bm25_index_locked,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_fence")
    corpus = docs.select("doc_id", "text").limit(50)
    save_bm25_index(corpus, "doc_id", "text", path, n_buckets=4)
    g0 = read_generation(path)
    # no lease file exists, so ANY token reads as stolen — the locked
    # body must raise before its staged swap lands
    with _pytest.raises(MaintenanceLeaseHeld):
        _maintain_bm25_index_locked(
            spark, path,
            rebuild_from=corpus.where(F.col("doc_id") % 2 == 0),
            _lease_token="not-the-lease-holder",
        )
    assert read_generation(path) == g0
