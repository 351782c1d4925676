"""Embedding similarity tests: exact top-k vs numpy, LSH recall on
clustered data, near-dup detection of planted duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prefixtree_spark.operators import ann

DIM = 16


def _vec_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )


@pytest.fixture(scope="module")
def clustered(spark):
    """5 well-separated clusters of 20 vectors each + planted near-dups."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((5, DIM)) * 5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            v = c + rng.standard_normal(DIM) * 0.3
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    # planted near-duplicate of vector 0
    v0 = np.array(rows[0][1])
    rows.append((vid, [float(np.float32(x)) for x in v0 + 0.001]))
    df = spark.createDataFrame(rows, _vec_schema())
    return df, rows


def _numpy_topk(rows, qids, k):
    m = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    out = {}
    for q in qids:
        cos = (m @ m[q]) / (norms * norms[q])
        order = sorted(
            (i for i in range(len(rows)) if i != q),
            key=lambda i: (-cos[i], i),
        )
        out[q] = order[:k]
    return out


def test_cosine_topk_exact(spark, clustered):
    df, rows = clustered
    qids = [0, 25, 50]
    q = df.where(df.vec_id.isin(qids))
    got = {}
    for r in ann.cosine_topk(q, "vec_id", "embedding", df, "vec_id", "embedding", k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    exp = _numpy_topk(rows, qids, 5)
    for qid in qids:
        assert [v for _, v in sorted(got[qid])] == exp[qid]


def test_lsh_recall_on_clustered(spark, clustered):
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    got = {}
    res = ann.cosine_topk_lsh(
        q, "vec_id", "embedding", df, "vec_id", "embedding",
        k=5, dim=DIM, n_planes=8, n_tables=12,
    ).collect()
    for r in res:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    exp = _numpy_topk(rows, qids, 5)
    hits = sum(len(got.get(q, set()) & set(exp[q])) for q in qids)
    recall = hits / (5 * len(qids))
    assert recall >= 0.9, f"LSH recall {recall} too low on clustered data"


def test_ivf_recall_on_clustered(spark, clustered):
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    got = {}
    res = ann.cosine_topk_ivf(
        q, "vec_id", "embedding", df, "vec_id", "embedding",
        k=5, n_cells=10, nprobe=3,
    ).collect()
    for r in res:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    exp = _numpy_topk(rows, qids, 5)
    hits = sum(len(got.get(q, set()) & set(exp[q])) for q in qids)
    recall = hits / (5 * len(qids))
    assert recall >= 0.9, f"IVF recall {recall} too low on clustered data"


def test_ivf_recall_survives_sorted_corpus_with_small_sample(spark, clustered):
    """The fixture is ordered by cluster; a .limit()-based trainer with
    sample_size=40 would only ever see the first 2 of 5 clusters and
    recall collapses for queries in the unseen ones. Seeded random
    sampling must keep recall high regardless of corpus order."""
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    got = {}
    res = ann.cosine_topk_ivf(
        q, "vec_id", "embedding", df, "vec_id", "embedding",
        k=5, n_cells=10, nprobe=3, sample_size=40,
    ).collect()
    for r in res:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    exp = _numpy_topk(rows, qids, 5)
    hits = sum(len(got.get(q, set()) & set(exp[q])) for q in qids)
    recall = hits / (5 * len(qids))
    assert recall >= 0.9, f"IVF recall {recall} too low with small sample on sorted corpus"


def test_ivf_empty_corpus(spark, clustered):
    df, _ = clustered
    empty = df.limit(0)
    q = df.where(df.vec_id < 3)
    assert ann.cosine_topk_ivf(
        q, "vec_id", "embedding", empty, "vec_id", "embedding", k=5
    ).count() == 0


def test_cosine_topk_empty_queries(spark, clustered):
    df, _ = clustered
    assert ann.cosine_topk(
        df.limit(0), "vec_id", "embedding", df, "vec_id", "embedding", k=5
    ).count() == 0


def test_embedding_near_dup_finds_planted(spark, clustered):
    df, rows = clustered
    dup_id = len(rows) - 1
    pairs = {
        (r.id1, r.id2)
        for r in ann.embedding_near_dup(
            df, "vec_id", "embedding", threshold=0.999, dim=DIM
        ).collect()
    }
    assert (0, dup_id) in pairs
    # anything at >= 0.999 must be within-cluster
    assert all(abs(a - b) <= 20 or b == dup_id for a, b in pairs)


def test_cosine_topk_chunked_matches_unchunked(spark, clustered):
    """Query set >> chunk size: the chunked bounded-broadcast path must
    return exactly the single-collect result (round-2 verdict #1)."""
    df, rows = clustered
    qids = list(range(0, 100, 2))  # 50 queries
    q = df.where(df.vec_id.isin(qids))
    one = {
        (r.query_id, r.rank, r.vec_id)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    chunked = {
        (r.query_id, r.rank, r.vec_id)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5,
            query_chunk_rows=7,
        ).collect()
    }
    assert chunked == one
    exp = _numpy_topk(rows, qids, 5)
    got = {}
    for qid, rank, vid in chunked:
        got.setdefault(qid, []).append((rank, vid))
    for qid in qids:
        assert [v for _, v in sorted(got[qid])] == exp[qid]


def test_cosine_topk_tie_heavy_duplicates(spark):
    """More identical vectors than the 2k prefilter pad, all tied at
    the boundary: the tie-aware per-batch selection must keep them all
    so the exact rank picks the LOWEST vec_ids (round-2 advice). With
    an arbitrary argpartition cut this returns the wrong id set."""
    base = [1.0, 0.0, 0.5]
    other = [0.0, 1.0, 0.0]
    rows = [(i, base) for i in range(40)] + [(100 + i, other) for i in range(5)]
    df = spark.createDataFrame(rows, _vec_schema())
    q = spark.createDataFrame([(999, base)], _vec_schema())
    got = [
        (r.rank, r.vec_id)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=10
        ).collect()
    ]
    # 40 duplicates tie at cosine 1.0 > pad=20; exact order is vec_id asc
    assert sorted(got) == [(i + 1, i) for i in range(10)]


def test_ivf_replicated_postings_no_duplicate_ranks(spark, clustered):
    """n_replicas > 1 lets a (query, vector) pair meet in several
    probed cells; the result must still have each vec_id at most once
    per query and contiguous ranks 1..k."""
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    res = ann.cosine_topk_ivf(
        q, "vec_id", "embedding", df, "vec_id", "embedding",
        k=5, n_cells=10, nprobe=3, n_replicas=3,
    ).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for qid, pairs in got.items():
        ranks = sorted(p[0] for p in pairs)
        assert ranks == list(range(1, len(pairs) + 1)), f"ranks broken for {qid}"
        vids = [p[1] for p in pairs]
        assert len(vids) == len(set(vids)), f"duplicate vec_id for {qid}"


def test_ivf_replicas_monotone_recall(spark):
    """On a near-uniform corpus (worst case for IVF), replicated
    postings must not lose candidates: recall(n_replicas=2) >=
    recall(n_replicas=1) with the same centroids/probes, and the
    replicated candidate set is a superset per query."""
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, _vec_schema())
    qids = list(range(0, 400, 50))
    q = df.where(df.vec_id.isin(qids))
    exp = _numpy_topk(rows, qids, 5)

    def run(reps):
        res = ann.cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, n_cells=16, nprobe=2, n_replicas=reps,
        ).collect()
        got = {}
        for r in res:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(qq, set()) & set(exp[qq])) for qq in qids)
        return got, hits / (5 * len(qids))

    got1, r1 = run(1)
    got2, r2 = run(2)
    assert r2 >= r1, f"replicas reduced recall: {r2} < {r1}"


def test_kmeans_fit_recovers_clusters_and_feeds_ivf(spark):
    """Distributed Lloyd's: per-partition partial sums, no shuffle.
    On a well-separated corpus the trained centroids must (a) give
    near-pure assignments and (b) drive cosine_topk_ivf to the exact
    top-k at a narrow probe width."""
    import numpy as np

    from prefixtree_spark.operators.ann import (
        cosine_topk,
        cosine_topk_ivf,
        kmeans_fit,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 6, 600)
    x = centers[labels] + 0.15 * rng.standard_normal((600, 16))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(5)

    cent = kmeans_fit(df, "embedding", 6, iters=15, seed=3)
    assert cent.shape == (6, 16)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    # purity: each true cluster maps dominantly to one learned cell
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assign = np.argmax(xn @ cent.T, axis=1)
    purity = sum(
        np.bincount(assign[labels == c]).max() for c in range(6)
    ) / len(x)
    assert purity > 0.95

    q = df.where("vec_id % 60 = 0")
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(q, "vec_id", "embedding", df, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, n_cells=6, nprobe=2, centroids=cent,
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9


def test_ivf_index_roundtrip_matches_per_call(spark, clustered, tmp_path):
    """save_ivf_index + cosine_topk_ivf_index must return EXACTLY the
    per-call cosine_topk_ivf results when both use the same trained
    centroids and replica count — the warm path changes cost, never
    answers (the vector BUILDINDEX-reuse contract)."""
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    for n_replicas in (1, 2):
        path = str(tmp_path / f"ivf_r{n_replicas}")
        cent = ann.kmeans_fit(df, "embedding", 10, sample_size=200)
        ann.save_ivf_index(
            df, "vec_id", "embedding", path,
            n_replicas=n_replicas, centroids=cent,
        )
        idx = ann.load_ivf_index(spark, path)
        assert idx.n_replicas == n_replicas
        warm = {
            (r.query_id, r.vec_id, r.rank)
            for r in ann.cosine_topk_ivf_index(
                q, "vec_id", "embedding", idx, k=5, nprobe=3
            ).collect()
        }
        percall = {
            (r.query_id, r.vec_id, r.rank)
            for r in ann.cosine_topk_ivf(
                q, "vec_id", "embedding", df, "vec_id", "embedding",
                k=5, n_cells=10, nprobe=3, n_replicas=n_replicas,
                centroids=cent,
            ).collect()
        }
        assert warm == percall and warm


def test_ivf_index_postings_partitioned_by_cell(spark, clustered, tmp_path):
    """The saved postings layout must be hive-partitioned on cell so
    probing few cells prunes the scan to those directories."""
    import os

    df, _ = clustered
    path = str(tmp_path / "ivf_layout")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=10,
                       sample_size=200)
    subdirs = [d for d in os.listdir(f"{path}/postings") if d.startswith("cell=")]
    assert len(subdirs) >= 2
    idx = ann.load_ivf_index(spark, path)
    # IVF-FLAT inverted lists: each posting row carries the full
    # vector, so a probe is one cell-pruned scan with no corpus join
    assert set(idx.postings.columns) == {"vec_id", "cv", "cell"}
    assert set(idx.vectors.columns) == {"vec_id", "cv"}


def test_ivf_index_probed_scan_partition_pruned(spark, clustered, tmp_path):
    """The warm query plan must prune the postings scan to the PROBED
    cell directories statically (literal IN in PartitionFilters), not
    rely on dynamic partition pruning kicking in — a query probing 2 of
    10 cells that lists all 10 directories is the wrong plan at scale."""
    df, _ = clustered
    path = str(tmp_path / "ivf_pruned")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=10,
                       sample_size=200)
    idx = ann.load_ivf_index(spark, path)
    q = df.where(df.vec_id.isin([0, 1]))
    out = ann.cosine_topk_ivf_index(q, "vec_id", "embedding", idx, k=5,
                                    nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the postings scan is the only one partitioned on cell; its
    # partition filter must carry the literal IN over the probed cells
    # (Location paths are truncated in toString, so match the filter)
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters: [cell" in ln
    ]
    assert scan_lines, f"no cell-partition-filtered scan:\n{plan}"
    assert any(" IN (" in ln for ln in scan_lines), scan_lines
    # and the answers still match the per-call plan (pruning changed
    # cost, not results)
    cent = idx.centroids
    percall = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, n_cells=10, nprobe=2, centroids=cent,
        ).collect()
    }
    warm = {(r.query_id, r.vec_id, r.rank) for r in out.collect()}
    assert warm == percall and warm


def test_ivf_index_empty_query_batch(spark, clustered, tmp_path):
    """Zero queries → zero probed cells → empty result with the right
    schema, no full-postings scan."""
    df, _ = clustered
    path = str(tmp_path / "ivf_emptyq")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=10,
                       sample_size=200)
    idx = ann.load_ivf_index(spark, path)
    out = ann.cosine_topk_ivf_index(
        df.where("vec_id < 0"), "vec_id", "embedding", idx, k=5, nprobe=2
    )
    assert out.columns == ["query_id", "vec_id", "rank"]
    assert out.count() == 0


def test_int8_quantize_error_bound(spark, clustered):
    """Dequantized values must sit within half a quantization step
    (scales[d]/254) of the originals — the bound the prefilter-recall
    argument in cosine_topk_int8's docstring rests on."""
    df, rows = clustered
    scales = ann.int8_scales(df, "embedding")
    assert scales.shape == (DIM,) and (scales > 0).all()
    q8 = {r.vec_id: r.qv8 for r in
          ann.quantize_embeddings(df, "vec_id", "embedding", scales).collect()}
    step = scales / 127.0
    for vid, vec in rows:
        deq = np.array(q8[vid], dtype=np.float64) * step
        err = np.abs(deq - np.array(vec, dtype=np.float64))
        assert (err <= scales / 254.0 + 1e-12).all()
        assert max(abs(v) for v in q8[vid]) <= 127


def test_int8_topk_matches_exact(spark, clustered):
    """int8 prefilter + exact rerank returns the identical (query,
    neighbor, rank) set as the exact path on the clustered fixture."""
    df, rows = clustered
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_int8(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    assert got == exact and got


def test_int8_topk_single_partition_small_pad(spark, clustered):
    """Force ONE corpus partition (so the prefilter is genuinely
    selective: pad=10 of 101 vectors survive) and check the true top-5
    still comes out exactly — quantization noise must not evict true
    neighbors on well-separated data."""
    df, rows = clustered
    qids = [0, 50]
    dfp = df.repartition(1)
    q = df.where(df.vec_id.isin(qids))
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_int8(
            q, "vec_id", "embedding", dfp, "vec_id", "embedding",
            k=5, pad_factor=2,
        ).collect()
    }
    assert got == exact


def test_ivf_append_matches_full_rebuild(spark, clustered, tmp_path):
    """append_ivf_index with a frozen quantizer must serve the same
    answers as save_ivf_index over the union corpus with the same
    centroids — the add_words contract, vector form."""
    df, rows = clustered
    base = df.where("vec_id < 80")
    delta = df.where("vec_id >= 80")
    cent = ann.kmeans_fit(df, "embedding", 10, sample_size=200)
    inc_path = str(tmp_path / "ivf_inc")
    full_path = str(tmp_path / "ivf_full")
    ann.save_ivf_index(base, "vec_id", "embedding", inc_path,
                       n_replicas=2, centroids=cent)
    n = ann.append_ivf_index(spark, inc_path, delta, "vec_id", "embedding")
    assert n == delta.count()
    ann.save_ivf_index(df, "vec_id", "embedding", full_path,
                       n_replicas=2, centroids=cent)
    qids = [0, 25, 85]
    q = df.where(df.vec_id.isin(qids))
    idx_inc = ann.load_ivf_index(spark, inc_path)
    idx_full = ann.load_ivf_index(spark, full_path)
    inc = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx_inc, k=5, nprobe=3
        ).collect()
    }
    full = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx_full, k=5, nprobe=3
        ).collect()
    }
    assert inc == full and inc
    # appended vectors are findable: 85's nearest cluster-mates rank
    assert any(r[0] == 85 for r in inc)


def test_ivf_append_empty_delta_noop(spark, clustered, tmp_path):
    df, _ = clustered
    path = str(tmp_path / "ivf_noop")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=10,
                       sample_size=200)
    before = spark.read.parquet(f"{path}/vectors").count()
    assert ann.append_ivf_index(
        spark, path, df.where("vec_id < 0"), "vec_id", "embedding") == 0
    assert spark.read.parquet(f"{path}/vectors").count() == before


def test_int8_zero_quantized_rows_not_candidates_starved(spark):
    """Outlier-dominated scales quantize small-norm vectors to all-zero;
    those rows must neither evict true neighbors from the prefilter
    boundary (the old NaN->+inf mapping did, with >= pad such rows in a
    batch) nor be dropped — int8 output must equal the exact path."""
    rng = np.random.default_rng(11)
    rows = [(0, [float(1000.0)] * DIM)]  # outlier dominating every scale
    # 40 small vectors that quantize to exactly zero (|x| < scale/254)
    for i in range(1, 41):
        rows.append((i, [float(x) for x in rng.uniform(-1, 1, DIM)]))
    # 5 mid-magnitude vectors, the true neighbors of the query
    for i in range(41, 46):
        rows.append((i, [float(50.0 + i)] * DIM))
    df = spark.createDataFrame(rows, _vec_schema()).repartition(1)
    q = df.where("vec_id = 45")
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_int8(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, pad_factor=2,
        ).collect()
    }
    assert got == exact and got


def test_int8_prestored_quantized_corpus(spark, clustered):
    """Passing a stored quantize_embeddings output (the 4x-IO path)
    returns the same answers as deriving it per call."""
    df, rows = clustered
    qids = [0, 50]
    q = df.where(df.vec_id.isin(qids))
    scales = ann.int8_scales(df, "embedding")
    stored = ann.quantize_embeddings(df, "vec_id", "embedding", scales)
    a = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_int8(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, scales=scales, quantized=stored,
        ).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_int8(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    assert a == b and a


def test_int8_empty_corpus_returns_empty(spark, clustered):
    df, _ = clustered
    q = df.where("vec_id = 0")
    empty = df.where("vec_id < 0")
    out = ann.cosine_topk_int8(
        q, "vec_id", "embedding", empty, "vec_id", "embedding", k=5
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "rank"]


# -- product quantization ----------------------------------------------------


def test_pq_fit_shapes_and_determinism(spark, clustered):
    df, rows = clustered
    b1 = ann.pq_fit(df, "embedding", m=4, sample_size=200, seed=3)
    b2 = ann.pq_fit(df, "embedding", m=4, sample_size=200, seed=3)
    assert b1.shape == (4, min(256, 101), DIM // 4)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError, match="not divisible"):
        ann.pq_fit(df, "embedding", m=5)


def test_pq_encode_codes_are_nearest_centroids(spark, clustered):
    """Each stored byte must be the argmin-distance centroid of its
    subspace for the NORMALIZED vector; pq_zero flags exactly the
    zero-norm rows."""
    df, rows = clustered
    books = ann.pq_fit(df, "embedding", m=4, sample_size=200)
    got = {r.vec_id: r.pq for r in
           ann.pq_encode(df, "vec_id", "embedding", books).collect()}
    dsub = DIM // 4
    for vid, vec in rows[:10]:
        x = np.array(vec, dtype=np.float32)
        x = x / np.linalg.norm(x)
        codes = np.frombuffer(got[vid], dtype=np.uint8)
        for j in range(4):
            xj = x[j * dsub : (j + 1) * dsub]
            d = ((books[j].astype(np.float32) - xj[None, :]) ** 2).sum(axis=1)
            assert codes[j] == int(np.argmin(d))


def test_pq_topk_matches_exact(spark, clustered):
    """PQ prefilter + exact rerank returns the identical (query,
    neighbor, rank) set as the exact path on the clustered fixture."""
    df, rows = clustered
    q = df.where(df.vec_id.isin([0, 25, 50, 75]))
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_pq(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5, m=4
        ).collect()
    }
    assert got == exact and got


def test_pq_topk_single_partition_selective_pad(spark, clustered):
    """One corpus partition, pad=10 of 101 vectors: codebook error must
    not evict true neighbors on well-separated data."""
    df, rows = clustered
    q = df.where(df.vec_id.isin([0, 50]))
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_pq(
            q, "vec_id", "embedding", df.repartition(1), "vec_id", "embedding",
            k=5, m=4, pad_factor=2,
        ).collect()
    }
    assert got == exact and got


def test_pq_reconstructed_zero_rows_reach_rerank(spark):
    """Adversarial codebooks whose zero centroid wins every subspace
    make EVERY corpus row reconstruct to the zero vector (NaN
    approximate score). Such rows must be candidate-preserved for the
    exact rerank, not silently lose the boundary — output must still
    equal the exact path."""
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(30)]
    df = spark.createDataFrame(rows, _vec_schema()).repartition(1)
    q = df.where("vec_id = 5")
    m, dsub = 4, DIM // 4
    # two centroids per subspace: zeros (nearest to any unit subvector)
    # and a far-away constant — every code decodes to the zero vector
    books = np.zeros((m, 2, dsub))
    books[:, 1, :] = 100.0
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_pq(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, codebooks=books, pad_factor=2,
        ).collect()
    }
    assert got == exact and got


def test_pq_prestored_codes_equal_per_call(spark, clustered):
    """Stored pq_encode output (the 16x-scan-cut path) must give the
    same result as per-call encoding with the same codebooks."""
    df, rows = clustered
    books = ann.pq_fit(df, "embedding", m=4, sample_size=200)
    codes = ann.pq_encode(df, "vec_id", "embedding", books)
    q = df.where(df.vec_id.isin([0, 50]))
    a = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_pq(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, codebooks=books,
        ).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_pq(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, codebooks=books, codes=codes,
        ).collect()
    }
    assert a == b and a


def test_stored_prefilter_coverage_guard(spark, clustered):
    """A stored quantized/codes table that doesn't cover the corpus 1:1
    is a silent recall hole (appended-but-not-re-encoded vectors never
    become candidates; phantom extra rows steal prefilter slots) — both
    paths must fail fast, and verify_coverage=False must opt out."""
    import pytest

    df, _ = clustered
    q = df.where(df.vec_id.isin([0]))
    scales = ann.int8_scales(df, "embedding")
    stored = ann.quantize_embeddings(df, "vec_id", "embedding", scales)
    missing = stored.where("vec_id % 7 != 0")
    with pytest.raises(ValueError, match="cover the corpus exactly"):
        ann.cosine_topk_int8(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, scales=scales, quantized=missing,
        )
    books = ann.pq_fit(df, "embedding", m=4, sample_size=200)
    codes = ann.pq_encode(df, "vec_id", "embedding", books)
    extra = codes.unionByName(codes.limit(3))
    with pytest.raises(ValueError, match="cover the corpus exactly"):
        ann.cosine_topk_pq(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=5, codebooks=books, codes=extra,
        )
    # opt-out still runs (subset recall loss is then the caller's call)
    out = ann.cosine_topk_int8(
        q, "vec_id", "embedding", df, "vec_id", "embedding",
        k=5, scales=scales, quantized=missing, verify_coverage=False,
    )
    assert out.count() == 5


def test_ivf_pq_index_save_load_and_lossless_composition(spark, clustered, tmp_path):
    """save_ivf_index(pq_m=) persists codebooks + per-vector codes in
    the cell-partitioned postings; with every cell probed and a
    generous pad the IVF-PQ search equals the exact-rerank IVF-index
    path (the prefilter is lossless at that setting)."""
    df, rows = clustered
    path = str(tmp_path / "ivfpq")
    ann.save_ivf_index(
        df, "vec_id", "embedding", path, n_cells=8, pq_m=4, seed=7
    )
    idx = ann.load_ivf_index(spark, path)
    assert idx.codebooks is not None and idx.codebooks.shape[0] == 4
    assert "pq" in idx.postings.columns
    q = df.where(df.vec_id.isin([0, 50]))
    a = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_pq(
            q, "vec_id", "embedding", idx, k=5, nprobe=8, pad_factor=50
        ).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=8
        ).collect()
    }
    assert a == b and a


def test_ivf_pq_selective_probe_recall(spark, clustered, tmp_path):
    """Selective probing (nprobe=2 of 8 cells) on well-separated
    clusters keeps high recall against the exact brute-force oracle."""
    df, rows = clustered
    path = str(tmp_path / "ivfpq_sel")
    ann.save_ivf_index(
        df, "vec_id", "embedding", path, n_cells=8, pq_m=4, seed=7
    )
    idx = ann.load_ivf_index(spark, path)
    qids = [0, 25, 50, 75]
    q = df.where(df.vec_id.isin(qids))
    exact = _numpy_topk(rows, qids, 5)
    got = {}
    for r in ann.cosine_topk_ivf_pq(
        q, "vec_id", "embedding", idx, k=5, nprobe=2
    ).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(qid, set()) & set(exact[qid])) for qid in qids)
    assert hits / (5 * len(qids)) >= 0.8


def test_ivf_pq_append_keeps_codes_searchable(spark, clustered, tmp_path):
    """append_ivf_index on a PQ layout encodes the delta with the
    FROZEN codebooks; an appended exact twin of a query vector must
    surface at rank 1."""
    import numpy as np

    df, rows = clustered
    path = str(tmp_path / "ivfpq_app")
    ann.save_ivf_index(
        df, "vec_id", "embedding", path, n_cells=8, pq_m=4, seed=7
    )
    twin = spark.createDataFrame(
        [(9000, rows[0][1])], df.schema
    )
    assert ann.append_ivf_index(spark, path, twin, "vec_id", "embedding") == 1
    idx = ann.load_ivf_index(spark, path)
    q = df.where(df.vec_id == 0)
    top = ann.cosine_topk_ivf_pq(
        q, "vec_id", "embedding", idx, k=3, nprobe=3
    ).collect()
    assert (0, 9000, 1) in {(r.query_id, r.vec_id, r.rank) for r in top}


def test_ivf_pq_requires_pq_layout(spark, clustered, tmp_path):
    import pytest

    df, _ = clustered
    path = str(tmp_path / "ivf_plain")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4, seed=7)
    idx = ann.load_ivf_index(spark, path)
    assert idx.codebooks is None
    q = df.where(df.vec_id == 0)
    with pytest.raises(ValueError, match="pq_m"):
        ann.cosine_topk_ivf_pq(q, "vec_id", "embedding", idx, k=3)


def test_ivf_index_empty_query_batch_keeps_stored_id_type(spark, tmp_path):
    """String vec_ids: the empty-probed early return must carry vec_id
    in the postings' STORED type (not a cast of the cell column), so an
    empty batch's frame unions cleanly with a live batch's."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    rows = [(f"doc-{i}", [float(x) for x in rng.normal(size=8)])
            for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    path = str(tmp_path / "ivf_strid")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=80)
    idx = ann.load_ivf_index(spark, path)
    empty = ann.cosine_topk_ivf_index(
        df.where(F.lit(False)), "vec_id", "embedding", idx, k=3, nprobe=2
    )
    live = ann.cosine_topk_ivf_index(
        df.limit(2), "vec_id", "embedding", idx, k=3, nprobe=2
    )
    assert [f.dataType for f in empty.schema.fields] == [
        f.dataType for f in live.schema.fields
    ]
    assert empty.count() == 0
    assert live.unionByName(empty).count() == live.count()


def test_maintain_ivf_index_compacts_and_retrains(spark, clustered, tmp_path):
    """The ANN maintenance loop: repeated appends fragment the cell
    lists → compaction folds them back to ~one file per cell (probes
    unchanged); once the appended fraction passes the threshold a
    retrain re-stamps the trained base and answers stay correct."""
    import os

    df, rows = clustered
    base = df.where("vec_id < 80")
    path = str(tmp_path / "ivf_maint")
    ann.save_ivf_index(base, "vec_id", "embedding", path, n_cells=5,
                       sample_size=200)
    # small appends: fragment the lists without crossing retrain_frac
    for lo in (80, 85, 90):
        ann.append_ivf_index(
            spark, path,
            df.where(f"vec_id >= {lo} and vec_id < {lo + 5}"),
            "vec_id", "embedding",
        )
    rep = ann.maintain_ivf_index(spark, path, retrain_frac=0.5,
                                 max_files_per_cell=1.5)
    assert rep["compacted"] and not rep["retrained"]
    post_dir = f"{path}/postings"
    n_files = sum(
        1 for d in os.listdir(post_dir) if d.startswith("cell=")
        for f in os.listdir(os.path.join(post_dir, d))
        if f.endswith(".parquet")
    )
    cells = sum(1 for d in os.listdir(post_dir) if d.startswith("cell="))
    assert n_files <= cells  # ~one file per cell again
    idx = ann.load_ivf_index(spark, path)
    q = df.where(df.vec_id.isin([0, 90]))
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=5
        ).collect()
    }
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df.where("vec_id < 95"),
            "vec_id", "embedding", k=5,
        ).collect()
    }
    assert got == exact  # full probe == exact over the appended corpus
    # push past the retrain threshold
    ann.append_ivf_index(spark, path, df.where("vec_id >= 95"),
                         "vec_id", "embedding")
    rep2 = ann.maintain_ivf_index(spark, path, retrain_frac=0.02)
    assert rep2["retrained"]
    # the retrain re-stamped the base: a fresh pass is a no-op
    rep3 = ann.maintain_ivf_index(spark, path, retrain_frac=0.02,
                                  max_files_per_cell=1.5)
    assert not rep3["retrained"] and not rep3["compacted"]
    idx2 = ann.load_ivf_index(spark, path)
    got2 = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx2, k=5, nprobe=5
        ).collect()
    }
    exact2 = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", df, "vec_id", "embedding", k=5
        ).collect()
    }
    assert got2 == exact2


def test_ivf_query_chunking_matches_unchunked(spark, clustered):
    """query_chunk_rows bounds the kernel's per-task matrices; the
    masked kernel scores each query only against its OWN probed
    cells, so any chunking of the batch returns identical top-k."""
    df, _ = clustered
    q = df.where("vec_id % 3 = 0")
    kw = dict(k=5, n_cells=10, nprobe=3, sample_size=200)
    base = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding", **kw
        ).collect()
    }
    chunked = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            query_chunk_rows=7, **kw
        ).collect()
    }
    assert base == chunked and base


def test_ivf_filtered_search_exact_and_pushed(spark, clustered, tmp_path):
    """Filtered vector search (payload_cols layout): at full probe the
    result equals exact brute force over the FILTERED corpus; the
    payload predicate reaches the pruned postings scan as a pushed
    filter (never a post-filter of unfiltered top-k); payloads survive
    appends and maintenance rebuilds."""
    df, rows = clustered
    lab = df.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    path = str(tmp_path / "ivf_payload")
    ann.save_ivf_index(
        lab.where("vec_id < 80"), "vec_id", "embedding", path,
        n_cells=5, sample_size=200, payload_cols=["label"],
    )
    n = ann.append_ivf_index(
        spark, path, lab.where("vec_id >= 80"), "vec_id", "embedding"
    )
    assert n == lab.where("vec_id >= 80").count()
    idx = ann.load_ivf_index(spark, path)
    assert "label" in idx.postings.columns
    got_df = ann.cosine_topk_ivf_index(
        lab, "vec_id", "embedding", idx, k=5, nprobe=5, where="label = 1"
    )
    got = {(r.query_id, r.vec_id, r.rank) for r in got_df.collect()}
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            lab, "vec_id", "embedding", lab.where("label = 1"),
            "vec_id", "embedding", k=5,
        ).collect()
    }
    assert got == want and got
    # plan pin at a PARTIAL probe (full probe may fold the cell IN):
    # partition pruning intact AND the payload predicate reaches the
    # postings scan as a pushed filter
    plan = (
        ann.cosine_topk_ivf_index(
            lab.where("vec_id < 2"), "vec_id", "embedding", idx,
            k=5, nprobe=2, where="label = 1",
        )._jdf.queryExecution().executedPlan().toString()
    )
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters: [cell" in ln
    ]
    assert scan_lines and any(" IN (" in ln for ln in scan_lines)
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "label" in ln
    ]
    assert pushed, plan[:2000]
    # maintenance rebuild (reconcile path) keeps the payload column
    keep = lab.where("vec_id <> 0").select("vec_id")
    rep = ann.maintain_ivf_index(spark, path, reconcile_ids=keep)
    assert rep["reconciled"] == 1
    idx2 = ann.load_ivf_index(spark, path)
    assert "label" in idx2.postings.columns
    got2 = {
        (r.query_id, r.vec_id)
        for r in ann.cosine_topk_ivf_index(
            lab, "vec_id", "embedding", idx2, k=5, nprobe=5,
            where="label = 1",
        ).collect()
    }
    want2 = {
        (r.query_id, r.vec_id)
        for r in ann.cosine_topk(
            lab, "vec_id", "embedding",
            lab.where("label = 1 AND vec_id <> 0"),
            "vec_id", "embedding", k=5,
        ).collect()
    }
    assert got2 == want2


def test_ivf_pq_filtered_search(spark, clustered, tmp_path):
    """The PQ probe honors the same payload predicate: codes of
    non-passing rows never become candidates, and with a generous pad
    at full probe the output equals exact over the filtered set."""
    df, _ = clustered
    lab = df.withColumn("label", (F.col("vec_id") % 2).cast("int"))
    path = str(tmp_path / "ivf_pq_payload")
    ann.save_ivf_index(
        lab, "vec_id", "embedding", path, n_cells=5, sample_size=200,
        pq_m=4, payload_cols=["label"],
    )
    idx = ann.load_ivf_index(spark, path)
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_pq(
            lab.where("vec_id < 10"), "vec_id", "embedding", idx,
            k=5, nprobe=5, pad_factor=50, where="label = 0",
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            lab.where("vec_id < 10"), "vec_id", "embedding",
            lab.where("label = 0"), "vec_id", "embedding", k=5,
        ).collect()
    }
    assert got == want and got


def test_ivf_bulk_query_collects_are_chunk_bounded(spark, clustered):
    """r8 verdict #1: no bulk ANN path may materialize the full query
    side on the driver in one collect. cosine_topk_ivf past
    query_chunk_rows must collect the query side one hash-chunk at a
    time — pinned by intercepting toPandas and recording each
    collect's row count."""
    df, _ = clustered
    q = df  # 101 queries
    sizes: list[int] = []
    cls = type(df)  # the CONCRETE DataFrame class (pyspark.sql.DataFrame
    # is an abstract base in Spark 4; patching it intercepts nothing)
    orig = cls.toPandas

    def spy(self):
        pdf = orig(self)
        if "qv" in pdf.columns:  # query-side collects only
            sizes.append(len(pdf))
        return pdf

    cls.toPandas = spy
    try:
        got = ann.cosine_topk_ivf(
            q, "vec_id", "embedding", df, "vec_id", "embedding",
            k=3, n_cells=10, nprobe=10, sample_size=200,
            query_chunk_rows=16,
        ).count()
    finally:
        cls.toPandas = orig
    assert got > 0
    # hash chunking: sizes CONCENTRATE around query_chunk_rows (not a
    # hard cap) — the invariant is that no collect materialized the
    # whole 101-query batch, and several chunk-sized collects ran
    assert sizes and len(sizes) >= 4, sizes
    assert max(sizes) <= 3 * 16, sizes


def test_ivf_append_drops_null_vec_ids(spark, clustered, tmp_path):
    """NULL ids can never satisfy the presence guards (isin / semi
    joins skip NULLs), so they'd re-append on every unrecorded replay
    — append_ivf_index drops them up front and replays stay no-ops."""
    df, _ = clustered
    path = str(tmp_path / "ivf_nullid")
    ann.save_ivf_index(df.where("vec_id < 90"), "vec_id", "embedding",
                       path, n_cells=5, sample_size=200)
    delta = df.where("vec_id >= 90").withColumn(
        "vec_id",
        F.when(F.col("vec_id") % 2 == 0, F.col("vec_id")),  # odd → NULL
    )
    n_valid = delta.where("vec_id IS NOT NULL").count()
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="t1"
    ) == n_valid
    # unrecorded replay (fresh txn name, same rows): guards reject the
    # non-null ids; the NULL rows must not accumulate either
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="t2"
    ) == 0
    vec = spark.read.parquet(f"{path}/vectors")
    assert vec.where("vec_id IS NULL").count() == 0
    assert vec.count() == 90 + n_valid
    post = spark.read.parquet(f"{path}/postings")
    assert post.where("vec_id IS NULL").count() == 0
    assert post.count() == 90 + n_valid


def test_maintain_ivf_reconcile_drains_empty_index(spark, clustered, tmp_path):
    """Full corpus deletion: reconcile with an empty keep-set must
    drain the index (not raise), keep the layout loadable and
    probe-able (empty results), stamp n_vectors=0, and accept appends
    afterwards (the quantizer survives the drain)."""
    df, _ = clustered
    path = str(tmp_path / "ivf_drain")
    ann.save_ivf_index(df.where("vec_id < 50"), "vec_id", "embedding",
                       path, n_cells=5, sample_size=200)
    keep = df.where("vec_id < 0").select("vec_id")  # empty keep-set
    rep = ann.maintain_ivf_index(spark, path, reconcile_ids=keep)
    assert rep["reconciled"] == 50 and rep["n_vectors"] == 0
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta.n_vectors == 0
    idx = ann.load_ivf_index(spark, path)
    q = df.where("vec_id = 0")
    assert ann.cosine_topk_ivf_index(
        q, "vec_id", "embedding", idx, k=3, nprobe=5
    ).count() == 0
    # the drained layout accepts appends and serves them
    assert ann.append_ivf_index(
        spark, path, df.where("vec_id >= 50 and vec_id < 60"),
        "vec_id", "embedding",
    ) == 10
    idx2 = ann.load_ivf_index(spark, path)
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            df.where("vec_id = 55"), "vec_id", "embedding", idx2,
            k=3, nprobe=5,
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            df.where("vec_id = 55"), "vec_id", "embedding",
            df.where("vec_id >= 50 and vec_id < 60"),
            "vec_id", "embedding", k=3,
        ).collect()
    }
    assert got == want and got


def test_filtered_probe_escalation_returns_true_filtered_topk(spark, clustered, tmp_path):
    """r8 verdict #3: a selective predicate whose passing rows live
    outside a query's probed cells must NOT silently return a short
    list — the probe escalates (nprobe ×2 → full) and the answer is
    the exact top-k of the filtered corpus."""
    df, rows = clustered
    # label 7 exists ONLY in the last cluster (ids 80-84): a query from
    # cluster 0 probing 1 cell is guaranteed starved at nprobe=1
    lab = df.withColumn(
        "label",
        F.when((F.col("vec_id") >= 80) & (F.col("vec_id") < 85), 7)
        .otherwise(0)
        .cast("int"),
    )
    path = str(tmp_path / "ivf_starved")
    ann.save_ivf_index(lab, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, payload_cols=["label"])
    idx = ann.load_ivf_index(spark, path)
    q = lab.where("vec_id IN (0, 25)")
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=3, nprobe=1, where="label = 7"
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", lab.where("label = 7"),
            "vec_id", "embedding", k=3,
        ).collect()
    }
    assert got == want and len(got) == 6  # 2 queries × full k=3


def test_filtered_fewer_passing_rows_than_k_returns_all_ranked(spark, clustered, tmp_path):
    """When the WHOLE filtered corpus holds fewer than k rows, the
    escalated probe must return all of them ranked (full probe of the
    filtered set == exact), never error or over-return."""
    df, rows = clustered
    lab = df.withColumn(
        "label",
        F.when(F.col("vec_id").isin(40, 61), 7).otherwise(0).cast("int"),
    )
    path = str(tmp_path / "ivf_sparse_label")
    ann.save_ivf_index(lab, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, payload_cols=["label"])
    idx = ann.load_ivf_index(spark, path)
    q = lab.where("vec_id = 0")
    got = sorted(
        (r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=1, where="label = 7"
        ).collect()
    )
    want = sorted(
        (r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", lab.where("label = 7"),
            "vec_id", "embedding", k=5,
        ).collect()
    )
    assert got == want and len(got) == 2


def test_pq_filtered_starved_probe_widens_to_exact(spark, clustered, tmp_path):
    """The PQ path's starvation repair: a selective filter leaving the
    probed union under k passing codes triggers one full-probe widen —
    the result equals exact over the filtered corpus."""
    df, _ = clustered
    lab = df.withColumn(
        "label",
        F.when((F.col("vec_id") >= 80) & (F.col("vec_id") < 85), 7)
        .otherwise(0)
        .cast("int"),
    )
    path = str(tmp_path / "ivf_pq_starved")
    ann.save_ivf_index(lab, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, pq_m=4, payload_cols=["label"])
    idx = ann.load_ivf_index(spark, path)
    q = lab.where("vec_id IN (0, 25)")
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_pq(
            q, "vec_id", "embedding", idx, k=3, nprobe=1,
            pad_factor=50, where="label = 7",
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", lab.where("label = 7"),
            "vec_id", "embedding", k=3,
        ).collect()
    }
    assert got == want and len(got) == 6


def test_delete_ivf_ids_merge_on_read(spark, clustered, tmp_path):
    """r8 verdict-named escalation, delivered: delete_ivf_ids is an
    O(1) sidecar append; flat AND PQ full probes immediately equal
    exact over the post-delete corpus WITHOUT a retrain; maintenance
    folds the tombstones into its next rebuild and clears the sidecar;
    re-appending a tombstoned id is rejected until then."""
    import os

    df, _ = clustered
    path = str(tmp_path / "ivf_tomb")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, pq_m=4)
    assert ann.delete_ivf_ids(spark, path, [0, 55, 100]) == 3
    assert ann.delete_ivf_ids(spark, path, [55]) == 0  # already tombstoned
    live = df.where("vec_id NOT IN (0, 55, 100)")
    q = df.where("vec_id IN (1, 25, 50)")
    idx = ann.load_ivf_index(spark, path)
    assert idx.tombstones == {0, 55, 100}
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=5
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", live, "vec_id", "embedding", k=5
        ).collect()
    }
    assert got == want and got
    got_pq = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_pq(
            q, "vec_id", "embedding", idx, k=5, nprobe=5, pad_factor=50
        ).collect()
    }
    assert got_pq == want
    # re-append of a tombstoned id: rejected (old rows still physical)
    with pytest.raises(ValueError, match="tombstoned"):
        ann.append_ivf_index(
            spark, path, df.where("vec_id = 0"), "vec_id", "embedding"
        )
    # tombstones ride the retrain trigger (3/101 appended-equivalent
    # drift) and the rebuild compacts them away
    rep = ann.maintain_ivf_index(spark, path, retrain_frac=0.01)
    assert rep["retrained"] and rep["tombstones_compacted"] == 3
    assert rep["tombstones"] == 0 and rep["n_vectors"] == 98
    assert not os.path.isdir(f"{path}/_tombstones")
    vec_ids = {
        r.vec_id for r in spark.read.parquet(f"{path}/vectors").collect()
    }
    assert not vec_ids & {0, 55, 100} and len(vec_ids) == 98
    idx2 = ann.load_ivf_index(spark, path)
    got2 = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx2, k=5, nprobe=5
        ).collect()
    }
    assert got2 == want
    # compacted: the id can come back through the normal add path
    assert ann.append_ivf_index(
        spark, path, df.where("vec_id = 0"), "vec_id", "embedding"
    ) == 1


def test_maintain_reconcile_with_propagates_updates(spark, clustered, tmp_path):
    """ADVICE r9 (medium): an update_published that rewrites an
    embedding must not leave the old vector served forever.
    reconcile_with detects changed vectors by equality join and
    replaces them in the staged rebuild; deletions drop; additions
    stay sync's job; a second call is a no-op."""
    df, _ = clustered
    lab = df.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    path = str(tmp_path / "ivf_recwith")
    ann.save_ivf_index(lab, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, payload_cols=["label"])
    # corpus evolves: id 5's embedding rewritten (now ~= id 90's
    # cluster), id 7 deleted, id 500 added
    moved = lab.where("vec_id = 90").select(
        F.lit(5).cast("long").alias("vec_id"),
        F.col("embedding"),
        F.lit(2).cast("int").alias("label"),
    )
    corpus2 = (
        lab.where("vec_id NOT IN (5, 7)")
        .unionByName(moved)
        .unionByName(
            lab.where("vec_id = 1").select(
                F.lit(500).cast("long").alias("vec_id"),
                "embedding",
                F.lit(0).cast("int").alias("label"),
            )
        )
    )
    rep = ann.maintain_ivf_index(
        spark, path,
        reconcile_with=corpus2.select("vec_id", F.col("embedding").alias("cv"), "label"),
    )
    assert rep["updated"] == 1 and rep["reconciled"] == 2  # 1 changed + 1 deleted
    vec = spark.read.parquet(f"{path}/vectors")
    ids = {r.vec_id for r in vec.select("vec_id").collect()}
    assert 7 not in ids and 500 not in ids and 5 in ids  # adds are sync's job
    assert "label" in vec.columns
    # the index's id-5 row now carries the corpus version
    q = lab.where("vec_id = 90").select(
        F.lit(9000).cast("long").alias("vec_id"), "embedding"
    )
    idx = ann.load_ivf_index(spark, path)
    got = {
        r.vec_id
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=3, nprobe=5
        ).collect()
    }
    index_corpus = corpus2.where("vec_id <> 500")
    want = {
        r.vec_id
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", index_corpus, "vec_id", "embedding",
            k=3,
        ).collect()
    }
    assert got == want and 5 in got  # the moved vector ranks by its NEW value
    # convergence: nothing left to reconcile
    rep2 = ann.maintain_ivf_index(
        spark, path,
        reconcile_with=corpus2.select("vec_id", F.col("embedding").alias("cv"), "label"),
    )
    assert rep2["reconciled"] == 0 and rep2["updated"] == 0


def test_maintain_reconcile_with_tombstone_only_bumps_generation(
    spark, clustered, tmp_path
):
    """r9 review #3: a TOMBSTONE-ONLY reconcile_with pass (corpus
    unchanged, delete_ivf_ids on ids the corpus still carries) swaps a
    physical layout — it must bump the serving generation (replicas
    reload), reset the drift base (no redundant immediate retrain),
    and report the compaction, even though reconciled == 0."""
    from prefixtree_spark.serving import _read_ivf_generation

    df, _ = clustered
    path = str(tmp_path / "ivf_tsonly")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300)
    assert ann.delete_ivf_ids(spark, path, [3, 44]) == 2
    g0 = _read_ivf_generation(path)
    corp = df.select("vec_id", F.col("embedding").alias("cv"))
    rep = ann.maintain_ivf_index(spark, path, reconcile_with=corp)
    assert rep["reconciled"] == 0 and rep["updated"] == 0
    assert rep["tombstones_compacted"] == 2 and rep["tombstones"] == 0
    assert not rep["retrained"]  # drift base reset — no redundant rebuild
    assert _read_ivf_generation(path) > g0  # replicas told to reload
    ids = {r.vec_id for r in spark.read.parquet(f"{path}/vectors").collect()}
    assert not ids & {3, 44} and len(ids) == 99
    # convergence: a second pass is a clean no-op (no swap, no bump)
    g1 = _read_ivf_generation(path)
    rep2 = ann.maintain_ivf_index(spark, path, reconcile_with=corp)
    assert rep2["reconciled"] == 0 and rep2["tombstones_compacted"] == 0
    assert _read_ivf_generation(path) == g1


def test_maintain_folds_tombstones_without_retrain(spark, clustered, tmp_path):
    """ADVICE r9 #2: a tombstone set too small to fire the retrain
    trigger must STILL be folded by the next maintenance pass — the
    'reclaimed at maintenance cadence' contract in delete_ivf_ids.
    The fold keeps the trained centroids (no retrain), physically
    drops the rows from vectors AND postings, clears the sidecar,
    re-enables re-append of the ids, preserves the append-drift base,
    and bumps the serving generation."""
    import os

    from prefixtree_spark.serving import _read_ivf_generation

    df, _ = clustered
    path = str(tmp_path / "ivf_tsfold")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, pq_m=4)
    cent_before = sorted(
        (r.cell, tuple(r.c))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    assert ann.delete_ivf_ids(spark, path, [0, 55, 100]) == 3
    g0 = _read_ivf_generation(path)
    # retrain_frac high enough that 3/101 drift does NOT fire
    rep = ann.maintain_ivf_index(spark, path, retrain_frac=0.5)
    assert not rep["retrained"]
    assert rep["tombstones_compacted"] == 3 and rep["tombstones"] == 0
    assert not os.path.isdir(f"{path}/_tombstones")
    assert _read_ivf_generation(path) > g0
    # physically gone from both tables
    vec_ids = {r.vec_id for r in spark.read.parquet(f"{path}/vectors").collect()}
    post_ids = {r.vec_id for r in spark.read.parquet(f"{path}/postings").collect()}
    assert not vec_ids & {0, 55, 100} and len(vec_ids) == 98
    assert not post_ids & {0, 55, 100}
    # no retrain: centroids byte-identical
    cent_after = sorted(
        (r.cell, tuple(r.c))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    assert cent_after == cent_before
    # append-drift base preserved: base re-stamps to 101-3
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta.n_vectors == 98
    # probes == exact over the survivors, flat AND PQ
    live = df.where("vec_id NOT IN (0, 55, 100)")
    q = df.where("vec_id IN (1, 25, 50)")
    idx = ann.load_ivf_index(spark, path)
    assert idx.tombstones == frozenset()
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", live, "vec_id", "embedding", k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=5, nprobe=5
        ).collect()
    }
    assert got == want and got
    # the ids are re-appendable now (the old physical rows are gone)
    assert ann.append_ivf_index(
        spark, path, df.where("vec_id = 0"), "vec_id", "embedding"
    ) == 1
    # second maintenance pass: clean no-op (no tombstones, no swap)
    g1 = _read_ivf_generation(path)
    rep2 = ann.maintain_ivf_index(spark, path, retrain_frac=0.5,
                                  max_files_per_cell=99)
    assert rep2["tombstones_compacted"] == 0 and not rep2["retrained"]
    assert _read_ivf_generation(path) == g1


def test_save_ivf_over_stale_layout_clears_sidecars(spark, clustered, tmp_path):
    """ADVICE r9 #1: a fresh save_ivf_index over an existing layout
    must not inherit its _tombstones/_txns/_synced sidecars — a stale
    tombstone would silently mask the NEW rows from every probe and
    block their re-append; stale txn markers would no-op appends the
    new layout never saw. The overwrite also bumps the generation so
    watchers reload."""
    import os

    from prefixtree_spark.serving import _read_ivf_generation

    df, _ = clustered
    path = str(tmp_path / "ivf_resave")
    ann.save_ivf_index(df.where("vec_id < 60"), "vec_id", "embedding",
                       path, n_cells=4, sample_size=200)
    ann.delete_ivf_ids(spark, path, [5, 7])
    ann.append_ivf_index(spark, path, df.where("vec_id >= 60"),
                         "vec_id", "embedding", txn="old-batch")
    from prefixtree_spark.operators.ann import _write_sync_watermark

    _write_sync_watermark(spark, path, 9)
    g0 = _read_ivf_generation(path)
    # fresh save over the same path: new corpus, new life
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=4,
                       sample_size=200)
    assert not os.path.isdir(f"{path}/_tombstones")
    assert not os.path.isdir(f"{path}/_txns")
    assert not os.path.exists(f"{path}/_synced")
    assert _read_ivf_generation(path) > g0  # watchers must reload
    idx = ann.load_ivf_index(spark, path)
    assert idx.tombstones == frozenset()
    # the previously-tombstoned ids serve again
    q = df.where("vec_id = 5")
    got = ann.cosine_topk_ivf_index(
        q, "vec_id", "embedding", idx, k=3, nprobe=4, exclude_self=False
    ).collect()
    assert any(r.vec_id == 5 and r.rank == 1 for r in got)
    # and the stale txn marker no longer swallows a same-named append
    from prefixtree_spark.sources.io import _retired_txn_version

    assert _retired_txn_version(spark, path, "old-batch") is None


def test_ivf_index_probe_drops_null_query_ids(spark, clustered, tmp_path):
    """ADVICE r9 #5: NULL query ids are unservable (results key on
    query_id) and interacted badly with the escalation loop's
    ~isin(short) NULL semantics — the stored-index probe drops them up
    front, matching cosine_topk_ivf, and other queries are unaffected."""
    df, _ = clustered
    path = str(tmp_path / "ivf_nullq")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300)
    idx = ann.load_ivf_index(spark, path)
    q_ok = df.where("vec_id IN (1, 25)")
    q_null = q_ok.unionByName(
        q_ok.limit(1).select(
            F.lit(None).cast("long").alias("vec_id"), "embedding"
        )
    )
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q_ok, "vec_id", "embedding", idx, k=5, nprobe=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk_ivf_index(
            q_null, "vec_id", "embedding", idx, k=5, nprobe=5
        ).collect()
    }
    assert got == want and not any(r[0] is None for r in got)


def test_tombstone_filter_anti_join_crossover(spark, clustered, tmp_path, monkeypatch):
    """r9 verdict #2: past the literal-IN plan-size cap the probe-side
    tombstone filter switches to a broadcast anti-join against the
    sidecar — results must be IDENTICAL in both regimes, for the flat
    and the PQ probe, and the append rejection guard must still fire."""
    df, _ = clustered
    path = str(tmp_path / "ivf_xover_ts")
    ann.save_ivf_index(df, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, pq_m=4)
    assert ann.delete_ivf_ids(spark, path, [0, 55, 100]) == 3
    q = df.where("vec_id IN (1, 25, 50)")

    def _probe():
        idx = ann.load_ivf_index(spark, path)
        flat = {
            (r.query_id, r.vec_id, r.rank)
            for r in ann.cosine_topk_ivf_index(
                q, "vec_id", "embedding", idx, k=5, nprobe=5
            ).collect()
        }
        pq = {
            (r.query_id, r.vec_id, r.rank)
            for r in ann.cosine_topk_ivf_pq(
                q, "vec_id", "embedding", idx, k=5, nprobe=5,
                pad_factor=50,
            ).collect()
        }
        return flat, pq

    flat_lit, pq_lit = _probe()
    monkeypatch.setattr(ann, "_APPEND_GUARD_STATIC_MAX", 0)
    flat_aj, pq_aj = _probe()
    assert flat_aj == flat_lit and pq_aj == pq_lit and flat_lit
    live = df.where("vec_id NOT IN (0, 55, 100)")
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in ann.cosine_topk(
            q, "vec_id", "embedding", live, "vec_id", "embedding", k=5
        ).collect()
    }
    assert flat_aj == want
    # the append rejection guard fires in the anti-join regime too
    with pytest.raises(ValueError, match="tombstoned"):
        ann.append_ivf_index(
            spark, path, df.where("vec_id = 0"), "vec_id", "embedding"
        )


def test_ivf_unrecorded_full_replay_reports_original_count(
    spark, clustered, tmp_path, monkeypatch
):
    """r10 review (the dense twin of ADVICE r9 #3): a replay after a
    crash that landed BOTH tables but not the retired marker must
    report the ORIGINAL appended count (recovered from the intent file
    written before the first table write), while a fresh txn whose
    delta is fully present still reports 0."""
    import os

    import prefixtree_spark.sources.io as _io

    df, _ = clustered
    path = str(tmp_path / "ivf_replaycnt")
    ann.save_ivf_index(df.where("vec_id < 60"), "vec_id", "embedding",
                       path, n_cells=4, sample_size=200)
    delta = df.where("vec_id >= 60")
    n_expected = delta.count()
    # the crash: both tables land, then the process dies BEFORE the
    # retired-txn marker — simulated by failing _retire_txn itself
    real_retire = _io._retire_txn
    monkeypatch.setattr(_io, "_retire_txn",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("crash before marker")))
    with pytest.raises(RuntimeError, match="crash before marker"):
        ann.append_ivf_index(spark, path, delta, "vec_id", "embedding",
                             txn="b1")
    monkeypatch.setattr(_io, "_retire_txn", real_retire)
    assert os.path.isdir(f"{path}/_txn_intents")  # the recovery record
    n = ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b1"
    )
    assert n == n_expected and n > 0  # NOT 0
    # recorded fast path agrees
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b1"
    ) == n
    # intent cleaned up once the marker exists
    assert not os.listdir(f"{path}/_txn_intents") if os.path.isdir(
        f"{path}/_txn_intents") else True
    # fresh txn, fully-present delta (the sync-overlap shape): 0
    assert ann.append_ivf_index(
        spark, path, delta, "vec_id", "embedding", txn="b2"
    ) == 0
    # no duplicates: vectors still one row per id
    from pyspark.sql import functions as _F

    dups = (
        spark.read.parquet(f"{path}/vectors").groupBy("vec_id").count()
        .where(_F.col("count") > 1).count()
    )
    assert dups == 0


def test_describe_ivf_index_reports_lifecycle_state(spark, clustered, tmp_path):
    """The dense twin of describe_bm25_index: drift fraction tracks
    appends+tombstones against the trained base; maintenance resets."""
    df, _ = clustered
    path = str(tmp_path / "ivf_desc")
    ann.save_ivf_index(df.where("vec_id < 80"), "vec_id", "embedding",
                       path, n_cells=4, sample_size=200, pq_m=4)
    d0 = ann.describe_ivf_index(spark, path)
    assert d0["n_cells"] == 4 and d0["pq_m"] == 4
    assert d0["n_vectors"] == 80 and d0["trained_base"] == 80
    assert d0["appended_frac"] == 0.0 and d0["tombstones"] == 0
    ann.append_ivf_index(spark, path, df.where("vec_id >= 80"),
                         "vec_id", "embedding")
    ann.delete_ivf_ids(spark, path, [0, 1])
    d1 = ann.describe_ivf_index(spark, path)
    assert d1["n_vectors"] == 101
    assert d1["appended_frac"] == round((21 + 2) / 101, 4)
    assert d1["tombstones"] == 2 and d1["generation"] > d0["generation"]
    rep = ann.maintain_ivf_index(spark, path, retrain_frac=0.5)
    assert rep["tombstones_compacted"] == 2
    d2 = ann.describe_ivf_index(spark, path)
    assert d2["tombstones"] == 0 and d2["n_vectors"] == 99
    assert not d2["swap_in_progress"]


def test_reconcile_with_detects_payload_only_updates(spark, clustered, tmp_path):
    """r10: a corpus row whose PAYLOAD metadata was rewritten (vector
    unchanged) must count as changed and propagate — filtered search
    over payload_cols layouts otherwise serves stale labels forever
    (the filtered-ANN twin of the BM25 fingerprint rule)."""
    from pyspark.sql import functions as F

    df, _ = clustered
    lab = df.withColumn(
        "label", F.when(F.col("vec_id") < 50, "a").otherwise("b")
    )
    path = str(tmp_path / "ivf_payrec")
    ann.save_ivf_index(lab, "vec_id", "embedding", path, n_cells=5,
                       sample_size=300, payload_cols=["label"])
    # rewrite ONE row's label in the corpus; vector untouched
    corp2 = lab.withColumn(
        "label",
        F.when(F.col("vec_id") == 3, "relabeled").otherwise(F.col("label")),
    ).select("vec_id", F.col("embedding").alias("cv"), "label")
    rep = ann.maintain_ivf_index(spark, path, reconcile_with=corp2)
    assert rep["updated"] == 1 and rep["reconciled"] == 1
    stored = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{path}/vectors")
        .where("vec_id IN (3, 4)").collect()
    }
    assert stored[3] == "relabeled" and stored[4] == "a"
    # filtered search sees the NEW label
    idx = ann.load_ivf_index(spark, path)
    q = df.where("vec_id = 2")
    got = {
        r.vec_id
        for r in ann.cosine_topk_ivf_index(
            q, "vec_id", "embedding", idx, k=100,
            nprobe=len(idx.centroids), where="label = 'relabeled'",
        ).collect()
    }
    assert got == {3}
    # convergence: second pass no-op
    rep2 = ann.maintain_ivf_index(spark, path, reconcile_with=corp2)
    assert rep2["updated"] == 0 and rep2["reconciled"] == 0


def test_without_ids_null_contract_same_in_both_regimes(spark, monkeypatch):
    """r10 advice: rows with a NULL id column are KEPT by the shared
    tombstone filter in BOTH regimes. A bare literal ~isin evaluates
    to NULL on NULL input (dropping the row) while the anti-join
    branch keeps it — the same call would return different rows
    depending only on tombstone-set size."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "vid long, payload string"
    )
    ts = frozenset([2])
    ts_df = spark.createDataFrame([(2,)], "vid long")
    lit_rows = {
        r.payload for r in ann._without_ids(df, "vid", ts, ts_df).collect()
    }
    monkeypatch.setattr(ann, "_APPEND_GUARD_STATIC_MAX", 0)
    aj_rows = {
        r.payload for r in ann._without_ids(df, "vid", ts, ts_df).collect()
    }
    assert lit_rows == aj_rows == {"a", "c"}


def test_semantic_dedup_ivf_plan_no_cartesian(spark):
    """The IVF-candidate SemDeDup plan must pair vectors through the
    cell equi-join — never a cartesian/nested-loop all-pairs stage."""
    rng = np.random.default_rng(31)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann.semantic_dedup_ivf(
        df, "vec_id", "embedding", threshold=0.9, n_cells=4,
        n_replicas=2, sample_size=100, seed=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan  # the equi-key the candidates ride


def test_semantic_dedup_ivf_matches_exact_on_planted_twins(spark):
    """Recall-1 on the planted-twin shape: near-identical twins (the
    ≥0.9 regime the operator is FOR) are found through shared cells;
    survivors equal the exhaustive pairwise pass."""
    rng = np.random.default_rng(37)
    base = rng.standard_normal((80, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    # twins: id+1000, multiplicative 2% perturbation -> cosine ~0.9998
    for i in range(0, 80, 4):
        tw = base[i] * (1.0 + 0.02 * np.sin(13.0 * i + np.arange(16)))
        rows.append((i + 1000, [float(x) for x in tw]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id
        for r in ann.semantic_dedup_ivf(
            df, "vec_id", "embedding", threshold=0.9, n_cells=4,
            n_replicas=2, sample_size=200, seed=5,
        ).collect()
    }
    m = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    order = np.argsort(ids)
    ids_s, ms = ids[order], m[order]
    ms = ms / np.linalg.norm(ms, axis=1, keepdims=True)
    sims = ms @ ms.T
    dropped = {
        int(ids_s[j])
        for i, j in zip(*np.where(np.triu(sims >= 0.9, 1)))
    }
    want = {int(x) for x in ids_s} - dropped
    assert got == want
    assert len(want) == 80  # every twin dropped, every base survives


def test_semantic_dedup_ivf_max_cell_releases_pin(spark):
    """r11 verdict #6 / advice: the max_cell guard's internal posting
    persist must be released INSIDE the call — result identical to the
    unguarded path, returned as a caller-owned checkpoint (releasable),
    with the consume shape leaving zero residue; the fail-fast raise
    must not leave the pin either."""
    import time

    import pytest

    from prefixtree_spark.plans.lifecycle import release_checkpoint

    rng = np.random.default_rng(41)
    base = rng.standard_normal((60, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    for i in range(0, 60, 5):
        tw = base[i] * (1.0 + 0.01 * np.cos(7.0 * i + np.arange(16)))
        rows.append((i + 1000, [float(x) for x in tw]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.9, n_cells=4, n_replicas=2, sample_size=200, seed=5)
    sc = spark.sparkContext

    def cached_ids():
        return {
            r.id()
            for r in sc._jsc.sc().getRDDStorageInfo()
            if r.numCachedPartitions() > 0
        }

    def settles_to(base_ids, deadline_s=15.0):
        end = time.time() + deadline_s
        while time.time() < end:
            if not (cached_ids() - base_ids):
                return True
            time.sleep(0.2)
        return False

    want = {r.vec_id for r in ann.semantic_dedup_ivf(df, "vec_id", "embedding", **kw).collect()}

    base_ids = cached_ids()
    # caller-owned checkpoint shape
    out = ann.semantic_dedup_ivf(df, "vec_id", "embedding", max_cell=10_000, **kw)
    assert {r.vec_id for r in out.collect()} == want
    release_checkpoint(out)
    assert settles_to(base_ids)

    # consume shape: zero residue after return
    got = ann.semantic_dedup_ivf(
        df, "vec_id", "embedding", max_cell=10_000,
        consume=lambda d: {r.vec_id for r in d.collect()}, **kw,
    )
    assert got == want
    assert settles_to(base_ids)

    # fail-fast raise releases the pin too
    with pytest.raises(ValueError, match="max_cell"):
        ann.semantic_dedup_ivf(df, "vec_id", "embedding", max_cell=1, **kw)
    assert settles_to(base_ids)
