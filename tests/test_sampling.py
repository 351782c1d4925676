"""Deterministic splitting: stability under repartitioning, correct
proportions, disjoint+exhaustive cover, and sample⊂population."""

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators.sampling import deterministic_sample, split_assign


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(20_000).select(F.col("id").alias("doc_id"))


def test_split_stable_under_partitioning(spark, ids):
    f = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {(r.doc_id, r.split) for r in split_assign(ids, "doc_id", f).collect()}
    b = {
        (r.doc_id, r.split)
        for r in split_assign(ids.repartition(17), "doc_id", f).collect()
    }
    assert a == b


def test_split_proportions_and_cover(spark, ids):
    f = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = {
        r.split: r.n
        for r in split_assign(ids, "doc_id", f)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    total = sum(counts.values())
    assert total == 20_000
    # md5 uniformity: within ±2% absolute of target
    assert abs(counts["train"] / total - 0.8) < 0.02
    assert abs(counts["val"] / total - 0.1) < 0.02
    assert abs(counts["test"] / total - 0.1) < 0.02


def test_split_seed_changes_assignment(spark, ids):
    f = {"train": 0.5, "test": 0.5}
    a = {(r.doc_id, r.split) for r in split_assign(ids, "doc_id", f, seed="x").collect()}
    b = {(r.doc_id, r.split) for r in split_assign(ids, "doc_id", f, seed="y").collect()}
    assert a != b


def test_split_validates_fractions(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(ids, "doc_id", {"a": 0.5, "b": 0.2})


def test_deterministic_sample_nested(spark, ids):
    """A 10% sample is a subset of the 20% sample with the same seed
    (threshold semantics), and stable across partitionings."""
    s10 = {r.doc_id for r in deterministic_sample(ids, "doc_id", 0.1).collect()}
    s20 = {r.doc_id for r in deterministic_sample(ids, "doc_id", 0.2).collect()}
    assert s10 <= s20
    again = {
        r.doc_id
        for r in deterministic_sample(ids.repartition(13), "doc_id", 0.1).collect()
    }
    assert again == s10
    assert abs(len(s10) / 20_000 - 0.1) < 0.02


def test_top_n_per_group_order_col(spark):
    from prefixtree_spark.operators.sampling import top_n_per_group

    rows = [(i, "g%d" % (i % 2), 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "grp", "score"])
    got = {
        (r.grp, r.id)
        for r in top_n_per_group(df, ["grp"], 2, order_col="score", id_col="id").collect()
    }
    # lowest scores first: score = 100 - i, so the two HIGHEST ids win per group
    assert got == {("g0", 8), ("g0", 6), ("g1", 9), ("g1", 7)}


def test_top_n_per_group_hash_stable_and_plan(spark):
    """Hash-ordered quota: identical selection across partitionings,
    and the plan carries WindowGroupLimit — the map-side top-n prune
    that keeps the shuffle O(n·groups·tasks) instead of the corpus."""
    from prefixtree_spark.operators.sampling import top_n_per_group

    rows = [(i, "s%d" % (i % 3)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    res = top_n_per_group(df, ["grp"], 5, id_col="id", seed="t")
    assert "WindowGroupLimit" in res._jdf.queryExecution().executedPlan().toString()
    a = sorted((r.grp, r.id) for r in res.collect())
    b = sorted(
        (r.grp, r.id)
        for r in top_n_per_group(
            df.repartition(17), ["grp"], 5, id_col="id", seed="t"
        ).collect()
    )
    assert a == b and len(a) == 15


def test_top_n_per_group_requires_id(spark):
    from prefixtree_spark.operators.sampling import top_n_per_group

    df = spark.createDataFrame([(1, "a")], ["id", "grp"])
    with pytest.raises(ValueError, match="id_col"):
        top_n_per_group(df, ["grp"], 1)


def test_pack_sequences_hand_computed(spark):
    from prefixtree_spark.operators.sampling import pack_sequences

    rows = [(1, "a", 300), (2, "a", 300), (3, "a", 300), (4, "b", 600), (5, "b", 100)]
    df = spark.createDataFrame(rows, ["id", "grp", "toks"])
    got = {
        r.id: (r.token_offset, r.bin_id)
        for r in pack_sequences(df, "id", "toks", 512, group_cols=["grp"]).collect()
    }
    # group a: offsets 0, 300, 600 -> bins 0, 0, 1 (doc 2 straddles the cut)
    # group b: offsets 0, 600 -> bins 0, 1
    assert got == {1: (0, 0), 2: (300, 0), 3: (600, 1), 4: (0, 0), 5: (600, 1)}


def test_pack_sequences_global_stream(spark):
    from prefixtree_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(i, 100) for i in range(10)], ["id", "toks"])
    got = {r.id: r.bin_id for r in pack_sequences(df, "id", "toks", 250).collect()}
    assert got == {i: (i * 100) // 250 for i in range(10)}


def test_stratified_sample_fractions_and_stability(spark):
    from prefixtree_spark.operators.sampling import stratified_sample

    rows = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    frac = {"en": 0.9, "de": 0.2}
    out = stratified_sample(
        rows, "doc_id", "lang", frac, default_fraction=0.0, seed="t"
    )
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "fr" not in counts  # default_fraction=0 drops unnamed strata
    assert abs(counts["en"] / 10_000 - 0.9) < 0.02
    assert abs(counts["de"] / 10_000 - 0.2) < 0.02
    # stability: same rows selected under a different partitioning
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            rows.repartition(13), "doc_id", "lang", frac,
            default_fraction=0.0, seed="t",
        ).collect()
    }
    assert a == b
    # selection is a subset of deterministic_sample at the same seed:
    # a stratum's 0.2 sample is nested inside its 0.9 sample
    small = stratified_sample(
        rows, "doc_id", "lang", {"en": 0.2}, default_fraction=0.0, seed="t"
    )
    en_big = {r.doc_id for r in out.where("lang = 'en'").collect()}
    assert {r.doc_id for r in small.collect()} <= en_big


def test_stratified_sample_validates_fractions(spark):
    from prefixtree_spark.operators.sampling import stratified_sample

    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("x").alias("s"))
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "s", {"x": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "s", {}, default_fraction=-0.1)


def test_weighted_sample_determinism_and_bias(spark):
    """Priorities are partitioning-independent; heavier rows win more
    often; zero/negative weights never selected."""
    from prefixtree_spark.operators.sampling import weighted_sample

    rows = [(i, 50 if i % 10 == 0 else 1) for i in range(500)] + [(900, 0), (901, -5)]
    a = spark.createDataFrame(rows, ["id", "w"]).repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), ["id", "w"]).repartition(2)
    got_a = sorted(r.id for r in weighted_sample(a, "id", "w", 50, seed="s").collect())
    got_b = sorted(r.id for r in weighted_sample(b, "id", "w", 50, seed="s").collect())
    assert got_a == got_b  # layout-independent
    assert 900 not in got_a and 901 not in got_a
    heavy = sum(1 for i in got_a if i % 10 == 0 and i < 900)
    # 50 heavy rows (w=50) vs 450 light (w=1): heavy should dominate
    assert heavy >= 30
    # a different seed draws a different sample
    got_c = sorted(r.id for r in weighted_sample(a, "id", "w", 50, seed="t").collect())
    assert got_a != got_c


def test_shard_assign_deterministic_and_in_range(spark):
    from prefixtree_spark.operators.sampling import shard_assign

    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    a = {r.id: r.shard for r in shard_assign(df, "id", 16).collect()}
    b = {r.id: r.shard for r in
         shard_assign(df.repartition(9), "id", 16).collect()}
    assert a == b  # layout-independent
    assert set(a.values()) <= set(range(16))
    # roughly balanced: every shard within 3x of uniform on 1000 ids
    from collections import Counter
    counts = Counter(a.values())
    assert len(counts) == 16 and max(counts.values()) < 3 * (1000 / 16)
    # seed changes the layout
    c = {r.id: r.shard for r in
         shard_assign(df, "id", 16, seed="other").collect()}
    assert a != c


def test_export_shards_one_file_per_shard_roundtrip(spark, tmp_path):
    """One data file per shard dir, deterministic manifest, and the
    read-back corpus equals the input exactly."""
    import os

    from prefixtree_spark.operators.sampling import export_shards

    df = spark.createDataFrame(
        [(i, f"doc {i} text", (i % 7) + 1) for i in range(300)],
        "id long, text string, n_toks long",
    )
    path = str(tmp_path / "shards")
    manifest = export_shards(
        df, "id", path, 8, token_count_col="n_toks"
    ).collect()
    assert sorted(r.shard for r in manifest) == list(range(8))
    assert sum(r.n_docs for r in manifest) == 300
    assert sum(r.n_tokens for r in manifest) == sum((i % 7) + 1 for i in range(300))
    for d in os.listdir(path):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    back = spark.read.parquet(path)
    assert sorted((r.id, r.text, r.n_toks) for r in back.collect()) == sorted(
        (i, f"doc {i} text", (i % 7) + 1) for i in range(300)
    )
    # _manifest dir is invisible to partition discovery (underscore rule)
    assert "shard" in back.columns and "_manifest" not in back.columns
    saved = spark.read.parquet(f"{path}/_manifest")
    assert sorted((r.shard, r.n_docs) for r in saved.collect()) == sorted(
        (r.shard, r.n_docs) for r in manifest
    )


def test_mixture_resample_null_weights_and_keys(spark):
    """NULL weight sums mean zero mass (group keeps nothing, no
    TypeError); NULL group keys are zero-mass by the same contract."""
    from prefixtree_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "b", None), (4, None, 5)],
        "id long, src string, w int",
    )
    kept = mixture_resample(
        df, "id", "src", target_frac=1.0, alpha=1.0, weight_col="w"
    ).collect()
    assert {r.id for r in kept} <= {1, 2}
    assert all(r.src == "a" for r in kept)
