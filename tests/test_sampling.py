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
