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
