"""Learned quality classifier: separability, map-only scoring plan,
save/load featurization stability, NULL-text contract."""

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators.classifier import (
    load_quality_classifier,
    save_quality_classifier,
    score_quality,
    train_quality_classifier,
)


def _labeled(spark, n=400, seed_offset=0):
    """Separable corpus: 'good' docs use a clean-prose vocabulary,
    'bad' docs are boilerplate/token-spam — the real shape the filter
    targets."""
    good = [
        (
            i,
            f"the quick study of topic {i % 17} explains clear ideas with "
            f"careful reasoning and cites source {i % 7} in context",
            1,
        )
        for i in range(seed_offset, seed_offset + n // 2)
    ]
    bad = [
        (
            i + 100_000,
            "click here buy now " * (3 + i % 4) + f"spamtok{i % 13} " * 6,
            0,
        )
        for i in range(seed_offset, seed_offset + n // 2)
    ]
    return spark.createDataFrame(good + bad, ["doc_id", "text", "label"])


def test_classifier_separates_quality_holdout(spark):
    train = _labeled(spark, n=400)
    hold = _labeled(spark, n=200, seed_offset=5000)
    model = train_quality_classifier(train, "text", "label")
    scored = score_quality(model, hold, "text")
    acc = scored.where(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
    ).count() / hold.count()
    assert acc >= 0.95, acc
    assert set(scored.columns) == {"doc_id", "text", "label", "quality_prob"}


def test_scoring_plan_is_map_only(spark):
    """The 100 TB property: scoring must not shuffle — no Exchange in
    the scored plan (the corpus scan pipelines straight through)."""
    train = _labeled(spark, n=200)
    model = train_quality_classifier(train, "text", "label")
    scored = score_quality(model, train.select("doc_id", "text"), "text")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_threshold_filters_and_save_load_roundtrip(spark, tmp_path):
    train = _labeled(spark, n=300)
    model = train_quality_classifier(train, "text", "label")
    kept = score_quality(model, train, "text", keep_threshold=0.5)
    assert 0 < kept.count() < train.count()
    path = str(tmp_path / "qc_model")
    save_quality_classifier(model, path)
    loaded = load_quality_classifier(spark, path)
    a = {(r.doc_id, round(r.quality_prob, 9))
         for r in score_quality(model, train, "text").collect()}
    b = {(r.doc_id, round(r.quality_prob, 9))
         for r in score_quality(loaded, train, "text").collect()}
    assert a == b


def test_null_text_scores_as_empty(spark):
    train = _labeled(spark, n=200)
    model = train_quality_classifier(train, "text", "label")
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.quality_prob
            for r in score_quality(model, df, "text").collect()}
    assert rows[1] == pytest.approx(rows[2])


def test_score_quality_preserves_null_text(spark):
    """Scoring must not mutate the data it scores: NULL text
    featurizes as empty (engine-wide contract) but comes back NULL in
    the scored frame — the old coalesce-in-place silently rewrote it
    to '' (r10 review)."""
    from prefixtree_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    train = spark.createDataFrame(
        [("good clean prose with many words", 1)] * 8
        + [("zzz", 0)] * 8,
        ["text", "label"],
    )
    model = train_quality_classifier(train, "text", "label")
    df = spark.createDataFrame(
        [(1, "good clean prose"), (2, None)], ["doc_id", "text"]
    )
    scored = {r.doc_id: (r.text, r.quality_prob) for r in
              score_quality(model, df, "text").collect()}
    assert scored[1][0] == "good clean prose"
    assert scored[2][0] is None          # NULL survives scoring
    assert scored[2][1] is not None      # but still got a probability
    assert set(score_quality(model, df, "text").columns) == {
        "doc_id", "text", "quality_prob"
    }
