"""Document quality classification — the learned counterpart of the
heuristic ``quality_score`` (text.py), i.e. the fastText-style filter
every large pretraining pipeline runs between heuristic gating and
training (CCNet / GPT-3 / Llama data work all describe one).

Shape at 100 TB: TRAINING is never the scale problem — labeled sets
are bounded (high-quality positives such as curated reference text vs
random-crawl negatives, typically 10⁵–10⁶ docs), and Spark's
LogisticRegression aggregates gradients tree-wise over however many
partitions that sample has. SCORING is the scale problem, and it is
map-only here: hashed token features + a broadcast coefficient vector
(2²⁰ floats ≈ 4 MB), no shuffle, no per-row Python — the whole
transform is MLlib JVM code, so it pipelines into whatever scan feeds
it. The plan-shape test pins the no-Exchange property.

No reference analog (PrefixTree.ecl has no learned components); this
extends the engine's text-quality family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "train_quality_classifier",
    "score_quality",
    "save_quality_classifier",
    "load_quality_classifier",
]

_TOKENS = "_qc_tokens"
_FEATURES = "_qc_features"
_RAW_PRED = "_qc_rawPrediction"
_PROB_VEC = "_qc_probability"
_PRED = "_qc_prediction"


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    *,
    n_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
    elastic_net: float = 0.0,
):
    """Train a hashed-bag-of-words logistic-regression quality
    classifier on a LABELED sample (``label_col``: 1 = keep-quality,
    0 = reject). Returns a fitted ``pyspark.ml.PipelineModel``
    (tokenize → hashing-TF → logistic regression) whose scoring pass
    is map-only (see module docstring).

    Feature hashing (not a vocabulary) is deliberate: no
    vocabulary-build pass over the corpus, a fixed-size model
    independent of token diversity, and identical featurization at
    train and score time by construction. NULL text counts as empty —
    the engine-wide contract (text.py learned it the hard way)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    prepared = labeled.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    ).withColumn(label_col, F.col(label_col).cast("double"))
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol=_TOKENS,
                pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol=_TOKENS,
                outputCol=_FEATURES,
                numFeatures=n_features,
            ),
            LogisticRegression(
                featuresCol=_FEATURES,
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
                elasticNetParam=elastic_net,
                rawPredictionCol=_RAW_PRED,
                probabilityCol=_PROB_VEC,
                predictionCol=_PRED,
            ),
        ]
    )
    return pipe.fit(prepared)


def score_quality(
    model,
    df: DataFrame,
    text_col: str,
    *,
    prob_col: str = "quality_prob",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Score ``df`` with a ``train_quality_classifier`` model: adds
    ``prob_col`` (P(quality=1)); with ``keep_threshold`` set, FILTERS
    to rows at or above it (the pipeline-gating call shape). Map-only:
    the model's stages are per-row JVM transforms with broadcast
    coefficients — safe to run inline on the full corpus scan."""
    from pyspark.ml.functions import vector_to_array

    # featurize NULL text as empty WITHOUT mutating the caller's
    # column: the scored frame must carry the data through unchanged
    # (r10 review — the old coalesce-in-place silently rewrote NULL
    # text to '' in the OUTPUT, a data mutation hiding in a scoring
    # pass)
    _orig = "_qc_text_orig"
    prepared = df.withColumn(_orig, F.col(text_col)).withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    scored = (
        model.transform(prepared)
        .withColumn(prob_col, vector_to_array(F.col(_PROB_VEC)).getItem(1))
        .withColumn(text_col, F.col(_orig))
        .drop(_orig, _TOKENS, _FEATURES, _RAW_PRED, _PROB_VEC, _PRED)
    )
    if keep_threshold is not None:
        scored = scored.where(F.col(prob_col) >= keep_threshold)
    return scored


def save_quality_classifier(model, path: str) -> None:
    """Persist the fitted pipeline (its hashing config travels with it,
    so a loaded model can never featurize differently than it
    trained)."""
    model.write().overwrite().save(path)


def load_quality_classifier(spark, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
