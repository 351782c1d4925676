"""End-to-end corpus preparation — the composition a training-data
pipeline actually runs, as one call over the engine's oracled
primitives:

  quality filter → language filter → near-dup removal (MinHash-LSH →
  components → survivors) → benchmark decontamination → per-source
  quota → deterministic train/val/test split → context-window packing.

Each stage is individually oracle-pinned (see workloads_ext.py); this
module only composes them, keeping the whole flow lazy where the
stages allow and documenting the shuffle budget: one hash-agg per text
statistic, the LSH candidate joins, one semi/anti join pair for
decontamination, one group-key window shuffle each for the optional
quota and packing stages, and zero shuffles for the split (a narrow
md5 projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefixtree_spark.operators import dedup, text
from prefixtree_spark.operators.sampling import (
    pack_sequences,
    split_assign,
    top_n_per_group,
)


def prepare_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    test_set: DataFrame | None = None,
    min_quality: float = 0.3,
    languages: list[str] | None = None,
    dedup_threshold: float = 0.8,
    shingle_n: int = 3,
    max_df: int | None = None,
    decontaminate_n: int = 13,
    quota_col: str | None = None,
    quota_n: int | None = None,
    splits: dict[str, float] | None = None,
    split_seed: str = "",
    pack_budget: int | None = None,
    pack_group_cols: list[str] | None = None,
) -> DataFrame:
    """Returns the prepared corpus: input rows that survive every
    enabled stage, with ``quality``, ``lang_pred`` and (when ``splits``
    is given) ``split`` columns attached. Pass ``test_set`` to remove
    training documents sharing a ``decontaminate_n``-gram with it;
    pass ``languages`` to keep only those predicted languages.

    ``quota_col``+``quota_n`` caps the corpus at ``quota_n`` documents
    per ``quota_col`` value (md5-stable stratified choice). With
    ``pack_budget``, each surviving row additionally gets
    ``n_tokens`` / ``token_offset`` / ``bin_id`` — its place in the
    concatenate-and-cut packed token stream (per ``pack_group_cols``,
    which should include ``split`` when splitting, so windows never
    straddle the train/val boundary).

    Determinism: every stage is a pure function of the input rows
    (hash-based dedup survivors keep each cluster's minimum id; the
    split and quota are md5-stable), so re-runs and repartitionings
    produce the same corpus.
    """
    if (quota_col is None) != (quota_n is None):
        raise ValueError(
            "prepare_corpus: quota_col and quota_n must be given together "
            f"(got quota_col={quota_col!r}, quota_n={quota_n!r}) — a "
            "half-specified quota silently shipping an uncapped corpus is "
            "exactly the mistake this raise exists to catch"
        )
    out = docs
    # quality + language annotations as NARROW withColumns (pure JVM
    # per-row expressions — text._quality_expr/_lang_pred_expr exist
    # precisely for this). The previous join-back formulation paid two
    # shuffle joins, silently DROPPED null-id docs at the inner join,
    # and row-multiplied on duplicate ids.
    out = out.withColumn("quality", text._quality_expr(text_col)).withColumn(
        "lang_pred", text._lang_pred_expr(text_col)
    )
    out = out.where(F.col("quality") >= min_quality)
    if languages is not None:
        out = out.where(F.col("lang_pred").isin(languages))
    # near-dup removal over the filtered corpus
    out = dedup.dedup_corpus(
        out, id_col, text_col, threshold=dedup_threshold, n=shingle_n,
        max_df=max_df,
    )
    if test_set is not None:
        out = dedup.decontaminate(
            out, test_set, id_col, text_col, n=decontaminate_n
        )
    if quota_col is not None and quota_n is not None:
        # DERIVED seed, never split_seed itself: quota keeps the rows
        # with the SMALLEST md5 buckets, and split_assign buckets on
        # the same hash — sharing the seed would hand every quota
        # survivor to the first split name and starve the rest.
        out = top_n_per_group(
            out, [quota_col], quota_n, id_col=id_col, seed=split_seed + ":quota"
        )
    if splits is not None:
        out = split_assign(out, id_col, splits, seed=split_seed)
    if pack_budget is not None:
        # NULL text counts 0 tokens (size(NULL) is -1 under non-ANSI
        # Spark and would shift every later doc's token_offset back)
        out = out.withColumn(
            "n_tokens",
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(r"\S+"), 0
                )
            ).cast("long"),
        )
        out = pack_sequences(
            out, id_col, "n_tokens", pack_budget,
            group_cols=pack_group_cols
            or (["split"] if splits is not None else None),
        )
    return out
