"""Stream-stream joins — the last major Structured Streaming surface
the engine exposes: watermarked, state-bounded two-sided joins.

``streaming_attribution_join`` is the canonical shape (ad/behavior
attribution): each purchase joins every view by the same user within a
lookback window. Both sides carry event-time watermarks AND the join
condition bounds view_ts to a closed interval around purchase_ts, so
Spark can evict both sides' state once the watermark passes — without
the time-range bound the state store would hold every view forever.
State size ≈ events inside (watermark + window) per side, independent
of stream length.

The batch twin is ``operators.relational.attribution_join`` (same
logical join, oracled by the driver as ``events_attribution``); the
stream==batch equality test pins that the incremental execution
computes the identical result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution_join(
    stream: DataFrame,
    *,
    window_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases ⋈ prior views of the same user within
    ``window_minutes`` (inclusive bounds), on a watermarked stream of
    events (``user_id``, ``event_id``, ``event_type``, ``ts``).
    Output mode: append (inner stream-stream joins emit as soon as
    both sides are present)."""
    views = (
        stream.where("event_type = 'view'")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        stream.where("event_type = 'purchase'")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.alias("p").join(
        views.alias("v"),
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.view_ts") <= F.col("p.purchase_ts"))
        & (
            F.col("v.view_ts")
            >= F.col("p.purchase_ts") - F.expr(f"interval {window_minutes} minutes")
        ),
        "inner",
    )
    return joined.select(
        F.col("p.user_id").alias("user_id"),
        "purchase_id",
        "view_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts").alias("view_ts_us"),
    )
