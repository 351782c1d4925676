"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.9); these are the
engine's extension ops, built so the BATCH and STREAMING versions share
one logical plan: ``operators/relational.tumbling_counts`` is the batch
twin of ``streaming_tumbling_counts`` — tests assert the streaming
result (availableNow file stream → memory sink) equals the batch
result on the same input.

Watermarking: event-time watermark bounds state for late data; with
tumbling windows the state per (window, event_type) is one row — at
100 TB/day the state store grows with windows × types, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """File-source stream over events parquet, normalizing ``ts`` to a
    session-TZ µs timestamp exactly like the batch source (see
    sources/tables.py). The file source requires a schema up front:
    pass ``schema`` explicitly to start a stream over a directory that
    is empty at start time (files arriving later must match it);
    otherwise one footer-only batch read infers it — which requires at
    least one file to exist, so an empty/missing directory fails fast
    here with a clear error instead of a generic AnalysisException
    mid-plan. ``options`` pass through to the source (e.g.
    ``maxFilesPerTrigger=1`` to bound batch size)."""
    from prefixtree_spark.sources.tables import (
        normalize_events_ts,
        scoped_nanos_as_long,
    )

    if schema is None:
        try:
            with scoped_nanos_as_long(spark):
                schema = spark.read.parquet(path).schema
        except Exception as exc:  # AnalysisException: no files / no path
            raise ValueError(
                f"cannot infer the events stream schema from {path!r} "
                f"(directory empty or missing at stream start?). Pass "
                f"schema= explicitly to stream from a not-yet-populated "
                f"directory."
            ) from exc
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return normalize_events_ts(spark, reader.parquet(path))


def streaming_tumbling_counts(
    stream: DataFrame, *, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark —
    the streaming twin of relational.tumbling_counts (n_users uses
    approx_count_distinct: exact distinct isn't available in streaming
    aggregations; the batch twin stays exact)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "n_users_approx",
        )
    )


def streaming_dedup_events(
    stream: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup on event_id: the standard at-least-once →
    exactly-once repair for replayed sources. Uses
    ``dropDuplicatesWithinWatermark`` so per-key state IS evicted once
    the watermark passes — plain ``dropDuplicates(['event_id'])`` would
    keep one state entry per all-time event forever (the key set lacks
    the event-time column, so the watermark never frees anything)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    spark: SparkSession,
    result: DataFrame,
    name: str,
    *,
    output_mode: str,
    timeout_s: int = 120,
) -> DataFrame:
    """Drive a streaming DataFrame to completion with the availableNow
    trigger into an in-memory sink; returns the sink table.

    ``output_mode`` is REQUIRED (no default): the right mode depends on
    the query shape — "complete" for full-aggregate queries, "append"
    for non-aggregating / watermarked ones — and a silent default flip
    changes an aggregate stream's semantics without any caller-side
    code change (round-2 advice). Callers state what they mean."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout: stop the query and
    # FAIL rather than hand back a partially-populated memory table the
    # still-running stream keeps mutating behind the caller's back
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream {name!r} did not finish within {timeout_s}s"
        )
    return spark.table(name)
