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

def read_events_stream(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """File-source stream over events parquet, normalizing ``ts`` to a
    session-TZ µs timestamp exactly like the batch source (the fixture's
    physical ts type has varied across driver generations — see
    sources/tables.py). The file-source requires an explicit schema, so
    one footer-only batch read supplies it. ``options`` pass through to
    the source (e.g. ``maxFilesPerTrigger=1`` to bound batch size)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.parquet(path)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # TIMESTAMP(NANOS) read as long
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


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
    q.awaitTermination(timeout_s)
    return spark.table(name)
