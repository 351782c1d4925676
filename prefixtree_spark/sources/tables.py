"""Parquet table sources (≡ DATASET(file, layout, THOR) scans,
PrefixTree.ecl:601; SURVEY.md §2.1 S1).

Declarative ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free — tests assert
``PushedFilters`` appears in the physical plan (SURVEY.md §4 O13).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@contextlib.contextmanager
def scoped_nanos_as_long(spark: SparkSession):
    """Scope ``spark.sql.legacy.parquet.nanosAsLong`` to one read.

    The flag mutates the shared session; left set, every later parquet
    read with nanos timestamps silently comes back as LongType. The
    conf only affects schema resolution at read time (the resolved plan
    keeps its types afterwards), so save/restore is safe.
    """
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def normalize_events_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize the events fixture's ``ts`` to a session-TZ (UTC)
    TimestampType at µs grain, whatever physical layout it was written
    with (the fixture has varied across driver generations:
    TIMESTAMP(NANOS), which the Spark reader only accepts as long, and
    TIMESTAMP(MICROS) isAdjustedToUTC=false, which reads as
    TIMESTAMP_NTZ)."""
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanos-as-long → µs timestamp; integer FLOOR division: `/` is
        # double division and rounds the µs (±1µs drift vs DuckDB's
        # epoch_us), and bare `div` truncates toward zero — wrong by
        # 1µs for pre-epoch (negative) nanos, where epoch_us floors.
        # Subtracting pmod first makes the numerator an exact multiple
        # of 1000, so `div` is then floor for any sign.
        # timestamp_micros is TZ-independent.
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    if isinstance(ts_type, T.TimestampNTZType):
        # The plain cast interprets the NTZ wall-clock in the session
        # TZ; it is value-preserving ONLY under UTC (session.py sets
        # it, but callers may build their own session) — fail loudly
        # rather than silently shifting every timestamp by the local
        # offset.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                f"events ts is TIMESTAMP_NTZ; converting it requires "
                f"spark.sql.session.timeZone=UTC (got {tz!r}). Use "
                f"prefixtree_spark.session.get_spark() or set the conf."
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        with scoped_nanos_as_long(spark):
            df = spark.read.parquet(path)
        return normalize_events_ts(spark, df)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
