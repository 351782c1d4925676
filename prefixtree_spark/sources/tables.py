"""Parquet table sources (≡ DATASET(file, layout, THOR) scans,
PrefixTree.ecl:601; SURVEY.md §2.1 S1).

Declarative ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free — tests assert
``PushedFilters`` appears in the physical plan (SURVEY.md §4 O13).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # the events fixture's ts physical type has varied across driver
        # generations (TIMESTAMP(NANOS), which the Spark reader only
        # accepts as long; TIMESTAMP(MICROS) isAdjustedToUTC=false,
        # which reads as TIMESTAMP_NTZ). Normalize every layout to a
        # session-TZ (UTC) TimestampType at µs grain so downstream
        # operators and oracles see one schema.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos-as-long → µs timestamp; integer division: `/` is
            # double division and rounds the µs, drifting ±1µs from
            # DuckDB's exact epoch_us
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            # value-preserving under the UTC session TZ
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
