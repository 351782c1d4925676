"""Generic columnar-agnostic sources and sinks.

The engine's pipelines are format-independent (everything downstream
is DataFrame-in / DataFrame-out); these helpers make the boundary
explicit and keep the scan declarative so Catalyst's pushdown/pruning
applies wherever the format supports it.

Format guidance at 100 TB, stated once here rather than re-litigated
per call site:
  - parquet (default): columnar, predicate pushdown + column pruning
    reach the scan; always the answer for analytics-shaped data.
  - csv / json: row-major interchange formats — schema inference costs
    an extra full pass, so ALWAYS pass ``schema`` for datasets that
    matter; pushdown is filter-only (no column pruning at the byte
    level). Use for ingest boundaries, convert to parquet immediately
    (``convert_to_parquet``).
  - orc: columnar alternative, same planner benefits as parquet.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

_READ_FORMATS = ("parquet", "orc", "csv", "json")


def read_source(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Declarative scan of ``path`` in the given format. ``schema`` is
    a DDL string (``"id BIGINT, name STRING"``); omitting it on
    csv/json triggers inference (an extra pass over the data — fine
    interactively, wrong inside a 100 TB pipeline). csv defaults to
    ``header=true`` unless overridden."""
    if format not in _READ_FORMATS:
        raise ValueError(f"format must be one of {_READ_FORMATS}, got {format!r}")
    reader = spark.read.format(format)
    if format == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces the
    hive-style directory layout that turns downstream equality filters
    on those columns into PARTITION PRUNING (entire directories never
    open) — the first layout decision for any table re-read by key
    (e.g. split=train/val/test from ``split_assign``, or per-source
    corpus shards)."""
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    format: str = "parquet",
    target_file_mb: int = 256,
) -> int:
    """Small-files compaction: rewrite ``src_path`` into files of
    ~``target_file_mb`` each; returns the output file count.

    The operational problem this solves: streaming sinks, incremental
    ingests, and over-parallel writes leave thousands of KB-sized
    files, and at 100 TB the NameNode/listing cost plus per-file open
    overhead dominates the scan. File count is sized from the SOURCE
    byte size (listing metadata — no data pass); the rewrite is one
    job whose only wide stage is the ``repartition`` round-robin
    exchange. Rewrites to a NEW path: an in-place rewrite that crashes
    mid-job loses the table (atomic swap is the table format's job —
    Delta/Iceberg OPTIMIZE; on plain directories the caller swaps)."""
    sc = spark.sparkContext
    hadoop_path = sc._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hadoop_path.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = read_source(spark, src_path, format=format)
    write_sink(df.repartition(n_files), dst_path, format=format)
    out_path = sc._jvm.org.apache.hadoop.fs.Path(dst_path)
    listed = fs.listStatus(out_path)
    return sum(
        1 for st in listed if st.getPath().getName().endswith(f".{format}")
    )


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    format: str = "csv",
    schema: str | None = None,
    partition_by: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """Ingest boundary: read a row-major interchange format once,
    land it as parquet (optionally hive-partitioned), return the
    parquet-backed frame. The one place a pipeline should ever scan
    csv/json twice is never."""
    df = read_source(spark, src_path, format=format, schema=schema, **options)
    write_sink(df, dst_path, format="parquet", partition_by=partition_by)
    return spark.read.parquet(dst_path)
