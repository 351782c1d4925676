"""Multi-dimensional file layout: Z-order clustering.

Single-key range clustering (``io.publish_version(cluster_by=[k])``)
gives perfect file pruning on ``k`` and none on anything else. When
readers box-filter on TWO keys (user × time, domain × crawl date,
cell × id), the lakehouse answer is a space-filling curve: bucket each
key, interleave the bucket bits into one Z-value, range-cluster on
that. Files then cover axis-aligned boxes of the key space, so a box
predicate intersects O(perimeter) files instead of all of them — both
keys prune, neither perfectly, which beats one key pruning perfectly
and the other not at all once queries filter on both.

Spark-first: bucketing is ``width_bucket`` (linear min-max buckets,
one bounded agg scan for the bounds), the interleave is a
``shiftleft``/``bitwiseOR`` expression tree — all JVM codegen, no UDF.
Linear buckets trade Delta's sampled range boundaries for zero
sampling passes; heavy skew concentrates buckets exactly as it
concentrates file ranges, and the min-max stats pruning this feeds
stays correct regardless (stats are per-file truths, the curve only
shapes WHICH rows share a file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "date",
            "timestamp", "timestamp_ntz", "decimal"}


def zorder_key(
    df: DataFrame, cols: list[str], *, bits: int = 12
) -> tuple[DataFrame, str]:
    """Append a Z-value column interleaving ``bits`` linear-bucket bits
    per column of ``cols`` (numeric / date / timestamp; 2-4 columns).
    Returns (df_with_key, key_column_name). One agg scan computes the
    min/max bounds; everything else is a codegen expression.

    ``bits`` bounds the curve resolution: 12 bits × 2 cols = a 4096 ×
    4096 grid, far finer than any realistic file count, so file
    boundaries land on curve boundaries with room to spare. Total
    interleaved width must fit a signed long (``bits * len(cols)`` ≤
    62)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key wants 2-4 columns; use cluster_by for 1")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} × {len(cols)} cols exceeds a long")
    base = dict(df.dtypes)
    for c in cols:
        t = base.get(c, "")
        if t.split("(")[0] not in _NUMERIC:
            raise ValueError(
                f"zorder column {c!r} has non-orderable-numeric type {t!r}; "
                "cast dates/strings to a numeric rank first"
            )
    name = "_pt_z"
    while name in df.columns:
        name += "_"
    # one scan for all bounds. Temporal types can't CAST to double in
    # Spark 4 (DATATYPE_MISMATCH) — route them through epoch numerics:
    # DATE → unix_date (days), TIMESTAMP[_NTZ] → unix_micros. Only
    # monotonicity matters here (values feed width_bucket), so the
    # session-tz shift in the NTZ→TIMESTAMP hop is harmless.
    def _as_num(c: str):
        t = base.get(c, "").split("(")[0]
        if t == "date":
            return F.unix_date(F.col(c)).cast("double")
        if t in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        return F.col(c).cast("double")

    nums = {c: _as_num(c) for c in cols}
    bounds = df.agg(
        *[F.min(nums[c]).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(nums[c]).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo = bounds[f"lo_{j}"]
        hi = bounds[f"hi_{j}"]
        if lo is None or hi is None or hi <= lo:
            continue  # constant/all-NULL column contributes nothing
        b = F.width_bucket(
            nums[c], F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets)
        )
        # width_bucket: NULL→NULL, x==hi→n+1; clamp to [0, n-1], 0-based
        b = F.coalesce(
            F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1)),
            F.lit(0),
        ).cast("long")
        for i in range(bits):
            # bit i of column j lands at interleaved position
            # i * n_cols + j (low bits vary fastest across all columns)
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return df.withColumn(name, z), name


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Lay ``df`` out along the Z-curve of ``cols``: range-partition on
    the interleaved key (AQE sizes the file count unless
    ``num_partitions`` pins it) and sort rows by it within partitions.
    The key column is dropped after shaping — it exists to order rows,
    not to be stored; per-file min/max stats of the ORIGINAL columns
    are what readers prune by."""
    keyed, name = zorder_key(df, cols, bits=bits)
    if num_partitions:
        shaped = keyed.repartitionByRange(num_partitions, name)
    else:
        shaped = keyed.repartitionByRange(name)
    return shaped.sortWithinPartitions(name).drop(name)
