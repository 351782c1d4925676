"""Z-order layout: the interleaved key must BE the Morton code on a
clean grid, and the shaped files must give BOTH filter columns file-
stats pruning power (the single-key layout's trailing column has
none)."""

import os

import pyarrow.parquet as pq
import pytest

from prefixtree_spark.sources.layout import zorder_cluster, zorder_key


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_is_morton_code_on_grid(spark):
    """On a 0..(2^b-1) integer grid the linear buckets are the values
    themselves, so the key must equal the textbook Morton code."""
    b = 4
    n = 1 << b
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, ["x", "y"])
    keyed, name = zorder_key(df, ["x", "y"], bits=b)
    got = {(r.x, r.y): r[name] for r in keyed.collect()}
    for (x, y), z in got.items():
        assert z == _morton2(x, y, b), (x, y, z)


def test_zorder_key_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, 2.0, "s")], ["a", "b", "c"])
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        zorder_key(df, ["a", "c"])
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_key_null_and_constant_columns(spark):
    """NULLs bucket to 0 (not NULL keys — a NULL z would shuffle to one
    partition); a constant column contributes nothing but doesn't
    break the curve over the others."""
    df = spark.createDataFrame(
        [(None, 0, 7), (3, 1, 7), (0, 2, 7)], ["x", "y", "k"]
    )
    keyed, name = zorder_key(df, ["x", "y"], bits=2)
    vals = {r.y: r[name] for r in keyed.collect()}
    assert vals[0] == _morton2(0, 0, 2)  # NULL x → bucket 0
    keyed2, name2 = zorder_key(df.where("x is not null"), ["x", "k"], bits=2)
    # k constant: key reduces to x's bits at even positions
    for r in keyed2.collect():
        assert r[name2] == _morton2(3 if r.x == 3 else 0, 0, 2)


def _file_ranges(path, cols):
    out = []
    for dirpath, _, files in os.walk(path):
        if "_manifest" in dirpath:
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, f)).metadata
            r = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema in cols and c.statistics:
                        lo, hi = r.get(c.path_in_schema, (c.statistics.min, c.statistics.max))
                        r[c.path_in_schema] = (
                            min(lo, c.statistics.min), max(hi, c.statistics.max)
                        )
            if r:
                out.append(r)
    return out


def _hits(ranges, col, lo, hi):
    return sum(1 for r in ranges if r[col][0] <= hi and lo <= r[col][1])


def test_zorder_files_prune_on_both_axes(spark, tmp_path):
    """16 files over a 64×64 grid: x-only range clustering prunes x
    filters perfectly and y filters NOT AT ALL (every file spans all
    of y); the Z-curve layout prunes on BOTH axes — a one-axis stripe
    filter touches at most half the files either way."""
    import pyspark.sql.functions as F

    n = 64
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .repartition(8)
    )
    xdir = str(tmp_path / "xclustered")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xdir)
    zdir = str(tmp_path / "zordered")
    zorder_cluster(df, ["x", "y"], bits=6, num_partitions=16).write.parquet(zdir)

    xr = _file_ranges(xdir, {"x", "y"})
    zr = _file_ranges(zdir, {"x", "y"})
    assert len(xr) == 16 and len(zr) == 16
    # stripe on y: x-layout reads everything, z-layout prunes
    assert _hits(xr, "y", 8, 15) == 16
    assert _hits(zr, "y", 8, 15) <= 8
    # stripe on x: both prune (x-layout perfectly, z-layout partially)
    assert _hits(xr, "x", 8, 15) <= 3
    assert _hits(zr, "x", 8, 15) <= 8
    # 2D box: z-layout beats the x-only layout's y-blindness
    box_z = sum(
        1 for r in zr
        if r["x"][0] <= 15 and 8 <= r["x"][1] and r["y"][0] <= 15 and 8 <= r["y"][1]
    )
    assert box_z <= 4


def test_compact_published_zorder_roundtrip(spark, tmp_path):
    """compact_published(cluster_by=[x,y], zorder=True) preserves
    content and lays the single live segment out along the curve."""
    import pyspark.sql.functions as F

    from prefixtree_spark.sources import io as pio

    n = 32
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    root = str(tmp_path / "ztbl")
    pio.publish_version(df.where("y < 16"), root)
    pio.append_published(df.where("y >= 16"), root)
    pio.compact_published(
        spark, root, target_file_mb=1, cluster_by=["x", "y"], zorder=True
    )
    pio.vacuum_published(spark, root, keep=1, grace_s=0)
    out = pio.read_published(spark, root)
    assert out.count() == n * n
    assert "_pt_z" not in out.columns
    zr = _file_ranges(root, {"x", "y"})
    if len(zr) > 1:  # with several files, no file may span the whole grid
        assert any(r["y"][1] - r["y"][0] < n - 1 for r in zr)
        assert any(r["x"][1] - r["x"][0] < n - 1 for r in zr)


def test_zorder_key_date_and_timestamp_columns(spark, tmp_path):
    """Temporal columns are advertised (docstring: numeric / date /
    timestamp) but DATE and TIMESTAMP_NTZ cannot CAST to double in
    Spark 4 — the key must route them through epoch numerics, and the
    resulting buckets must still order by time."""
    import datetime

    import pyspark.sql.functions as F

    rows = [
        (i, datetime.date(2020, 1, 1) + datetime.timedelta(days=i * 30),
         datetime.datetime(2020, 1, 1) + datetime.timedelta(hours=i))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, ["x", "d", "ts"])
    # date × int
    keyed, name = zorder_key(df, ["x", "d"], bits=4)
    got = {r.x: r[name] for r in keyed.collect()}
    # x and d increase together → the Morton code must too
    xs = sorted(got)
    assert [got[x] for x in xs] == sorted(got.values())
    # timestamp × int and timestamp_ntz × int both key fine
    keyed2, n2 = zorder_key(df, ["x", "ts"], bits=4)
    assert keyed2.where(F.col(n2).isNull()).count() == 0
    ntz = df.withColumn("tsn", F.col("ts").cast("timestamp_ntz"))
    keyed3, n3 = zorder_key(ntz, ["x", "tsn"], bits=4)
    assert keyed3.where(F.col(n3).isNull()).count() == 0
    # and the cluster path (what compact_published(zorder=...) calls)
    # writes without AnalysisException
    out = str(tmp_path / "zdate")
    zorder_cluster(df, ["x", "d"], bits=4, num_partitions=2).write.parquet(out)
    assert spark.read.parquet(out).count() == 16
