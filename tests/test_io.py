"""Source/sink roundtrips and the partition-pruning claim."""

import pytest

from prefixtree_spark.sources.io import convert_to_parquet, read_source, write_sink


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(
        [(1, "a", "train"), (2, "b", "val"), (3, "c", "train")],
        ["id", "name", "split"],
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, small, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_sink(small, path, format=fmt)
    schema = "id BIGINT, name STRING, split STRING" if fmt in ("csv", "json") else None
    back = read_source(spark, path, format=fmt, schema=schema)
    assert sorted((r.id, r.name, r.split) for r in back.collect()) == [
        (1, "a", "train"), (2, "b", "val"), (3, "c", "train"),
    ]


def test_partitioned_write_prunes(spark, small, tmp_path):
    path = str(tmp_path / "parted")
    write_sink(small, path, partition_by=["split"])
    back = read_source(spark, path).where("split = 'train'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the equality filter becomes partition pruning, not a data filter
    assert "PartitionFilters: [isnotnull(split" in plan
    assert back.count() == 2


def test_convert_to_parquet(spark, small, tmp_path):
    src, dst = str(tmp_path / "src_csv"), str(tmp_path / "dst_pq")
    write_sink(small, src, format="csv")
    out = convert_to_parquet(
        spark, src, dst, format="csv", schema="id BIGINT, name STRING, split STRING"
    )
    assert out.count() == 3
    assert spark.read.parquet(dst).columns == out.columns


def test_read_source_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="format"):
        read_source(spark, "/tmp/x", format="avroish")


def test_compact_small_files(spark, tmp_path):
    from prefixtree_spark.sources.io import compact, read_source

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(src)
    import os

    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src == 64
    n_out = compact(spark, src, dst, target_file_mb=256)
    n_dst = sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))
    assert n_out == n_dst == 1  # 10k longs << 256 MB -> one file
    # data preserved
    assert read_source(spark, dst).count() == 10_000
    assert {r.id for r in read_source(spark, dst).collect()} == set(range(10_000))


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema drift across ingest batches (a new column appears in a
    later crawl) reads back as the UNION schema with mergeSchema —
    option passthrough covers it; old rows surface NULL for the new
    column and downstream filters still push down."""
    from prefixtree_spark.sources.io import read_source, write_sink

    d = str(tmp_path / "evolving")
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    write_sink(old, d + "/batch=1", format="parquet")
    new = spark.createDataFrame(
        [(3, "c", 0.9), (4, "d", 0.2)], ["id", "name", "quality"]
    )
    write_sink(new, d + "/batch=2", format="parquet")

    merged = read_source(spark, d, format="parquet", mergeSchema="true")
    assert set(merged.columns) >= {"id", "name", "quality"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].quality is None and rows[3].quality == 0.9
    assert merged.where("quality > 0.5").count() == 1
