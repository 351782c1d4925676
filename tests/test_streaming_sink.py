"""Exactly-once append sink: txn-id manifest dedup, foreachBatch retry
semantics, end-to-end file-source streaming."""

import time

import pytest

from prefixtree_spark.sources.io import (
    append_published,
    publish_version,
    published_segments,
    published_version,
    read_published,
)
from prefixtree_spark.streaming.sink import (
    published_txn_sink,
    stream_append_published,
)


def _rows(spark, root):
    return sorted(r.id for r in read_published(spark, root).collect())


def test_append_txn_is_exactly_once(spark, tmp_path):
    """Replaying an append with the same txn id is a no-op returning
    the original version; a different txn id appends normally."""
    root = str(tmp_path / "txn")
    publish_version(spark.createDataFrame([(1,)], ["id"]), root)
    batch = spark.createDataFrame([(2,), (3,)], ["id"])
    v = append_published(batch, root, txn="job:7")
    assert v == 2
    assert append_published(batch, root, txn="job:7") == 2  # replay
    assert _rows(spark, root) == [1, 2, 3]
    assert len(published_segments(spark, root)) == 2
    assert append_published(batch, root, txn="job:8") == 3  # new txn
    assert _rows(spark, root) == [1, 2, 2, 3, 3]


def test_append_txn_replay_leaves_no_orphan_dirs(spark, tmp_path):
    import os

    root = str(tmp_path / "txn_orphan")
    batch = spark.createDataFrame([(1,)], ["id"])
    append_published(batch, root, txn="a:1")
    n_dirs = sum(1 for d in os.listdir(root) if d.startswith("v_"))
    append_published(batch, root, txn="a:1")
    assert sum(1 for d in os.listdir(root) if d.startswith("v_")) == n_dirs


def test_append_txn_id_validation(spark, tmp_path):
    root = str(tmp_path / "txn_bad")
    batch = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="txn id"):
        append_published(batch, root, txn="has\ttab")


def test_foreachbatch_sink_retry_is_single_segment(spark, tmp_path):
    """Spark retries a micro-batch by re-invoking the sink with the
    SAME batch_id — the sink must land it once."""
    root = str(tmp_path / "sink_retry")
    sink = published_txn_sink(root, str(tmp_path / "ckpt"))
    batch = spark.createDataFrame([(1,), (2,)], ["id"])
    sink(batch, 0)
    sink(batch, 0)  # the retry
    assert _rows(spark, root) == [1, 2]
    sink(batch, 1)  # next batch appends
    assert _rows(spark, root) == [1, 1, 2, 2]


def test_stream_append_published_end_to_end_and_restart(spark, tmp_path):
    """File-source stream lands each batch once; a RESTART from the
    same checkpoint (which replays any uncommitted batch) adds nothing
    once all files are processed; new files still flow."""
    src = spark.createDataFrame([(i,) for i in range(40)], ["id"])
    stream_dir = str(tmp_path / "arrivals")
    src.where("id < 20").coalesce(1).write.parquet(f"{stream_dir}/b0")
    time.sleep(1.1)
    src.where("id >= 20").coalesce(1).write.parquet(f"{stream_dir}/b1")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt_e2e")

    def run():
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(stream_dir)
        )
        q = stream_append_published(stream, root, checkpoint_dir=ckpt)
        q.awaitTermination(300)

    run()
    assert _rows(spark, root) == list(range(40))
    v1 = published_version(spark, root)
    run()  # restart, nothing new
    assert _rows(spark, root) == list(range(40))
    assert published_version(spark, root) == v1
    src.where("id >= 20").withColumn("id", src.id + 100).coalesce(1).write.parquet(
        f"{stream_dir}/b2"
    )
    run()
    assert _rows(spark, root) == list(range(40)) + list(range(120, 140))
