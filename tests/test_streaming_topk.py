"""Stateful streaming top-k: the cross-microbatch leaderboard must
equal the batch top-k once all events have arrived, and a batch that
doesn't change a group's leaderboard must not re-emit it."""

import time

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.events import read_events_stream
from prefixtree_spark.streaming.topk import latest_topk, streaming_topk
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_topk_split")
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    pdf.iloc[:mid].to_parquet(d / "batch_1.parquet", index=False)
    time.sleep(1.1)
    pdf.iloc[mid:].to_parquet(d / "batch_2.parquet", index=False)
    return str(d)


def _batch_topk(spark, k):
    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("event_type", F.col("rank").cast("int").alias("rank"), "event_id", "value")
    )


def test_streaming_topk_equals_batch(spark, split_events_dir):
    stream = read_events_stream(spark, split_events_dir, maxFilesPerTrigger="1")
    q = (
        streaming_topk(stream, k=5)
        .writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert int(q.lastProgress["batchId"]) >= 1  # state crossed batches
    got_df = latest_topk(spark.table("topk_test"))
    got = {(r.event_type, r.rank, r.event_id) for r in got_df.collect()}
    want = {(r.event_type, r.rank, r.event_id) for r in _batch_topk(spark, 5).collect()}
    assert got == want


def test_streaming_topk_emits_only_on_change(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(path, rows):
        # (event_id, value)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([1_000_000_000] * len(rows), pa.int64()),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    d = tmp_path / "nochange"
    d.mkdir()
    write(str(d / "b1.parquet"), [(1, 100.0), (2, 90.0), (3, 80.0)])
    time.sleep(1.1)
    # batch 2: all below the current top-3 → leaderboard unchanged
    write(str(d / "b2.parquet"), [(4, 1.0), (5, 2.0)])
    stream = read_events_stream(spark, str(d), maxFilesPerTrigger="1")
    q = (
        streaming_topk(stream, k=3)
        .writeStream.format("memory")
        .queryName("topk_nochange")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table("topk_nochange").toPandas()
    # exactly ONE version was ever emitted (batch 2 changed nothing)
    assert set(raw["version"]) == {1}
    assert list(raw.sort_values("rank")["event_id"]) == [1, 2, 3]


def test_streaming_topk_replayed_event_is_idempotent(spark, tmp_path):
    """An at-least-once source redelivering an event already ON the
    leaderboard must neither seat it twice (two ranks for one id) nor
    bump the version; a replay batch that also carries one genuinely
    new top event changes exactly that seat."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([1_000_000_000] * len(rows), pa.int64()),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    d = tmp_path / "replay"
    d.mkdir()
    write(str(d / "b1.parquet"), [(1, 100.0), (2, 90.0), (3, 80.0)])
    time.sleep(1.1)
    # batch 2: pure replay of the current board → must emit nothing
    write(str(d / "b2.parquet"), [(1, 100.0), (2, 90.0)])
    time.sleep(1.1)
    # batch 3: replay again + one event that takes rank 1
    write(str(d / "b3.parquet"), [(1, 100.0), (9, 200.0)])
    stream = read_events_stream(spark, str(d), maxFilesPerTrigger="1")
    q = (
        streaming_topk(stream, k=3)
        .writeStream.format("memory")
        .queryName("topk_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table("topk_replay").toPandas()
    assert set(raw["version"]) == {1, 2}  # batch 2 emitted nothing
    latest = raw[raw["version"] == 2].sort_values("rank")
    assert list(latest["event_id"]) == [9, 1, 2]
    assert list(latest["rank"]) == [1, 2, 3]
