"""Structured Streaming: the streaming tumbling-count result on a file
stream (availableNow trigger) must equal the batch twin on the same
input."""

import shutil

import pytest

from prefixtree_spark.operators.relational import tumbling_counts
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    streaming_tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the file-stream source requires a DIRECTORY of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    result = streaming_tumbling_counts(stream)
    got = run_stream_to_memory(spark, result, "tumbling_test", output_mode="complete")
    batch = tumbling_counts(load_table(spark, SF_SMOKE, "events"))
    g = {
        (r.window_start_us, r.event_type): r.n_events
        for r in got.collect()
    }
    b = {
        (r.window_start_us, r.event_type): r.n_events
        for r in batch.collect()
    }
    assert g == b and len(g) > 0


def test_streaming_dedup_equals_batch_distinct(spark, events_dir, tmp_path):
    """Streamed watermarked dropDuplicates == batch distinct on
    event_id, including a replayed (duplicated) file."""
    import shutil as sh

    from prefixtree_spark.streaming.events import streaming_dedup_events

    d = tmp_path / "dup_events"
    d.mkdir()
    sh.copy(f"{events_dir}/events.parquet", d / "a.parquet")
    sh.copy(f"{events_dir}/events.parquet", d / "b.parquet")  # replay
    stream = read_events_stream(spark, str(d))
    deduped = streaming_dedup_events(stream)
    # non-aggregating stream: the helper's default append mode applies
    sink = run_stream_to_memory(
        spark, deduped.select("event_id"), "dedup_test", output_mode="append"
    )
    got = sorted(r.event_id for r in sink.collect())
    exp = sorted(
        r.event_id
        for r in load_table(spark, SF_SMOKE, "events").select("event_id").distinct().collect()
    )
    assert got == exp


def test_streaming_has_watermark(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    result = streaming_tumbling_counts(stream, watermark="2 hours")
    assert "watermark" in result._jdf.queryExecution().analyzed().toString().lower()
