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


def test_stream_stream_attribution_equals_batch(spark, tmp_path):
    """Watermarked stream-stream join (purchases x prior views, same
    user, 60-min lookback) must equal its batch twin — including pairs
    whose two sides arrive in DIFFERENT microbatches (both-sided state
    buffering)."""
    import shutil
    import time as _t

    import pandas as pd

    from prefixtree_spark.operators.relational import attribution_join
    from prefixtree_spark.sources.tables import load_table
    from prefixtree_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )
    from prefixtree_spark.streaming.joins import streaming_attribution_join
    from tests.conftest import SF_SMOKE

    d = tmp_path / "attr_src"
    d.mkdir()
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values("ts")
    mid = len(pdf) // 2
    pdf.iloc[:mid].to_parquet(d / "b1.parquet", index=False)
    _t.sleep(1.1)
    pdf.iloc[mid:].to_parquet(d / "b2.parquet", index=False)

    stream = read_events_stream(spark, str(d), maxFilesPerTrigger="1")
    got_df = run_stream_to_memory(
        spark,
        streaming_attribution_join(stream, window_minutes=60),
        "attr_stream_test",
        output_mode="append",
        timeout_s=180,
    )
    got = {tuple(r) for r in got_df.collect()}
    batch = {
        tuple(r)
        for r in attribution_join(
            load_table(spark, SF_SMOKE, "events"), window_minutes=60
        ).collect()
    }
    assert got == batch
    assert len(got) > 0
