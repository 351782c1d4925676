"""Streaming ingest dedup == batch twins (round-5: the last
LLM-pipeline stage without a streaming counterpart).

``streaming_exact_dedup`` shares the exact groupBy/min/count plan with
``dedup.exact_dedup``, so after an availableNow run in complete mode
the sink must equal the batch aggregate row-for-row — including on a
replayed (duplicated) source, where both twins see doubled counts.
``streaming_drop_duplicates`` keeps first arrivals per content key:
only the surviving KEY SET is deterministic, so that is what the
batch-equivalence asserts."""

import shutil

import pytest

from prefixtree_spark.operators import dedup
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.dedup import (
    streaming_drop_duplicates,
    streaming_exact_dedup,
)
from prefixtree_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replayed_dir(tmp_path_factory):
    # the same file twice: an at-least-once source that replayed a batch
    d = tmp_path_factory.mktemp("events_replay")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "b.parquet")
    return str(d)


def _rows(df):
    return {(r.event_type, r.props, r.keep_id, r.n_copies) for r in df.collect()}


def test_stream_exact_dedup_equals_batch(spark, replayed_dir):
    stream = read_events_stream(spark, replayed_dir)
    assert stream.isStreaming
    got = run_stream_to_memory(
        spark,
        streaming_exact_dedup(stream, ["event_type", "props"], "event_id"),
        "t_stream_exact_dedup",
        output_mode="complete",
    )
    # batch twin over the SAME doubled input (read the replay dir)
    batch_in = spark.read.parquet(replayed_dir)
    batch = dedup.exact_dedup(batch_in, ["event_type", "props"], "event_id")
    assert _rows(got) == _rows(batch) and got.count() > 0
    # replay is visible in the counts: every group even-sized
    assert all(r.n_copies % 2 == 0 for r in got.collect())


def test_stream_drop_duplicates_key_set(spark, replayed_dir):
    """First-arrival passthrough: one surviving row per content key,
    and the key set equals the batch distinct — even with the source
    replayed (the duplicate file arrives within the watermark)."""
    stream = read_events_stream(spark, replayed_dir)
    got = run_stream_to_memory(
        spark,
        streaming_drop_duplicates(
            stream, ["event_type", "props"], ts_col="ts", watermark="2 hours"
        ),
        "t_stream_dropdup",
        output_mode="append",
    )
    keys = [(r.event_type, r.props) for r in got.select("event_type", "props").collect()]
    assert len(keys) == len(set(keys))  # exactly one survivor per key
    batch_keys = {
        (r.event_type, r.props)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type", "props")
        .distinct()
        .collect()
    }
    assert set(keys) == batch_keys


def test_stream_exact_dedup_workload_matches_batch_workload(spark):
    """The registered gate workload (really streaming) must produce the
    same rows as its batch twin workload — they share one oracle."""
    import prefixtree_spark.workloads_ext  # noqa: F401  (registers)
    from prefixtree_spark.workloads import QUERIES

    got = _rows(QUERIES["stream_exact_dedup_events"](spark, SF_SMOKE))
    batch = _rows(QUERIES["dedup_exact_events"](spark, SF_SMOKE))
    assert got == batch and got
