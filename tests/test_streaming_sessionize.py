"""Stateful streaming sessionize: cross-microbatch state continuation
must reproduce the batch sessionize result exactly."""

import time

import pandas as pd
import pytest

from prefixtree_spark.operators.relational import sessionize
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.events import EVENTS_SCHEMA, read_events_stream
from prefixtree_spark.streaming.sessionize import streaming_sessionize
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """Events split into two time-ordered files → two microbatches,
    forcing sessions to continue across state boundaries."""
    d = tmp_path_factory.mktemp("events_split")
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    pdf.iloc[:mid].to_parquet(d / "batch_1.parquet", index=False)
    time.sleep(1.1)  # file-stream orders by modification time
    pdf.iloc[mid:].to_parquet(d / "batch_2.parquet", index=False)
    return str(d)


def test_stateful_sessionize_equals_batch(spark, split_events_dir):
    stream = read_events_stream(spark, split_events_dir, maxFilesPerTrigger="1")
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_raw = spark.table("sessions_test").toPandas()
    assert q.lastProgress is not None
    # ≥2 microbatches ran (state crossed batches)
    assert int(q.lastProgress["batchId"]) >= 1
    # final value per session = the row with max n_events per
    # (user, session_start); provisional re-emissions are superseded
    final = (
        got_raw.sort_values("n_events")
        .groupby(["user_id", "session_start_us"], as_index=False)
        .last()
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in final.itertuples()
    }
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in sessionize(load_table(spark, SF_SMOKE, "events"), gap_minutes=30).collect()
    }
    assert got == batch
