"""Stateful streaming sessionize: cross-microbatch state continuation
must reproduce the batch sessionize result exactly."""

import time

import pandas as pd
import pytest

from prefixtree_spark.operators.relational import sessionize
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.events import read_events_stream
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


def test_late_event_does_not_regress_session_end(spark, tmp_path):
    """A late (out-of-order) event in a later micro-batch must not pull
    session_end backwards and falsely split the session."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(path, rows):
        # (event_id, ts_us, user_id)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * 1000 for r in rows], pa.int64()),  # nanos
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    minute = 60 * 1_000_000
    d = tmp_path / "late"
    d.mkdir()
    write(str(d / "b1.parquet"), [(1, 0 * minute, 7), (2, 20 * minute, 7)])
    time.sleep(1.1)
    # batch 2: one LATE event (t=5min) then a later one at t=40min —
    # 40-20=20min <= 30min gap, so it must still be ONE session
    write(str(d / "b2.parquet"), [(3, 5 * minute, 7), (4, 40 * minute, 7)])
    stream = read_events_stream(spark, str(d), maxFilesPerTrigger="1")
    q = (
        streaming_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table("late_test").toPandas()
    final = (
        raw.sort_values("n_events")
        .groupby(["user_id", "session_start_us"], as_index=False)
        .last()
    )
    assert len(final) == 1  # one session, not split
    r = final.iloc[0]
    assert (r.session_start_us, r.session_end_us, r.n_events) == (0, 40 * minute, 4)


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


def test_timeout_sessionize_closes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout: a user who goes quiet gets their session
    CLOSED (and state evicted) when OTHER users' later events advance
    the watermark — no follow-up event from the idle user needed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prefixtree_spark.streaming.sessionize import (
        streaming_sessionize_timeout,
    )

    minute = 60 * 1_000_000

    def write(path, rows):  # (event_id, ts_us, user_id)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] * 1000 for r in rows], pa.int64()),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(["x"] * len(rows)),
                    "value": pa.array([0.0] * len(rows)),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            path,
        )

    d = tmp_path / "idle"
    d.mkdir()
    # user 7: two events early, then silence. user 8: keeps going much
    # later — its events push the watermark past 7's end + gap. (base
    # offset keeps ts off epoch 0: the first batch's initial watermark
    # IS epoch 0 and the stateful op's late filter is strict.)
    base = 1000 * minute
    write(
        str(d / "b1.parquet"),
        [(1, base, 7), (2, base + 10 * minute, 7), (3, base + 5 * minute, 8)],
    )
    time.sleep(1.1)
    write(
        str(d / "b2.parquet"),
        [(4, base + 500 * minute, 8), (5, base + 505 * minute, 8)],
    )
    stream = read_events_stream(spark, str(d), maxFilesPerTrigger="1")
    q = (
        streaming_sessionize_timeout(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("timeout_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    raw = spark.table("timeout_test").toPandas()
    u7 = raw[raw.user_id == 7]
    # the idle user's session was emitted CLOSED via the timeout path
    closed = u7[u7.closed]
    assert len(closed) == 1
    r = closed.iloc[0]
    assert (r.session_start_us, r.session_end_us, r.n_events) == (base, base + 10 * minute, 2)


def test_cross_batch_gap_before_event_is_own_session(spark, tmp_path):
    """A late event arriving in a LATER batch, earlier than the open
    session by more than the gap, must be its own session (the batch
    twin's lag>gap rule) — not merged into a 2h-wide mega-session."""
    import shutil

    from pyspark.sql import functions as F

    from prefixtree_spark.streaming.events import run_stream_to_memory
    from prefixtree_spark.streaming.sessionize import streaming_sessionize

    base = 1_700_000_000_000_000  # µs
    b1 = spark.createDataFrame(
        [(1, 100, base + 2 * 3600 * 1_000_000)],
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id",
             F.timestamp_micros("ts_us").alias("ts"))
    b2 = spark.createDataFrame(
        [(1, 101, base)],  # 2h earlier than the open session, gap=30min
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id",
             F.timestamp_micros("ts_us").alias("ts"))
    sdir = str(tmp_path / "arrive")
    # maxFilesPerTrigger=1 delivers b1 (the later event) in one
    # micro-batch and b2 (the 2h-earlier event) in the next — the
    # cross-batch out-of-order arrival under test
    b1.coalesce(1).write.parquet(f"{sdir}/b1")
    b2.coalesce(1).write.parquet(f"{sdir}/b2")
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(sdir))
    out = streaming_sessionize(stream, gap_minutes=30)
    got = run_stream_to_memory(
        spark, out, "sess_gap_t2", output_mode="append",
    )
    final = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in got.collect()
    }
    # both events present as SEPARATE sessions somewhere in the output
    assert (1, base, base, 1) in final
    assert any(s == base + 2 * 3600 * 1_000_000 and n == 1
               for (_, s, e, n) in final)
    shutil.rmtree(sdir, ignore_errors=True)


def test_late_events_within_gap_merge_into_one_pre_session(spark, tmp_path):
    """TWO late events within gap of each other, both gap-before the
    open session, must merge into ONE closed pre-session [9:00,9:10]
    (the batch twin merges them) — not two singletons (r5 ADVICE)."""
    import shutil

    from pyspark.sql import functions as F

    from prefixtree_spark.streaming.events import run_stream_to_memory
    from prefixtree_spark.streaming.sessionize import streaming_sessionize

    base = 1_700_000_000_000_000  # µs ≙ "9:00"
    m = 60 * 1_000_000
    b1 = spark.createDataFrame(
        [(1, 100, base + 60 * m)],  # "10:00" opens the session
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
    b2 = spark.createDataFrame(
        [(1, 101, base), (1, 102, base + 10 * m)],  # "9:00" and "9:10"
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
    sdir = str(tmp_path / "latemerge")
    b1.coalesce(1).write.parquet(f"{sdir}/b1")
    b2.coalesce(1).write.parquet(f"{sdir}/b2")
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(sdir))
    out = streaming_sessionize(stream, gap_minutes=30)
    got = run_stream_to_memory(spark, out, "sess_merge_t", output_mode="append")
    closed = {
        (r.session_start_us, r.session_end_us, r.n_events)
        for r in got.collect() if r.closed
    }
    assert (base, base + 10 * m, 2) in closed          # ONE merged pre-session
    assert not any(s == e == base for (s, e, n) in closed)          # no 9:00 singleton
    assert not any(s == e == base + 10 * m for (s, e, n) in closed)  # no 9:10 singleton
    shutil.rmtree(sdir, ignore_errors=True)


def test_late_event_bridges_buffer_into_open_session(spark, tmp_path):
    """Late events at 9:20 then 9:40 against an open 10:00 session
    (gap 30m): 9:40 extends the session (within gap), which then
    bridges the 9:20 buffer — the batch twin yields ONE [9:20,10:00]
    session and so must the stream."""
    import shutil

    from pyspark.sql import functions as F

    from prefixtree_spark.streaming.events import run_stream_to_memory
    from prefixtree_spark.streaming.sessionize import streaming_sessionize

    base = 1_700_000_000_000_000  # µs ≙ "9:00"
    m = 60 * 1_000_000
    b1 = spark.createDataFrame(
        [(1, 100, base + 60 * m)],
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
    b2 = spark.createDataFrame(
        [(1, 101, base + 20 * m), (1, 102, base + 40 * m)],
        "user_id long, event_id long, ts_us long",
    ).select("user_id", "event_id", F.timestamp_micros("ts_us").alias("ts"))
    sdir = str(tmp_path / "latebridge")
    b1.coalesce(1).write.parquet(f"{sdir}/b1")
    b2.coalesce(1).write.parquet(f"{sdir}/b2")
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(sdir))
    out = streaming_sessionize(stream, gap_minutes=30)
    got = run_stream_to_memory(spark, out, "sess_bridge_t", output_mode="append")
    final = {
        (r.session_start_us, r.session_end_us, r.n_events)
        for r in got.collect()
    }
    assert (base + 20 * m, base + 60 * m, 3) in final
    # nothing emitted CLOSED: it is all one still-open session
    assert not any(r.closed for r in got.collect())
    shutil.rmtree(sdir, ignore_errors=True)


def test_fold_fast_path_equals_per_event_fold():
    """The vectorized no-late-event fold must emit EXACTLY what the
    per-event ``_fold_event`` loop emits — closed sessions, order, and
    the open-session state — across random forward-only chunks folded
    through random seed states (the fast path's admission condition)."""
    import random

    import pandas as pd

    from prefixtree_spark.streaming.sessionize import _fold_event, _fold_pdf

    rng = random.Random(7)
    gap_us = 1000
    for trial in range(300):
        if rng.random() < 0.3:
            start = end = n = None
        else:
            start = rng.randrange(0, 5000)
            end = start + rng.randrange(0, 3000)
            n = rng.randrange(1, 5)
        base = (start - gap_us) if start is not None else 0
        ts = sorted(
            base + rng.randrange(0, 20000) for _ in range(rng.randrange(1, 40))
        )
        pdf = pd.DataFrame({"ts_us": ts, "event_id": range(len(ts))})
        out_fast: list[tuple] = []
        fast = _fold_pdf(1, pdf, gap_us, start, end, n, None, out_fast)
        assert fast[3] is None  # forward-only chunk: no pre-buffer
        out_slow: list[tuple] = []
        s, e, c, pre = start, end, n, None
        for t in ts:
            s, e, c, pre = _fold_event(1, t, gap_us, s, e, c, pre, out_slow)
        assert pre is None
        assert out_fast == out_slow, (trial, out_fast, out_slow)
        assert fast[:3] == (s, e, c), (trial, fast, (s, e, c))
