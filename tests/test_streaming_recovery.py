"""Streaming restart/recovery: a query stopped mid-stream and resumed
from its checkpointLocation must restore the state store and produce
the same final answer as one uninterrupted run (and as the batch twin).

Shape: run 1 processes only file 1 (availableNow terminates when the
known files are done), the process-side query object is discarded,
file 2 lands, and run 2 restarts from the SAME checkpoint — sessions
opened in run 1 must continue, not restart, and the file sink must not
re-emit run 1's output."""

import time

import pandas as pd
import pytest

from prefixtree_spark.operators.relational import sessionize
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.streaming.events import read_events_stream
from prefixtree_spark.streaming.sessionize import streaming_sessionize
from prefixtree_spark.streaming.topk import latest_topk, streaming_topk
from tests.conftest import SF_SMOKE


def _run_to_parquet(spark, src_dir, out_dir, cp_dir, make_result):
    stream = read_events_stream(spark, src_dir)
    q = (
        make_result(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.fixture()
def split_dirs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    pdf.iloc[:mid].to_parquet(src / "batch_1.parquet", index=False)
    return src, pdf.iloc[mid:], str(tmp_path / "out"), str(tmp_path / "cp")


def test_sessionize_resumes_from_checkpoint(spark, split_dirs):
    src, rest, out_dir, cp_dir = split_dirs
    make = lambda s: streaming_sessionize(s, gap_minutes=30)

    # run 1: first half only, then the query object is gone
    _run_to_parquet(spark, str(src), out_dir, cp_dir, make)
    interim = pd.read_parquet(out_dir)
    assert len(interim) > 0

    # second half lands; run 2 restarts from the same checkpoint
    time.sleep(1.1)  # file stream orders by modification time
    rest.to_parquet(src / "batch_2.parquet", index=False)
    _run_to_parquet(spark, str(src), out_dir, cp_dir, make)

    got_raw = pd.read_parquet(out_dir)
    # run 2 appended only new emissions — no re-processing of file 1
    assert len(got_raw) > len(interim)
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
        for r in sessionize(
            load_table(spark, SF_SMOKE, "events"), gap_minutes=30
        ).collect()
    }
    # sessions spanning the stop/resume boundary prove the state store
    # was RESTORED: without recovery they would appear split in two
    assert got == batch


def test_topk_resumes_from_checkpoint(spark, split_dirs):
    src, rest, out_dir, cp_dir = split_dirs
    make = lambda s: streaming_topk(s, k=5)

    _run_to_parquet(spark, str(src), out_dir, cp_dir, make)
    time.sleep(1.1)
    rest.to_parquet(src / "batch_2.parquet", index=False)
    _run_to_parquet(spark, str(src), out_dir, cp_dir, make)

    emitted = spark.read.parquet(out_dir)
    got = {
        (r.event_type, r.rank, r.event_id)
        for r in latest_topk(emitted).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    expected = set()
    for et, g in ev.groupby("event_type"):
        ranked = g.sort_values(["value", "event_id"], ascending=[False, True]).head(5)
        expected |= {
            (et, i + 1, int(r.event_id)) for i, r in enumerate(ranked.itertuples())
        }
    # leaderboards merged across the restart: versions from run 1 carry
    # into run 2's state, so the max-version rows equal the global top-k
    assert got == expected
