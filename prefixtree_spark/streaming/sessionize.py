"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState`` — the engine's demonstration of
arbitrary-state streaming (the shape any custom stateful operator at
scale takes: state keyed by a partition column, Arrow-batched updates,
explicit timeouts).

Per user, state = the currently open session (start, end, count). Each
micro-batch folds its events (sorted by event time) into the state:
events within ``gap`` extend the session; a larger gap closes it (the
closed session is EMITTED) and opens a new one. Open sessions are also
emitted each batch they change, flagged ``closed = false``, so
downstream consumers always see the latest provisional session; the
final state of every session eventually appears with the highest
``last_ts_us``. State size: O(1) per active user — at 100 TB/day the
state store scales with concurrent users, not events.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_sessionize(
    stream: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Stateful sessionization of an events stream (needs ``ts`` as
    timestamp, ``user_id``, ``event_id``). Output mode: append.

    Out-of-order contract (bounded state): a cross-batch late event
    within ``gap`` of the open session extends it; one EARLIER than
    the open session by more than the gap is emitted as its own closed
    single-event session (the batch twin splits there too). What
    bounded state cannot do is re-merge ALREADY-EMITTED sessions when
    an even later arrival bridges them — full batch equality holds when
    lateness never bridges emitted sessions (the timeout variant's
    watermark bounds admissible lateness outright)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, end, n = state.get
        else:
            start = end = n = None
        out: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts in pdf["ts_us"]:
                ts = int(ts)
                if start is None:
                    start, end, n = ts, ts, 1
                elif ts - end > gap_us:
                    out.append((user_id, start, end, n, True))
                    start, end, n = ts, ts, 1
                elif start - ts > gap_us:
                    # a cross-batch late event EARLIER than the open
                    # session by more than the gap is its own session
                    # (the batch twin's lag>gap rule splits there too);
                    # merging it would glue two gap-separated sessions.
                    # Emitted closed immediately — with bounded state, a
                    # later arrival that would bridge the two cannot
                    # re-merge an emitted session (contract documented
                    # in the docstring; the timeout variant's watermark
                    # bounds how late such bridges can be).
                    out.append((user_id, ts, ts, 1, True))
                else:
                    # max/min guard: a late (out-of-order) event arriving
                    # in a later micro-batch within the gap must not
                    # regress the session bounds, or the next gap test
                    # falsely splits
                    end = max(end, ts)
                    start = min(start, ts)
                    n += 1
        if start is not None:
            state.update((start, end, n))
            out.append((user_id, start, end, n, False))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "closed"],
        )

    prepared = stream.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize_timeout(
    stream: DataFrame, *, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Sessionize with EVENT-TIME TIMEOUTS — the production variant of
    ``streaming_sessionize``: an idle user's open session is CLOSED and
    its state EVICTED when the watermark passes session_end + gap,
    without waiting for that user's next event. The NoTimeout variant
    above keeps one state row per all-time user and only closes a
    session when a later event from the same user arrives — fine for
    replay/backfill, wrong for an unbounded stream where most users
    eventually go quiet forever.

    Mechanics: the input gets a ``ts`` watermark (required by
    ``EventTimeTimeout``); after folding each batch the handler arms
    ``setTimeoutTimestamp(end + gap)``; when the watermark crosses it,
    Spark calls the handler with ``state.hasTimedOut`` and NO rows —
    it emits the final closed session and removes the state. State
    size: O(active-within-gap users), not O(all-time users). Output
    mode: append. (Timeouts fire on a LATER microbatch's watermark
    advance — with availableNow triggers, sessions idle at end-of-
    input close on the next run over the same checkpoint.)"""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = [
            "user_id", "session_start_us", "session_end_us", "n_events", "closed",
        ]
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, end, n, True)], columns=cols)
            return
        if state.exists:
            start, end, n = state.get
        else:
            start = end = n = None
        out: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts in pdf["ts_us"]:
                ts = int(ts)
                if start is None:
                    start, end, n = ts, ts, 1
                elif ts - end > gap_us:
                    out.append((user_id, start, end, n, True))
                    start, end, n = ts, ts, 1
                elif start - ts > gap_us:
                    # watermark-admitted late event gap-before the open
                    # session: its own session (see the NoTimeout
                    # variant for the contract)
                    out.append((user_id, ts, ts, 1, True))
                else:
                    end = max(end, ts)
                    start = min(start, ts)
                    n += 1
        if start is not None:
            state.update((start, end, n))
            # close when the EVENT-TIME watermark passes the gap after
            # the last event (ms — the GroupState API's unit)
            state.setTimeoutTimestamp((end + gap_us) // 1000)
            out.append((user_id, start, end, n, False))
        yield pd.DataFrame(out, columns=cols)

    prepared = stream.withWatermark("ts", watermark).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
