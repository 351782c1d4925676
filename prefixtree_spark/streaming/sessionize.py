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

import numpy as np
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


def _fold_event(
    user_id: int,
    ts: int,
    gap_us: int,
    start: int | None,
    end: int | None,
    n: int | None,
    pre: tuple[int, int, int] | None,
    out: list[tuple],
) -> tuple[int, int, int, tuple[int, int, int] | None]:
    """Fold one event into (open session, pre-session buffer). The
    buffer holds cross-batch late events that are gap-before the open
    session: gap-adjacent ones merge into one pre-session (as the batch
    twin would) instead of each becoming a singleton closed session;
    the caller flushes the buffer closed at batch end. Shared by both
    sessionize variants so their late-event semantics cannot drift."""
    if start is None:
        return ts, ts, 1, pre
    if ts - end > gap_us:
        # new event beyond the gap AFTER the open session: close it; a
        # pre-session buffer (which is > gap before that session) is
        # its own closed session too
        out.append((user_id, start, end, n, True))
        if pre is not None:
            out.append((user_id, pre[0], pre[1], pre[2], True))
            pre = None
        return ts, ts, 1, pre
    if start - ts > gap_us:
        # gap-before the open session: buffer instead of emitting a
        # singleton, so gap-adjacent late events merge (min/max guards:
        # iterator chunks are each sorted but not globally ordered)
        if pre is not None and pre[0] - gap_us <= ts <= pre[1] + gap_us:
            pre = (min(pre[0], ts), max(pre[1], ts), pre[2] + 1)
        else:
            if pre is not None:
                out.append((user_id, pre[0], pre[1], pre[2], True))
            pre = (ts, ts, 1)
        return start, end, n, pre
    # within gap of the open session: extend (min/max guard — a late
    # within-gap event must not regress the bounds), then check whether
    # the regressed start now bridges the buffer into the session
    end = max(end, ts)
    start = min(start, ts)
    n += 1
    if pre is not None and start - pre[1] <= gap_us:
        start = pre[0]
        n += pre[2]
        pre = None
    return start, end, n, pre


def _fold_batch_fast(
    user_id: int,
    ts_arr: "np.ndarray",
    gap_us: int,
    start: int | None,
    end: int | None,
    n: int | None,
    out: list[tuple],
) -> tuple[int, int, int]:
    """Vectorized fold of one sorted, NO-LATE-EVENT chunk (every ts ≥
    open-session start − gap, so the pre-session buffer can never
    form): session breaks, group bounds and counts come from numpy
    instead of a per-event Python loop. Emission order and results are
    identical to folding the chunk through ``_fold_event`` — pinned by
    the stream==batch equality tests and a direct fast-vs-slow
    property test. This is the r6→r7 claw-back of the late-event
    buffering cost: the ordinary all-forward chunk (the overwhelming
    majority at any scale) no longer pays the Python loop.

    Running previous-end for sorted ts is ``max(end_seed, ts[i-1])``:
    before any break the prefix max IS ts[i-1] (sorted); after a break
    at j, ts[j] > end_seed + gap ≥ end_seed, so the seed never
    re-enters the max. Returns the new open (start, end, n)."""
    if start is None:
        prev = np.concatenate((ts_arr[:1], ts_arr[:-1]))
    else:
        prev = np.maximum(np.concatenate(([end], ts_arr[:-1])), end)
    brk = (ts_arr - prev) > gap_us
    gid = np.cumsum(brk)
    uniq = np.unique(gid)
    firsts = np.searchsorted(gid, uniq, side="left")
    lasts = np.searchsorted(gid, uniq, side="right") - 1
    if start is not None and brk[0]:
        # first event is beyond the gap AFTER the open session: the
        # seed closes on its own, exactly as the per-event fold does
        out.append((user_id, start, end, n, True))
    merged = start is not None and not brk[0]
    g_start = g_end = g_n = 0
    for j in range(len(uniq)):
        f, l = int(firsts[j]), int(lasts[j])
        g_start, g_end, g_n = int(ts_arr[f]), int(ts_arr[l]), l - f + 1
        if j == 0 and merged:
            # a leading within-gap (possibly slightly-early) run merges
            # into the open session, regressing start if needed
            g_start = min(start, g_start)
            g_end = max(end, g_end)
            g_n += n
        if j < len(uniq) - 1:
            out.append((user_id, g_start, g_end, g_n, True))
    return g_start, g_end, g_n


def _fold_pdf(
    user_id: int,
    pdf: pd.DataFrame,
    gap_us: int,
    start: int | None,
    end: int | None,
    n: int | None,
    pre: tuple[int, int, int] | None,
    out: list[tuple],
) -> tuple[int, int, int, tuple[int, int, int] | None]:
    """Fold one iterator chunk: the vectorized fast path when no event
    is gap-before the open session (and no pre-buffer is pending from
    an earlier chunk), the per-event ``_fold_event`` loop otherwise.
    Shared by both sessionize variants."""
    pdf = pdf.sort_values(["ts_us", "event_id"])
    ts_arr = pdf["ts_us"].to_numpy(dtype=np.int64)
    if pre is None and (start is None or int(ts_arr[0]) >= start - gap_us):
        start, end, n = _fold_batch_fast(
            user_id, ts_arr, gap_us, start, end, n, out
        )
        return start, end, n, None
    for ts in ts_arr:
        ts = int(ts)
        start, end, n, pre = _fold_event(
            user_id, ts, gap_us, start, end, n, pre, out
        )
    return start, end, n, pre


def streaming_sessionize(
    stream: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Stateful sessionization of an events stream (needs ``ts`` as
    timestamp, ``user_id``, ``event_id``). Output mode: append.

    Out-of-order contract (bounded state): a cross-batch late event
    within ``gap`` of the open session extends it; events EARLIER than
    the open session by more than the gap form their own closed
    session(s) — gap-adjacent ones MERGE into one pre-session within
    the batch (the batch twin merges there too), emitted closed at
    batch end. What bounded state cannot do is re-merge
    ALREADY-EMITTED sessions when an even later arrival (possibly in a
    later batch) bridges them — full batch equality holds when lateness
    never bridges emitted sessions (the timeout variant's watermark
    bounds admissible lateness outright)."""
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
        pre: tuple[int, int, int] | None = None  # (start, end, n) buffer
        for pdf in pdfs:
            if not len(pdf):
                continue
            start, end, n, pre = _fold_pdf(
                user_id, pdf, gap_us, start, end, n, pre, out
            )
        if pre is not None:
            # the pre-session buffer closes at batch end: gap-adjacent
            # late events merged into ONE closed session, not one
            # singleton each (batch-twin parity within the batch)
            out.append((user_id, pre[0], pre[1], pre[2], True))
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
        pre: tuple[int, int, int] | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            # watermark-admitted late events gap-before the open
            # session buffer/merge exactly as in the NoTimeout variant
            # (shared fold, shared vectorized fast path)
            start, end, n, pre = _fold_pdf(
                user_id, pdf, gap_us, start, end, n, pre, out
            )
        if pre is not None:
            out.append((user_id, pre[0], pre[1], pre[2], True))
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
