"""Streaming top-k: maintain the running top-k rows per group across
micro-batches via ``applyInPandasWithState``.

Plain streaming aggregation cannot express top-k (rank windows are
unsupported on streams; ``complete`` mode re-emits and re-sorts the
whole result every batch). The stateful formulation keeps O(k) state
per group — a bounded leaderboard merged with each batch's candidates
— so at 100 TB/day the state store scales with groups × k, not events.

Emission contract: a group emits its CURRENT top-k (ranks 1..k, a
monotonically increasing ``version``) only on batches that CHANGE its
leaderboard; downstream reads the max-version row set per group for
the latest standings (the stream analogue of "update" semantics, which
the memory-sink tests consume by filtering to the last version).

Determinism: ordering is (value DESC, id ASC) — a total order, so the
leaderboard is independent of batch arrival order once all events are
in (pinned by the stream==batch equality test).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("values", T.ArrayType(T.DoubleType())),
        T.StructField("version", T.LongType()),
    ]
)


def streaming_topk(stream: DataFrame, k: int = 10) -> DataFrame:
    """Running top-``k`` events by ``value`` per ``event_type`` (needs
    ``event_type``, ``event_id``, ``value``). Output mode: append."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            ids, values, version = state.get
            pairs = list(zip(list(ids), list(values)))
        else:
            pairs, version = [], 0
        before = list(pairs)
        for pdf in pdfs:
            if not len(pdf):
                continue
            if len(pairs) >= k:
                # vectorized claw-back of the replay-dedup cost (r6
                # +31%): with a full board, only rows ordering at or
                # above the worst seat under (value DESC, id ASC) can
                # change it — filter the chunk in pandas before any
                # per-row Python. A replayed below-threshold event is
                # dropped here with the same no-op outcome the dedup
                # pass would give it; a replayed on-board event passes,
                # dedups below, and still bumps nothing.
                tv, ti = pairs[k - 1][1], pairs[k - 1][0]
                pdf = pdf[
                    (pdf["value"] > tv)
                    | ((pdf["value"] == tv) & (pdf["event_id"] < ti))
                ]
                if not len(pdf):
                    continue
            pairs.extend(
                zip((int(i) for i in pdf["event_id"]), (float(v) for v in pdf["value"]))
            )
            # merge-then-cut keeps the loop O(batch + k log(batch+k));
            # the leaderboard never exceeds k between batches. One id
            # keeps only its best row: an at-least-once source replaying
            # an event already on the board must not seat it twice (or
            # bump the version at all — dedup makes the replay a no-op).
            pairs.sort(key=lambda p: (-p[1], p[0]))
            seen: set[int] = set()
            pairs = [
                p for p in pairs if p[0] not in seen and not seen.add(p[0])
            ]
            del pairs[k:]
        if pairs != before:
            version += 1
            state.update(([p[0] for p in pairs], [p[1] for p in pairs], version))
            out = pd.DataFrame(
                {
                    "event_type": event_type,
                    "rank": range(1, len(pairs) + 1),
                    "event_id": [p[0] for p in pairs],
                    "value": [p[1] for p in pairs],
                    "version": version,
                }
            )
            yield out

    prepared = stream.select("event_type", "event_id", "value")
    return prepared.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=TOPK_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_topk(emitted: DataFrame) -> DataFrame:
    """Collapse a ``streaming_topk`` emission log to the latest
    leaderboard per group (max-version row set)."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return (
        emitted.withColumn("_maxv", F.max("version").over(w))
        .where(F.col("version") == F.col("_maxv"))
        .select("event_type", "rank", "event_id", "value")
    )
