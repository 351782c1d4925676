"""Exactly-once streaming append sink for published tables.

``foreachBatch`` gives at-least-once batch delivery: a micro-batch
whose sink ran but whose checkpoint commit didn't land is REPLAYED on
restart with the same ``batch_id``. For the dedup ingest
(``streaming_ingest_corpus``) content-level idempotence absorbs that;
a RAW append sink has no content defense, so replays would duplicate
rows. This wrapper closes it the way Delta's idempotent writes do
(txnAppId + txnVersion): every batch appends with a deterministic
transaction id derived from the checkpoint location and the batch id,
and ``append_published(txn=)`` turns a replayed commit into a no-op
that returns the original version. Stop/kill/restart at any point
yields each batch's rows exactly once — pinned by test.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

__all__ = ["stream_append_published", "published_txn_sink"]


def published_txn_sink(
    root: str,
    checkpoint_dir: str,
    *,
    format: str = "parquet",
    cluster_by: list[str] | None = None,
):
    """The ``(batch_df, batch_id)`` callable behind
    ``stream_append_published``, exposed for direct use (tests, custom
    ``foreachBatch`` compositions). The txn id is
    ``pub-<md5(checkpoint_dir)[:12]>:<batch_id>`` — stable across
    restarts of the same query (same checkpoint ⇒ same ids ⇒ replays
    dedupe) and disjoint between different queries feeding one table
    (different checkpoints ⇒ different id spaces)."""
    from prefixtree_spark.sources.io import append_published

    app = hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:12]

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_published(
            batch,
            root,
            format=format,
            cluster_by=cluster_by,
            txn=f"pub-{app}:{batch_id}",
        )

    return _sink


def stream_append_published(
    stream: DataFrame,
    root: str,
    *,
    checkpoint_dir: str,
    format: str = "parquet",
    cluster_by: list[str] | None = None,
    available_now: bool = True,
):
    """Attach an exactly-once append sink to a streaming DataFrame:
    every micro-batch lands as one atomic ``append_published`` commit
    carrying a checkpoint-derived txn id, so crash/replay can never
    duplicate a batch (see module docstring). Returns the started
    ``StreamingQuery``; callers ``awaitTermination``. Run
    ``compact_published`` / ``vacuum_published`` out of band exactly
    as for any append-log table — vacuum also bounds the per-commit
    txn replay scan."""
    writer = stream.writeStream.foreachBatch(
        published_txn_sink(
            root, checkpoint_dir, format=format, cluster_by=cluster_by
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
