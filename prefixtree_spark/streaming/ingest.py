"""Streaming corpus ingest with near-dup rejection — the end-to-end
composition an always-on training-data pipeline runs at the crawl
boundary, built from this engine's oracled primitives:

  per micro-batch:
    1. exact dedup WITHIN the batch (keep the minimum id per exact
       text — catches short docs below the shingle length);
    2. near-dup dedup WITHIN the batch (MinHash-LSH pairs → connected
       components → keep each cluster's min id; ``dedup.dedup_corpus``);
    3. near-dup rejection AGAINST the published corpus
       (``dedup.incremental_lsh_pairs`` — bipartite, |batch| × bands
       work, never corpus²);
    4. atomic APPEND of the survivors to the published table
       (``sources.io.append_published`` — an add-segment manifest
       commit, O(|batch|) per batch; readers always see a complete
       snapshot).

Semantics are GREEDY FIRST-ARRIVAL: a doc survives iff it is not a
near-dup of any doc already accepted (earlier batch, or an in-batch
cluster minimum). This differs from global batch dedup
(``dedup.dedup_corpus`` over the union) exactly where transitivity
differs: for A < B < C with A~B, B~C, A≁C, the global pass keeps only
A (one component) while greedy ingest keeps A and C (B was rejected
against A; C matches nothing accepted). Greedy is what an online
ingest can compute without revisiting history — and it is
deterministic given the batch sequence, which is what the batch twin
test pins.

Scale shape: each batch pays its own shingle/signature work plus one
band-bucket equi-join against the corpus side. At 100 TB the
corpus-side signatures should be persisted and appended alongside the
docs (the same add-segment commit); here the corpus side is re-read
from the published table per batch — correct, and the right fixture
shape — with the signature-persistence optimization documented rather
than faked. ``compact_published`` folds the append chain out of band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prefixtree_spark.operators import dedup
from prefixtree_spark.sources.io import (
    append_published,
    published_version,
    read_published,
)


def ingest_batch(
    batch: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
) -> int:
    """Run one ingest step (the batch twin of the streaming sink):
    dedup ``batch`` within itself and against the published corpus at
    ``root``, append the survivors atomically. Returns the number of
    surviving rows appended (0 appends nothing — no empty segments)."""
    spark = batch.sparkSession
    # 1. exact within-batch: min id per exact text
    keep_exact = batch.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    surv = batch.join(keep_exact, [id_col, text_col], "left_semi")
    # 2. near-dup within-batch: LSH pairs -> components -> min-id keep
    surv = dedup.dedup_corpus(
        surv, id_col, text_col, threshold=threshold, n=n
    )
    # 3. reject duplicates of the already-accepted corpus: exact text
    # first (catches docs shorter than one shingle, which carry no LSH
    # evidence — and is the guard that makes replayed batches no-ops),
    # then bipartite near-dup
    if published_version(spark, root) > 0:
        corpus = read_published(spark, root)
        surv = surv.join(
            corpus.select(text_col).distinct(), text_col, "left_anti"
        )
        hits = dedup.incremental_lsh_pairs(
            surv,
            corpus,
            id_col,
            text_col,
            n=n,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
        ).select(F.col("new_id").alias(id_col)).distinct()
        surv = surv.join(hits, id_col, "left_anti")
    # 4. atomic append (materialize once; count from the same pass)
    surv = surv.persist()
    try:
        n_out = surv.count()
        if n_out:
            append_published(surv, root)
        return n_out
    finally:
        surv.unpersist()


def streaming_ingest_corpus(
    stream: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Attach the ingest sink to a streaming DataFrame: every
    micro-batch flows through ``ingest_batch`` via ``foreachBatch``
    and lands as one atomic append. Returns the started
    ``StreamingQuery`` (callers ``awaitTermination``).

    Exactly-once note: ``foreachBatch`` gives at-least-once batch
    delivery on restart; a replayed batch re-runs the dedup against a
    corpus that already contains its survivors, so every replayed row
    is rejected — by the corpus exact-text guard (which needs no
    shingles, so it also covers docs shorter than one shingle), and
    independently by the bipartite LSH pass (self-jaccard 1.0 ≥ any
    threshold ≤ 1). The sink is idempotent by construction; the
    replay test pins it."""

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch,
            root,
            id_col,
            text_col,
            threshold=threshold,
            n=n,
            num_perm=num_perm,
            bands=bands,
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_sequential(
    batches: list[DataFrame],
    root: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
) -> DataFrame:
    """Batch twin of the streaming sink: fold the batches through
    ``ingest_batch`` in order and return the published corpus — the
    reference result the stream==batch tests (and the workload oracle)
    compare against."""
    spark = batches[0].sparkSession
    for b in batches:
        ingest_batch(b, root, id_col, text_col, threshold=threshold, n=n)
    return read_published(spark, root)
