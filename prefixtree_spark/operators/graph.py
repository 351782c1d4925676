"""Connected components over an edge DataFrame — the shared clustering
core of ``fuzzy_dedup`` and ``dedup_corpus``.

Hybrid strategy (GraphFrames-style): edge sets small enough to collect
run a vectorized driver-side min-label union (numpy edge relaxation +
pointer-doubling compression — no per-edge Python); larger graphs run
alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — rounds
scale with O(log n), NOT graph diameter, so a million-node near-dup
chain converges in ~20 rounds instead of a million. Edges are
symmetrized internally, so callers may pass each pair once in either
direction; isolated nodes (no edges) keep themselves as component.

Threshold: ``collect_edges_below`` = 5M edges ≈ 80 MB of driver ids
and well under a second of numpy CC — a safe driver budget; above it
the star-contraction rounds (each one shuffle) win because nothing is
collected at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prefixtree_spark.plans.lifecycle import release_checkpoint


def _large_star(e: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor to the
    minimum of u's closed neighborhood. Preserves connectivity and
    pulls big nodes toward component minima."""
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("mn"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node u over its smaller-or-equal neighbors: connect u
    and each such neighbor to the minimum among them. Flattens each
    star's interior edges."""
    e = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
    joined = e.join(mins, "src")
    return (
        joined.select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .unionByName(mins.select("src", F.col("mn").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    max_iter: int = 50,
    collect_edges_below: int = 5_000_000,
) -> DataFrame:
    """``nodes``: one column ``node``; ``edges``: columns ``src, dst``
    (any direction, duplicates fine). Returns DataFrame[node,
    component] where component = min member of the node's component.
    """
    edges = edges.select("src", "dst").persist()
    try:
        n_edges = edges.count()
        collectable = n_edges < collect_edges_below
        if collectable and n_edges > 0 and isinstance(
            edges.schema["src"].dataType, T.StringType
        ):
            # the row-count threshold assumes id-sized values; STRING
            # nodes (fuzzy_dedup clusters the values themselves) can be
            # hundreds of bytes each, so also bound the DRIVER BYTES a
            # collect would materialize — one cheap agg on the already-
            # pinned edges vs an OOM'd driver
            est_bytes = edges.agg(
                F.sum(F.length("src") + F.length("dst")).alias("b")
            ).first().b or 0
            collectable = est_bytes < 256 * 1024 * 1024
        if collectable:
            # vectorized driver-side min-label union: the round-2
            # pure-Python find() loop cost ~seconds of driver stall
            # near the 5M-edge threshold; this is numpy end-to-end —
            # factorize node values to dense indices (sorted, so the
            # min index IS the min value), then alternate edge
            # relaxation (np.minimum.at both directions) with full
            # pointer-doubling path compression until no edge spans two
            # labels. Outer rounds are O(log n) (hash-to-min shape);
            # each round is O(E + V log V) in C. ~5M edges ≈ well under
            # a second of driver CPU vs ~seconds for the dict loop.
            import numpy as np

            pdf = edges.toPandas()
            spark = nodes.sparkSession
            schema = nodes.schema["node"].dataType.simpleString()
            if len(pdf) == 0:
                return nodes.select("node", F.col("node").alias("component"))
            both = np.concatenate(
                [pdf["src"].to_numpy(), pdf["dst"].to_numpy()]
            )
            vals, inv = np.unique(both, return_inverse=True)
            si, di = inv[: len(pdf)], inv[len(pdf) :]
            p = np.arange(len(vals))
            for _ in range(64):  # >> log2(any driver-sized graph)
                np.minimum.at(p, si, p[di])
                np.minimum.at(p, di, p[si])
                while True:  # full path compression (pointer doubling)
                    pp = p[p]
                    if np.array_equal(pp, p):
                        break
                    p = pp
                if np.array_equal(p[si], p[di]):
                    break
            else:  # pragma: no cover - defensive
                raise RuntimeError("driver union-find did not converge")
            import pandas as pd

            comp_df = spark.createDataFrame(
                pd.DataFrame({"node": vals, "component": vals[p]}),
                schema=f"node {schema}, component {schema}",
            )
            return nodes.join(comp_df, "node", "left").select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias("component"),
            )
        # distributed path: alternating large-star/small-star rounds
        # until the edge set reaches its fixed point (disjoint stars
        # centered at component minima). localCheckpoint each round
        # truncates iterative lineage.
        e = (
            edges.where(F.col("src") != F.col("dst"))
            .select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev_sig = None
        converged = False
        for _ in range(max_iter):
            prev_e = e
            e = _small_star(_large_star(e)).localCheckpoint(eager=True)
            # the previous round's checkpoint is never read again —
            # release its executor storage instead of leaking one
            # cached edge set per round (plain unpersist() is a no-op
            # on checkpoints; see plans/lifecycle.py)
            release_checkpoint(prev_e)
            # fixed-point probe: (row count, order-free hash) of the edge
            # set — one cheap agg instead of a full exceptAll join
            sig = e.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            ).first()
            sig = (sig[0], sig[1])
            if sig == prev_sig:
                converged = True
                break
            prev_sig = sig
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "large-star/small-star rounds; rounds scale with log(n), "
                "so raise max_iter only for astronomically large graphs"
            )
        # fixed point = stars: every non-root node has exactly one edge
        # to its component minimum (groupBy-min for safety regardless)
        comp = e.groupBy(F.col("src").alias("node")).agg(
            F.min("dst").alias("component")
        )
        return nodes.join(comp, "node", "left").select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    finally:
        edges.unpersist()
