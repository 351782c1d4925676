"""Connected components over an edge DataFrame — the shared clustering
core of ``fuzzy_dedup`` and ``dedup_corpus``.

Hybrid strategy (GraphFrames-style): edge sets small enough to collect
run a one-pass driver-side union-find; larger graphs run iterative
min-label propagation (two hash joins per round, lineage truncated
with localCheckpoint). Edges are symmetrized internally, so callers
may pass each pair once in either direction; isolated nodes (no
edges) keep themselves as component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        if n_edges < collect_edges_below:
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for row in edges.toLocalIterator():
                ra, rb = find(row[0]), find(row[1])
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            spark = nodes.sparkSession
            comp_rows = [(v, find(v)) for v in parent]
            schema = nodes.schema["node"].dataType.simpleString()
            comp_df = spark.createDataFrame(
                comp_rows, f"node {schema}, component {schema}"
            ) if comp_rows else spark.createDataFrame([], f"node {schema}, component {schema}")
            return nodes.join(comp_df, "node", "left").select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias("component"),
            )
        # distributed min-label propagation; symmetrize so labels flow
        # both ways regardless of edge direction in the input
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        labels = nodes.select("node", F.col("node").alias("component"))
        labels = labels.localCheckpoint(eager=True)
        for _ in range(max_iter):
            neighbor = sym.join(
                labels, sym.dst == labels.node, "inner"
            ).select(F.col("src").alias("node"), "component")
            new_labels = (
                labels.unionByName(neighbor)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .localCheckpoint(eager=True)
            )
            done = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .isEmpty()
            )
            labels = new_labels
            if done:
                break
        return labels
    finally:
        edges.unpersist()
