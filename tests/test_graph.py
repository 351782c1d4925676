"""Connected-components: the distributed large-star/small-star path
must converge in O(log n) rounds (NOT O(diameter)) and agree with the
driver union-find on the same graph."""

import math

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators.graph import connected_components


def _components(df):
    return {(r.node, r.component) for r in df.collect()}


def test_chain_converges_in_log_rounds(spark):
    """A 2000-node path graph has diameter 1999; label propagation
    would need ~2000 rounds. Star contraction must finish within
    ~2*log2(n) + slack rounds or the max_iter raise trips."""
    n = 2000
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = (
        spark.range(n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    budget = 2 * math.ceil(math.log2(n)) + 4
    got = connected_components(
        nodes, edges, max_iter=budget, collect_edges_below=0
    )
    assert _components(got) == {(i, 0) for i in range(n)}


def test_distributed_matches_union_find(spark):
    """Random-ish multi-component graph: distributed path == collect
    path, isolated nodes keep themselves."""
    comps = [list(range(i * 50, i * 50 + 37)) for i in range(6)]
    edges = []
    for members in comps:
        # mix of chain and long-range edges, arbitrary direction
        for a, b in zip(members, members[1:]):
            edges.append((b, a))
        edges.append((members[-1], members[0]))
    nodes = spark.createDataFrame(
        [(v,) for members in comps for v in members] + [(9999,)], ["node"]
    )
    edf = spark.createDataFrame(edges, ["src", "dst"])
    dist = _components(
        connected_components(nodes, edf, collect_edges_below=0)
    )
    local = _components(
        connected_components(nodes, edf, collect_edges_below=10**9)
    )
    expected = {(v, min(members)) for members in comps for v in members}
    expected.add((9999, 9999))
    assert dist == expected
    assert local == expected


def test_nonconvergence_raises(spark):
    nodes = spark.range(8).select(F.col("id").alias("node"))
    edges = spark.range(7).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1, collect_edges_below=0)


def test_driver_numpy_chain_fast_and_correct(spark):
    """The driver path on a 200k-edge chain (worst case for label
    propagation): the vectorized min-label union must be correct and
    fast — the round-2 pure-Python find() loop took O(seconds) here;
    numpy does it in well under the generous 15s budget (which covers
    Spark collect overhead, not the CC itself)."""
    import time

    n = 200_001
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.time()
    got = connected_components(nodes, edges, collect_edges_below=10**9)
    assert got.where(F.col("component") != 0).count() == 0
    assert got.count() == n
    assert time.time() - t0 < 15


def test_distributed_cc_releases_round_checkpoints(spark):
    """Star-contraction rounds must not accumulate one cached edge set
    per round: after the call, at most the final round's checkpoint
    (which the returned lazy plan still references) remains."""
    jsc = spark.sparkContext._jsc
    n = 500
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    before = jsc.getPersistentRDDs().size()
    got = connected_components(nodes, edges, collect_edges_below=0)
    assert got.where(F.col("component") != 0).count() == 0
    assert jsc.getPersistentRDDs().size() - before <= 1
