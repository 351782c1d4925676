"""r14 chunk-loop internals: bounded union plan size, pipelined chunk
jobs, per-chunk broadcast destruction — each must leave results
identical to the serial/unbounded paths."""

import pytest
from pyspark.sql import functions as F

from prefixtree_spark import create, query
from tests.test_build import SPARSE_WORDS, _words_df
from tests.test_query import QUERIES, _expected


def _leaf_count(df) -> int:
    """Number of scan leaves in the executed plan — the union collapse
    must bound this regardless of chunk count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Scan ExistingRDD")


def test_union_all_collapses_past_fanout(spark, monkeypatch):
    """_union_all over more than _UNION_COLLAPSE_FANOUT checkpointed
    frames must re-checkpoint in blocks so the returned frame's plan
    never carries more than fanout leaves (r13 verdict #6: plan SIZE
    grew linearly with chunk count even on the balanced tree)."""
    import prefixtree_spark.operators.query as qmod

    monkeypatch.setattr(qmod, "_UNION_COLLAPSE_FANOUT", 4)
    frames = [
        spark.createDataFrame(
            [(str(i), f"n{i}", 0)], schema=qmod.RESULT_SCHEMA
        ).localCheckpoint(eager=True)
        for i in range(11)
    ]
    out = qmod._union_all(frames)
    assert _leaf_count(out) <= 4
    assert out.count() == 11
    got = {r.query_string for r in out.collect()}
    assert got == {str(i) for i in range(11)}


def test_chunked_pipeline_depth_matches_serial(spark, monkeypatch):
    """The overlapped chunk loop (depth>1) must produce exactly the
    serial loop's rows: same chunks, same per-chunk traversal, only
    job submission overlaps."""
    import prefixtree_spark.operators.query as qmod

    monkeypatch.setattr(qmod, "_AUTO_BROADCAST_NODES", 0)
    monkeypatch.setattr(qmod, "_AUTO_BROADCAST_QUERIES", 2)
    pt = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=3)
    qdf = spark.createDataFrame([(q,) for q in QUERIES], ["q"])
    expected = _expected(SPARSE_WORDS, QUERIES, 1)

    monkeypatch.setattr(qmod, "_CHUNK_PIPELINE_DEPTH", 1)
    serial = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pt, qdf, "q", 1, mode="auto").collect()
    }
    monkeypatch.setattr(qmod, "_CHUNK_PIPELINE_DEPTH", 3)
    piped = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pt, qdf, "q", 1, mode="auto").collect()
    }
    assert serial == piped == expected


def test_chunk_broadcast_destroyed_after_pin(spark, monkeypatch):
    """Every chunk's query broadcast must be destroyed once its result
    is pinned (r13 advice: reused Python workers otherwise retain every
    chunk's payload + built QueryBatch until ContextCleaner GC)."""
    import prefixtree_spark.operators.query as qmod

    seen = []
    real = qmod._query_broadcast_queries_bc

    def spy(pt, qs, k, **kw):
        df, bq = real(pt, qs, k, **kw)
        seen.append(bq)
        return df, bq

    monkeypatch.setattr(qmod, "_query_broadcast_queries_bc", spy)
    monkeypatch.setattr(qmod, "_AUTO_BROADCAST_NODES", 0)
    monkeypatch.setattr(qmod, "_AUTO_BROADCAST_QUERIES", 2)
    pt = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=3)
    qdf = spark.createDataFrame([(q,) for q in QUERIES], ["q"])
    got = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pt, qdf, "q", 1, mode="auto").collect()
    }
    assert got == _expected(SPARSE_WORDS, QUERIES, 1)
    assert len(seen) >= 2  # the loop really chunked
    for bq in seen:
        # destroyed broadcasts drop their JVM-side validity flag
        assert not bq._jbroadcast.isValid(), "chunk broadcast leaked"
