"""The streaming (sorted-LCP, O(depth)-memory) builder must produce
logically identical trees to the in-memory radix builder, and identical
query results, on any partitioning."""

import random

import pytest
from pyspark.sql import functions as F

from prefixtree_spark import create, query
from prefixtree_spark.operators.build import _stream_build_sorted
from prefixtree_spark.plans.tree import PT_COLUMNS
from tests.conftest import brute_levenshtein
from tests.test_build import SPARSE_WORDS, _words_df


def _canonical(rows):
    """Partitioning/id-independent tree form: (path-to-node, label,
    is_word, _min, _max) set."""
    by_id = {r[0]: r for r in rows}
    out = set()
    for r in rows:
        path = []
        cur = r[1]
        while cur != 0:
            p = by_id[cur]
            path.append(p[6])
            cur = p[1]
        out.add(("".join(reversed(path)), r[6], r[4], r[3], r[2]))
    return out


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_streaming_builder_pure_python_equivalence():
    rng = random.Random(3)
    for trial in range(40):
        words = sorted(
            {
                "".join(rng.choices("abcd", k=rng.randint(1, 10)))
                for _ in range(rng.randint(1, 200))
            }
        )
        # duplicates in the stream must be ignored
        stream = []
        for w in words:
            stream.extend([w] * rng.randint(1, 2))
        got = list(_stream_build_sorted(iter(stream), 0))
        from prefixtree_spark.operators.build import _emit_rows, _insert, _new_node

        root = _new_node("")
        for w in words:
            _insert(root, w)
        exp = list(_emit_rows(root, 0))
        assert _canonical(got) == _canonical(exp), f"trial {trial}"


@pytest.mark.parametrize("parts", [1, 4])
def test_streaming_builder_spark_tree_equivalence(spark, parts):
    df = _words_df(spark, SPARSE_WORDS + ["CAT", "CAT", "  CAR  "])
    mem = create(df, "word", num_partitions=parts, builder="memory")
    stream = create(df, "word", num_partitions=parts, builder="streaming")
    assert _canonical(_rows(mem)) == _canonical(_rows(stream))


def test_streaming_builder_query_results(spark):
    df = _words_df(spark, SPARSE_WORDS)
    pt = create(df, "word", num_partitions=3, builder="streaming")
    qdf = spark.createDataFrame([("KAMINSKI",), ("SMITH",)], ["q"])
    got = {(r.query_string, r.node, r.final_distance) for r in query(pt, qdf, "q", 2).collect()}
    exp = {
        (q, w, brute_levenshtein(q, w))
        for q in ["KAMINSKI", "SMITH"]
        for w in SPARSE_WORDS
        if brute_levenshtein(q, w) <= 2
    }
    assert got == exp
