"""Streaming fuzzy match (streaming/fuzzy.py): stream == batch ==
brute force, per-row enrichment semantics, left-join audit shape."""

import pytest
from pyspark.sql import functions as F

from prefixtree_spark import build_local_index, create
from prefixtree_spark.streaming.events import run_stream_to_memory
from prefixtree_spark.streaming.fuzzy import streaming_fuzzy_match
from tests.conftest import brute_levenshtein

WORDS = ["cat", "cart", "dog", "dig", "doge", "card", "care", "apple"]


def _handle(spark):
    words = spark.createDataFrame([(w,) for w in WORDS], ["word"])
    return build_local_index(create(words, "word"))


def _events(spark):
    rows = [
        (1, "cat"),      # exact match + within-1 neighbors
        (2, "cart"),
        (3, "zzzzzz"),   # no match at k=1
        (4, "cat"),      # duplicate string, distinct event — own rows
        (5, None),       # null query
    ]
    return spark.createDataFrame(rows, ["event_id", "q"])


def _expected(k, how):
    out = set()
    for eid, q in [(1, "cat"), (2, "cart"), (3, "zzzzzz"), (4, "cat")]:
        matches = [
            (w, d) for w in WORDS if (d := brute_levenshtein(q, w)) <= k
        ]
        for w, d in matches:
            out.add((eid, q, w, d))
        if not matches and how == "left":
            out.add((eid, q, None, None))
    if how == "left":
        out.add((5, None, None, None))
    return out


@pytest.mark.parametrize("how", ["inner", "left"])
def test_batch_matches_brute_force(spark, how):
    got = {
        (r.event_id, r.q, r.match_word, r.match_distance)
        for r in streaming_fuzzy_match(
            _events(spark), "q", _handle(spark), 1, how=how
        ).collect()
    }
    assert got == _expected(1, how)


def test_stream_equals_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    sink = run_stream_to_memory(
        spark,
        streaming_fuzzy_match(stream, "q", _handle(spark), 1, how="inner"),
        "fuzzy_match_stream_test_sink",
        output_mode="append",
        timeout_s=120,
    )
    got = {
        (r.event_id, r.q, r.match_word, r.match_distance)
        for r in sink.collect()
    }
    batch = {
        (r.event_id, r.q, r.match_word, r.match_distance)
        for r in streaming_fuzzy_match(
            ev, "q", _handle(spark), 1, how="inner"
        ).collect()
    }
    assert got == batch == _expected(1, "inner")


def test_payload_columns_survive(spark):
    ev = _events(spark).withColumn("payload", F.col("event_id") * 10)
    rows = streaming_fuzzy_match(ev, "q", _handle(spark), 1).collect()
    assert all(r.payload == r.event_id * 10 for r in rows)


def test_bad_how_rejected(spark):
    with pytest.raises(ValueError, match="how"):
        streaming_fuzzy_match(_events(spark), "q", _handle(spark), 1, how="outer")


def test_bytes_mode_counts_utf8_bytes(spark):
    """bytes=True pairs with a byte-mode handle: 'café' vs 'cafe' is 2
    BYTE edits (é is 2 UTF-8 bytes), so at k=1 byte mode keeps the two
    apart while codepoint mode merges them; payload strings stay real
    UTF-8 in the output."""
    words = spark.createDataFrame([("café",), ("cafe",)], ["word"])
    hb = build_local_index(create(words, "word", bytes=True))
    hc = build_local_index(create(words, "word"))
    ev = spark.createDataFrame([(1, "café"), (2, "cafe")], ["event_id", "q"])
    got_b = {
        (r.event_id, r.q, r.match_word, r.match_distance)
        for r in streaming_fuzzy_match(ev, "q", hb, 1, bytes=True).collect()
    }
    assert got_b == {(1, "café", "café", 0), (2, "cafe", "cafe", 0)}
    got_c = {
        (r.event_id, r.match_word, r.match_distance)
        for r in streaming_fuzzy_match(ev, "q", hc, 1).collect()
    }
    assert got_c == {
        (1, "café", 0), (1, "cafe", 1), (2, "cafe", 0), (2, "café", 1),
    }


def test_best_only_single_deterministic_match(spark):
    """best_only=True: one row per input row, minimum distance, ties
    broken lexicographically; how='left' keeps unmatched rows."""
    ev = _events(spark)
    rows = streaming_fuzzy_match(
        ev, "q", _handle(spark), 1, how="left", best_only=True
    ).collect()
    by_id = {r.event_id: (r.match_word, r.match_distance) for r in rows}
    assert len(rows) == 5  # exactly one row per input row
    assert by_id[1] == ("cat", 0)
    assert by_id[2] == ("cart", 0)
    assert by_id[3] == (None, None)   # unmatched kept under left
    assert by_id[4] == ("cat", 0)
    assert by_id[5] == (None, None)   # null query kept under left
    # tie case: "dag" is distance 1 from both "dig" and "dog" — the
    # lexicographically smaller word wins
    tie = spark.createDataFrame([(9, "dag")], ["event_id", "q"])
    r = streaming_fuzzy_match(
        tie, "q", _handle(spark), 1, best_only=True
    ).collect()
    assert [(x.match_word, x.match_distance) for x in r] == [("dig", 1)]
