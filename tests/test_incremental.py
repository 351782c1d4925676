"""Incremental index maintenance: add_words(build(A), B) must be
query-equivalent to build(A ∪ B), preserve surviving ids, and pass
untouched forests through unchanged."""

import random

import pytest
from pyspark.sql import functions as F

from prefixtree_spark import create, query
from prefixtree_spark.operators.incremental import add_words, remove_words
from prefixtree_spark.plans.tree import ID_BLOCK
from tests.conftest import brute_levenshtein
from tests.test_build import SPARSE_WORDS, _words_df


def _vocab(seed, n):
    rng = random.Random(seed)
    alpha = "ABCDE"
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("parts", [1, 3])
def test_add_words_query_equivalence(spark, seed, parts):
    base = _vocab(seed, 60)
    delta = _vocab(seed + 100, 40) + base[:5]  # overlap on purpose
    queries = _vocab(seed + 200, 10)
    pt_inc = add_words(
        create(_words_df(spark, base), "word", num_partitions=parts),
        _words_df(spark, delta),
        "word",
    )
    qdf = spark.createDataFrame([(q,) for q in queries], ["q"])
    got = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pt_inc, qdf, "q", 1).collect()
    }
    expected = {
        (q, w, brute_levenshtein(q, w))
        for q in set(queries)
        for w in set(base) | set(delta)
        if brute_levenshtein(q, w) <= 1
    }
    assert got == expected
    # end-cap set == full distinct vocabulary
    caps = {r.node for r in pt_inc.where("is_word").collect()}
    assert caps == set(base) | set(delta)


def test_add_words_invariants_and_id_blocks(spark):
    base, delta = SPARSE_WORDS, ["KAMINSKY", "SMITHEREENS", "CA", "DOGE"]
    pt0 = create(_words_df(spark, base), "word", num_partitions=3)
    pt1 = add_words(pt0, _words_df(spark, delta), "word")
    rows = pt1.collect()
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids))  # globally unique
    id_set = set(ids) | {0}
    assert all(r.parent_id in id_set for r in rows)  # acyclic forest links
    assert all(r.id // ID_BLOCK == r.compute_node for r in rows)  # block discipline
    assert all(r._min <= r._max for r in rows)
    # surviving words keep their end-cap ids (splits never touch caps)
    old_caps = {r.node: r.id for r in pt0.where("is_word").collect()}
    new_caps = {r.node: r.id for r in pt1.where("is_word").collect()}
    assert all(new_caps[w] == i for w, i in old_caps.items())


def test_add_existing_words_is_identity(spark):
    pt0 = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=2)
    pt1 = add_words(pt0, _words_df(spark, SPARSE_WORDS[:4]), "word")
    assert {tuple(r) for r in pt1.collect()} == {tuple(r) for r in pt0.collect()}


def test_add_words_rejects_keep_duplicates(spark):
    ptd = create(
        _words_df(spark, ["A", "A"]), "word", num_partitions=1, keep_duplicates=True
    )
    with pytest.raises(ValueError, match="keep_duplicates"):
        add_words(ptd, _words_df(spark, ["B"]), "word")


@pytest.mark.parametrize("seed", [5, 6])
@pytest.mark.parametrize("parts", [1, 3])
def test_remove_words_query_equivalence(spark, seed, parts):
    """remove_words(build(A), R) ≡ build(A − R) as query-result sets,
    across partitionings; removing absent words is a no-op."""
    base = _vocab(seed, 80)
    removal = base[::3] + _vocab(seed + 50, 10)  # some absent on purpose
    remaining = sorted(set(base) - set(removal))
    queries = _vocab(seed + 200, 10)
    pruned = remove_words(
        create(_words_df(spark, base), "word", num_partitions=parts),
        _words_df(spark, removal),
        "word",
    )
    qdf = spark.createDataFrame([(q,) for q in queries], ["q"])
    got = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pruned, qdf, "q", 1).collect()
    }
    want = {
        (q, w, brute_levenshtein(q, w))
        for q in set(queries)
        for w in remaining
        if brute_levenshtein(q, w) <= 1
    }
    assert got == want


def test_remove_words_ids_stable_and_untouched_forests(spark):
    pt = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=3).cache()
    before = {r.id for r in pt.select("id").collect()}
    victim = SPARSE_WORDS[0]
    pruned = remove_words(pt, spark.createDataFrame([(victim,)], ["word"]), "word").cache()
    after_rows = pruned.collect()
    after = {r.id for r in after_rows}
    # no new ids ever; the victim's end-cap is gone
    assert after <= before
    assert victim not in {r.node for r in after_rows if r.is_word}
    # words removed entirely -> empty table allowed
    empty = remove_words(pt, _words_df(spark, SPARSE_WORDS), "word")
    assert empty.where("is_word").count() == 0
    pt.unpersist(); pruned.unpersist()


def test_remove_then_add_roundtrip(spark):
    """remove then re-add restores the exact word set (ids may differ)."""
    base = _vocab(9, 50)
    pt = create(_words_df(spark, base), "word", num_partitions=3)
    sub = base[::4]
    back = add_words(remove_words(pt, _words_df(spark, sub), "word"),
                     _words_df(spark, sub), "word")
    got = {r.node for r in back.where("is_word").collect()}
    assert got == set(base)


def test_remove_words_rejects_keep_duplicates(spark):
    pt = create(_words_df(spark, ["AA", "AA", "AB"]), "word", keep_duplicates=True)
    with pytest.raises(ValueError, match="keep_duplicates"):
        remove_words(pt, _words_df(spark, ["AA"]), "word")


def test_incremental_trim_right_targets_exact_word(spark):
    """On a trim='right' index, add/remove must respect leading spaces
    (review finding: a full-trimmed delta deletes the wrong homograph)."""
    words = spark.createDataFrame([("  cat ",), ("cat ",)], ["word"])
    pt = create(words, "word", trim="right")
    pruned = remove_words(
        pt, spark.createDataFrame([("  cat ",)], ["word"]), "word", trim="right"
    )
    left = {r.node for r in pruned.where("is_word").collect()}
    assert left == {"cat"}  # '  cat' removed, homograph 'cat' intact
    grown = add_words(
        pruned, spark.createDataFrame([("  dog ",)], ["word"]), "word", trim="right"
    )
    assert {r.node for r in grown.where("is_word").collect()} == {"cat", "  dog"}


def test_add_words_existing_words_never_duplicate_across_forests(spark):
    """Regression (round-5 review): with empty build partitions,
    max(compute_node)+1 undercounts the build's forest count, and
    hash-routing an EXISTING delta word with that count could land it
    in a different forest than its end-cap — a second end-cap that
    makes distributed query modes return the word twice. Existing
    words are now dropped index-side before routing, so every word
    must keep exactly ONE end-cap under any layout."""
    words = ["ALPHA", "BETA", "GAMMA"]
    pt = create(_words_df(spark, words), "word", num_partitions=8).persist()
    try:
        max_cn = pt.agg(F.max("compute_node")).first()[0]
        assert max_cn + 1 < 8  # the undercount scenario is actually live
        delta = _words_df(spark, words + ["DELTA"])  # all-but-one existing
        pt2 = add_words(pt, delta, "word")
        caps = (
            pt2.where("is_word").groupBy("node").count().where("count > 1")
        )
        assert caps.count() == 0
        got = {
            (r.query_string, r.node)
            for r in query(
                pt2, _words_df(spark, ["ALPHA"]).select(F.col("word").alias("q")),
                "q", 0, mode="broadcast_queries",
            ).collect()
        }
        assert got == {("ALPHA", "ALPHA")}
    finally:
        pt.unpersist()


def test_add_words_on_emptied_table(spark):
    """remove_words can drain every forest; add_words must repopulate
    an empty node table instead of crashing on max(compute_node)=NULL."""
    pt = create(_words_df(spark, ["ONE", "TWO"]), "word", num_partitions=2)
    emptied = remove_words(pt, _words_df(spark, ["ONE", "TWO"]), "word")
    assert emptied.count() == 0
    repop = add_words(emptied, _words_df(spark, ["THREE"]), "word")
    got = {
        (r.query_string, r.node)
        for r in query(
            repop, _words_df(spark, ["THREE"]).select(F.col("word").alias("q")),
            "q", 0, mode="broadcast_tree",
        ).collect()
    }
    assert got == {("THREE", "THREE")}


def test_sparse_pruned_plan_bypasses_python_and_matches_bulk(spark):
    """pruned=True routes ONLY touched forests through the Python
    cogroup — the untouched majority rides a JVM-only filter branch of
    a Union — and returns the same word set as the one-shot plan."""
    pt = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=4)
    rem = _words_df(spark, ["CAT"])
    out = remove_words(pt, rem, "word", pruned=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapCoGroupsInPandas") == 1
    assert "Union" in plan
    bulk = remove_words(pt, rem, "word", pruned=False)
    assert "Union" not in bulk._jdf.queryExecution().executedPlan().toString()
    key = lambda df: sorted(r.node for r in df.where("is_word").collect())
    assert key(out) == key(bulk) and "CAT" not in key(out)
    # add side: same plan contract
    delta = _words_df(spark, ["ZEBRA"])
    grown = add_words(pt, delta, "word", pruned=True)
    gplan = grown._jdf.queryExecution().executedPlan().toString()
    assert gplan.count("FlatMapCoGroupsInPandas") == 1 and "Union" in gplan
    assert key(grown) == key(add_words(pt, delta, "word", pruned=False))


def test_n_forests_hint_skips_probe_and_rides_saves(spark, tmp_path):
    """create/load_index attach the forest count; the delta paths
    consume it for their sparse gate (no per-call max(compute_node)
    probe) and propagate it on their outputs. Correctness never
    depends on the value — only the plan choice does."""
    import os

    from prefixtree_spark.operators.build import load_index, save_index
    from prefixtree_spark.plans.tree import n_forests_hint, set_n_forests_hint

    words = _words_df(spark, ["CAT", "DOG", "CART", "DART"])
    pt = create(words, "word", num_partitions=4)
    assert n_forests_hint(pt) == 4
    path = str(tmp_path / "idx_meta")
    save_index(pt, path)
    assert os.path.exists(os.path.join(path, "_pt_meta"))
    loaded = load_index(spark, path)
    assert n_forests_hint(loaded) == 4

    # the gate consumes the HINT, not a probe: an absurdly large count
    # forces the pruned plan (untouched ∪ merged) for a 1-word removal
    pt2 = load_index(spark, path)
    set_n_forests_hint(pt2, 10_000)
    out = remove_words(pt2, _words_df(spark, ["CAT"]), "word")
    assert "Union" in out._jdf.queryExecution().optimizedPlan().toString()
    assert {r.node for r in out.where("is_word").collect()} == {
        "DOG", "CART", "DART",
    }
    assert n_forests_hint(out) == 10_000  # removal never adds forests

    # add_words routes with the hint and re-attaches it on the output;
    # query equivalence holds under ANY routing (new words only)
    grown = add_words(out, _words_df(spark, ["DARN"]), "word")
    assert n_forests_hint(grown) == 10_000
    qdf = spark.createDataFrame([("DARN",), ("DART",)], ["q"])
    assert {
        (r.query_string, r.node, r.final_distance)
        for r in query(grown, qdf, "q", 1).collect()
    } == {
        ("DARN", "DARN", 0), ("DARN", "DART", 1), ("DARN", "DARN", 0),
        ("DART", "DART", 0), ("DART", "DARN", 1), ("DART", "CART", 1),
    }

    # legacy saves (no _pt_meta) still load — hint absent, probe path
    os.remove(os.path.join(path, "_pt_meta"))
    legacy = load_index(spark, path)
    assert n_forests_hint(legacy) is None
    out2 = remove_words(legacy, _words_df(spark, ["CAT"]), "word")
    assert {r.node for r in out2.where("is_word").collect()} == {
        "DOG", "CART", "DART",
    }


def test_bytes_mode_deltas_match_monolithic_byte_build(spark):
    """add_words/remove_words on a create(bytes=True) index must speak
    the same byte-surrogate space: grow-then-shrink equals the
    monolithic byte build as a query-result set, non-ASCII words
    included."""
    from prefixtree_spark import add_words, create, query, remove_words

    base = ["héllo", "wörld", "plain"]
    extra = ["hëllo", "worle"]
    df = spark.createDataFrame([(w,) for w in base], ["word"])
    pt = create(df, "word", bytes=True, num_partitions=2)
    pt = add_words(
        pt, spark.createDataFrame([(w,) for w in extra], ["word"]),
        "word", bytes=True,
    )
    pt = remove_words(
        pt, spark.createDataFrame([("plain",), ("wörld",)], ["word"]),
        "word", bytes=True,
    )
    mono = create(
        spark.createDataFrame(
            [(w,) for w in ["héllo", "hëllo", "worle"]], ["word"]
        ),
        "word", bytes=True, num_partitions=2,
    )
    qdf = spark.createDataFrame([("héllo",), ("worle",)], ["q"])
    got = {
        (r.query_string, r.node, r.final_distance)
        for r in query(pt, qdf, "q", 2, bytes=True).collect()
    }
    want = {
        (r.query_string, r.node, r.final_distance)
        for r in query(mono, qdf, "q", 2, bytes=True).collect()
    }
    assert got == want and got
    # byte semantics really held through the deltas: hëllo is 2 byte
    # edits from héllo (ë and é differ in their second UTF-8 byte...
    # verify against the DuckDB byte oracle instead of guessing)
    import duckdb

    d = duckdb.sql("select levenshtein('héllo','hëllo')").fetchone()[0]
    assert ("héllo", "hëllo", d) in got or d > 2
