"""Damerau-Levenshtein metric: kernel fuzz vs DuckDB, the
metric="damerau" similarity join vs brute force, and the
transposition-semantics demonstration."""

import random

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.functions.damerau import damerau_levenshtein


def test_dl_hallmark_cases():
    # unrestricted (Lowrance-Wagner), NOT the restricted OSA variant:
    # CA -> AC -> ABC is two ops (OSA would say 3)
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("abcd", "acbd") == 1
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("", "") == 0
    assert damerau_levenshtein("a", "") == 1
    assert damerau_levenshtein("", "xyz") == 3
    assert damerau_levenshtein("same", "same") == 0


def test_dl_fuzz_matches_duckdb(duck):
    """2000 random small-alphabet pairs (transposition-dense) must match
    DuckDB's damerau_levenshtein bit-for-bit — the oracle contract."""
    rng = random.Random(1234)
    alpha = "abcd"
    cases = []
    for _ in range(2000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
        cases.append((a, b))
    want = [
        r[0]
        for r in duck.execute(
            "select damerau_levenshtein(a, b)"
            " from (select unnest($1) a, unnest($2) b)",
            [[c[0] for c in cases], [c[1] for c in cases]],
        ).fetchall()
    ]
    got = [damerau_levenshtein(a, b) for a, b in cases]
    assert got == want


def test_dl_batch_matches_scalar_exhaustive():
    """The r13 batch-vectorized kernel must equal the scalar DP on every
    alphabet-3 pair to length 4 (14,641 pairs — covers transposition,
    flank-trim and trivial-core dispatch corners), plus fuzz over longer
    mixed-alphabet strings and the long-string scalar fallback."""
    import itertools

    import numpy as np

    from prefixtree_spark.functions.damerau import dl_batch

    words = [""]
    for ln in range(1, 5):
        words += ["".join(t) for t in itertools.product("abc", repeat=ln)]
    a_l = [a for a in words for _ in words]
    b_l = [b for _ in words for b in words]
    got = dl_batch(a_l, b_l)
    exp = np.array([damerau_levenshtein(a, b) for a, b in zip(a_l, b_l)])
    assert (got == exp).all()

    rng = random.Random(13)
    pools = ["ab", "abcde", "abcdefghij", "áβ☃ab", "aabb"]
    a_l, b_l = [], []
    for _ in range(4000):
        pool = rng.choice(pools)
        a_l.append(
            "".join(rng.choice(pool) for _ in range(rng.randint(0, 24)))
        )
        b_l.append(
            "".join(rng.choice(pool) for _ in range(rng.randint(0, 24)))
        )
    # long tail exercises the scalar-fallback route
    a_l += ["x" * 600, "x" * 600 + "ab"]
    b_l += ["x" * 600 + "y", "x" * 600 + "ba"]
    got = dl_batch(a_l, b_l)
    exp = np.array([damerau_levenshtein(a, b) for a, b in zip(a_l, b_l)])
    assert (got == exp).all()


def test_dl_lev_bound_property():
    """lev <= 2*dl — the inequality the candidate superset rides on."""
    from prefixtree_spark.functions.levenshtein import levenshtein

    rng = random.Random(77)
    alpha = "abc"
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        dl = damerau_levenshtein(a, b)
        lv = levenshtein(a, b)
        assert dl <= lv <= 2 * dl or (dl == lv == 0)


@pytest.mark.parametrize("num_partitions", [1, 3])
@pytest.mark.parametrize("k", [1, 2])
def test_similarity_join_damerau_vs_brute(spark, num_partitions, k):
    """metric="damerau" equals the brute-force DL <= k cross join on a
    random vocabulary, across partitionings."""
    from prefixtree_spark.operators.similarity_join import similarity_join

    rng = random.Random(42)
    alpha = "abcde"
    vocab = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(2, 7)))
         for _ in range(120)}
    )
    queries = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(2, 7)))
         for _ in range(40)}
    )
    left = spark.createDataFrame([(q,) for q in queries], ["q"]).repartition(
        num_partitions
    )
    right = spark.createDataFrame([(w,) for w in vocab], ["w"]).repartition(
        num_partitions
    )
    got = {
        (r.left_value, r.right_value, r.distance)
        for r in similarity_join(
            left, "q", right, "w", k, metric="damerau"
        ).collect()
    }
    want = {
        (q, w, damerau_levenshtein(q, w))
        for q in queries
        for w in vocab
        if damerau_levenshtein(q, w) <= k
    }
    assert got == want


def test_damerau_finds_transpositions_levenshtein_misses(spark):
    """The semantics the metric exists for: a single adjacent swap is
    distance 1 under damerau but 2 under levenshtein, so the k=1 join
    finds it only with metric="damerau"."""
    from prefixtree_spark.operators.similarity_join import similarity_join

    right = spark.createDataFrame([("SMITH",), ("JONES",)], ["w"])
    left = spark.createDataFrame([("SMIHT",)], ["q"])  # TH -> HT swap
    dam = similarity_join(left, "q", right, "w", 1, metric="damerau").collect()
    assert {(r.left_value, r.right_value, r.distance) for r in dam} == {
        ("SMIHT", "SMITH", 1)
    }
    lev = similarity_join(left, "q", right, "w", 1).collect()
    assert lev == []


def test_query_one_damerau_vs_brute(spark):
    """The serving path speaks the metric too: query_one(metric=
    "damerau") equals brute-force DL over the vocabulary."""
    from prefixtree_spark import build_local_index, create, query_one

    rng = random.Random(9)
    alpha = "abcd"
    vocab = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(2, 6)))
         for _ in range(80)}
    )
    pt = create(spark.createDataFrame([(w,) for w in vocab], ["w"]), "w")
    idx = build_local_index(pt)
    for q in ["abdc", "ba", "ddddd", "ab"]:
        got = query_one(idx, q, 1, metric="damerau")
        want = sorted(
            [(w, damerau_levenshtein(q, w)) for w in vocab
             if damerau_levenshtein(q, w) <= 1],
            key=lambda t: (t[1], t[0]),
        )
        assert got == want, (q, got, want)
    with pytest.raises(ValueError, match="metric"):
        query_one(idx, "ab", 1, metric="osa")


def test_http_search_metric_damerau(spark):
    """GET /search?metric=damerau returns transposition-aware hits;
    a bad metric is a 400, and the default stays levenshtein."""
    import json as _json
    import urllib.error
    import urllib.request

    from prefixtree_spark import build_local_index, create
    from prefixtree_spark.serving import PrefixTreeServer

    pt = create(
        spark.createDataFrame([("SMITH",), ("JONES",)], ["w"]), "w"
    )
    with PrefixTreeServer(build_local_index(pt)) as srv:
        def get(path):
            with urllib.request.urlopen(srv.url(path), timeout=10) as r:
                return _json.loads(r.read())

        assert get("/search?q=SMIHT&k=1&metric=damerau") == [["SMITH", 1]]
        assert get("/search?q=SMIHT&k=1") == []  # levenshtein default
        try:
            get("/search?q=SMIHT&k=1&metric=osa")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_metric_validation_and_passthrough(spark):
    from prefixtree_spark.operators.similarity_join import (
        best_match,
        fuzzy_dedup,
        similarity_join,
    )

    df = spark.createDataFrame([("AB",), ("BA",), ("ZZZZ",)], ["v"])
    with pytest.raises(ValueError, match="metric"):
        similarity_join(df, "v", df, "v", 1, metric="jaro")
    # best_match: the swap is the closest (and only) in-bound match
    bm = best_match(
        spark.createDataFrame([("AB",)], ["q"]), "q",
        spark.createDataFrame([("BA",), ("ZZZZ",)], ["v"]), "v",
        1, metric="damerau",
    ).collect()
    assert [(r.left_value, r.best_match, r.distance) for r in bm] == [
        ("AB", "BA", 1)
    ]
    # fuzzy_dedup: AB and BA cluster at dl<=1; ZZZZ stays alone
    comp = {
        r.value: r.component
        for r in fuzzy_dedup(df, "v", 1, metric="damerau").collect()
    }
    assert comp["AB"] == comp["BA"] == "AB" and comp["ZZZZ"] == "ZZZZ"
