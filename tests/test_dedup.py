"""Dedup operator tests: exact, Jaccard, MinHash-LSH recall, SimHash."""

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different words entirely unrelated text here now"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "short text"),  # < 3 tokens after shingling guard
        (5, "a b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "x", "a"), (3, "y", "b")], ["id", "k1", "k2"]
    )
    got = {tuple(r) for r in dedup.exact_dedup(df, ["k1", "k2"], "id").collect()}
    assert got == {("x", "a", 1, 2), ("y", "b", 3, 1)}


def test_token_shingles_short_docs(docs):
    sh = dedup.token_shingles(docs, "doc_id", "text", 3)
    by_doc = {r.doc: 1 for r in sh.select("doc").distinct().collect()}
    assert 5 not in by_doc  # 2 tokens < n: no shingles, no crash
    assert 4 not in by_doc


def test_jaccard_exact_and_dup_pair(docs):
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(0, 3)] == 1.0  # exact duplicates
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert (1, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_minhash_lsh_equals_exact(docs):
    exact = {
        (r.id1, r.id2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    lsh = {
        (r.id1, r.id2, r.jaccard)
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert lsh == exact


def test_char_jaccard_pairs(docs):
    pairs = {
        (r.id1, r.id2)
        for r in dedup.char_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.6).collect()
    }
    assert (0, 3) in pairs  # exact duplicates
    assert (0, 1) in pairs  # near-dup (one word differs)
    assert not any(2 in p for p in pairs)


def test_dedup_corpus_removes_cluster_non_minima(spark, docs):
    survivors = sorted(
        r.doc_id
        for r in dedup.dedup_corpus(docs, "doc_id", "text", threshold=0.5).collect()
    )
    # cluster {0, 1, 3} keeps only 0; singletons and short docs survive
    assert survivors == [0, 2, 4, 5]


def _brute_jaccard_pairs(texts, n, threshold, max_df=None):
    """Python reference: Jaccard over token-n-gram sets, optionally on
    the max_df-filtered shingle universe."""
    sets = {}
    for i, t in texts.items():
        toks = t.split()
        sets[i] = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }
    if max_df is not None:
        from collections import Counter

        df_count = Counter(s for ss in sets.values() for s in ss)
        sets = {
            i: {s for s in ss if df_count[s] <= max_df}
            for i, ss in sets.items()
        }
    out = {}
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = inter / (len(sets[a] | sets[b]))
                    if j >= threshold:
                        out[(a, b)] = round(j, 6)
    return out


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """Every doc shares an identical boilerplate tail (the hot-shingle
    hazard: its shingles have df == n_docs); only 0/1 share real
    content."""
    boiler = "subscribe to our newsletter terms of service apply all rights reserved"
    rows = [
        (0, "alpha beta gamma delta epsilon zeta " + boiler),
        (1, "alpha beta gamma delta epsilon eta " + boiler),
        (2, "one two three four five six " + boiler),
        (3, "seven eight nine ten eleven twelve " + boiler),
        (4, "unrelated totally different content words here " + boiler),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]), dict(
        (i, t) for i, t in rows
    )


def test_max_df_caps_boilerplate_fanout(boilerplate_docs):
    df, texts = boilerplate_docs
    # without the cap every pair shares boilerplate shingles: the
    # inverted-index join touches all C(5,2) pairs
    uncapped = _brute_jaccard_pairs(texts, 3, 0.2)
    assert len(uncapped) == 10
    # cap at df<=2: boilerplate shingles (df=5) drop, only the real
    # content pair remains — and Spark must agree with brute force on
    # the filtered universe
    capped_expected = _brute_jaccard_pairs(texts, 3, 0.2, max_df=2)
    assert set(capped_expected) == {(0, 1)}
    got = {
        (r.id1, r.id2): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.2, max_df=2
        ).collect()
    }
    assert got == capped_expected


def test_max_df_lsh_matches_exact_on_filtered_space(boilerplate_docs):
    df, texts = boilerplate_docs
    exact = {
        (r.id1, r.id2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.2, max_df=2
        ).collect()
    }
    lsh = {
        (r.id1, r.id2, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.2, max_df=2
        ).collect()
    }
    assert lsh == exact


def test_simhash_properties(docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()}
    assert sig[0] == sig[3]  # identical text -> identical signature
    assert 0 <= sig[0] < (1 << 60)
    ham01 = bin(sig[0] ^ sig[1]).count("1")
    ham02 = bin(sig[0] ^ sig[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def test_simhash_pairs_pigeonhole_matches_bruteforce(docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()}
    k = 10
    expected = {
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= k
    }
    got = {
        (r.id1, r.id2, r.hamming)
        for r in dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=k).collect()
    }
    assert got == expected


def _brute_weighted_jaccard(texts, threshold, max_df=None):
    """Driver-side TF-weighted Jaccard; with max_df, over the
    df-filtered token universe (same semantics as the operator)."""
    from collections import Counter

    tfs = {i: Counter(t.split()) for i, t in texts.items()}
    if max_df is not None:
        dfc = Counter()
        for c in tfs.values():
            for tok in c:
                dfc[tok] += 1
        tfs = {
            i: Counter({t: n for t, n in c.items() if dfc[t] <= max_df})
            for i, c in tfs.items()
        }
    out = {}
    for a in tfs:
        for b in tfs:
            if a < b:
                smin = sum(min(n, tfs[b][t]) for t, n in tfs[a].items())
                smax = sum(tfs[a].values()) + sum(tfs[b].values()) - smin
                if smax and smin / smax >= threshold:
                    out[(a, b)] = round(smin / smax, 6)
    return out


def test_weighted_jaccard_max_df_matches_bruteforce(boilerplate_docs):
    """The one sibling that missed max_df in round 2: capped results
    must equal brute force over the filtered token universe, and the
    cap must actually change the answer on a boilerplate-heavy corpus
    (otherwise this test is vacuous)."""
    df, texts = boilerplate_docs
    uncapped_expected = _brute_weighted_jaccard(texts, 0.2)
    capped_expected = _brute_weighted_jaccard(texts, 0.2, max_df=2)
    assert uncapped_expected != capped_expected
    got_uncapped = {
        (r.id1, r.id2): r.w_jaccard
        for r in dedup.weighted_jaccard_pairs(
            df, "doc_id", "text", threshold=0.2
        ).collect()
    }
    got_capped = {
        (r.id1, r.id2): r.w_jaccard
        for r in dedup.weighted_jaccard_pairs(
            df, "doc_id", "text", threshold=0.2, max_df=2
        ).collect()
    }
    assert got_uncapped == uncapped_expected
    assert got_capped == capped_expected


def test_intermediate_caches_released(spark, docs):
    """Each near-dup operator pins its (small) result and unpersists
    its corpus-sized shingle/token/signature cache before returning:
    the persistent-RDD delta per call is at most the result's own
    checkpoint — the intermediates must NOT remain (round-2 verdict #4)."""
    jsc = spark.sparkContext._jsc

    def n_persistent():
        return jsc.getPersistentRDDs().size()

    ops = [
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8),
        lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8),
        lambda: dedup.weighted_jaccard_pairs(docs, "doc_id", "text", threshold=0.2),
        lambda: dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3),
    ]
    for op in ops:
        before = n_persistent()
        res = op()
        res.count()
        # at most the pinned result's checkpoint storage; the cached
        # shingles/tokens/signatures are gone
        assert n_persistent() - before <= 1


def test_decontaminate_removes_ngram_overlap(spark):
    """Train docs sharing an n-gram with the test set are removed;
    clean docs survive; the test doc itself (when present in train) is
    contaminated by definition."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dogs"),
            (2, "a completely clean training document here"),
            (3, "prefix words then the quick brown fox appears again"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(100, "something the quick brown fox something")], ["doc_id", "text"]
    )
    survivors = {
        r.doc_id
        for r in dedup.decontaminate(train, test, "doc_id", "text", n=4).collect()
    }
    # docs 1 and 3 share the 4-gram "the quick brown fox"; 2 is clean;
    # 4 is shorter than n tokens so it can never collide
    assert survivors == {2, 4}


def test_incremental_lsh_bipartite(spark):
    """Cross-side near-dups found; same-side near-dups NOT reported;
    overlapping id spaces between the two tables never mix."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # 2 and 3 are near-dups of each other WITHIN the corpus —
            # must not appear in the bipartite output
            (2, "one two three four five six seven eight nine ten"),
            (3, "one two three four five six seven eight nine eleven"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            # id 1 ALSO exists in the corpus with different text: id
            # spaces may overlap, sides must stay separate
            (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
            (9, "totally unrelated fresh document about spark engines here"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.incremental_lsh_pairs(
        new, corpus, "doc_id", "text", n=3, threshold=0.5
    ).collect()
    got = {(r.new_id, r.corpus_id) for r in pairs}
    # new doc 1 matches corpus doc 1 (9-of-10 tokens shared); new doc 9
    # matches nothing; the corpus-internal (2,3) pair is absent
    assert got == {(1, 1)}
    for r in pairs:
        assert 0.0 < r.jaccard <= 1.0


def test_incremental_lsh_matches_exact_bipartite(spark, docs):
    """LSH-band candidates + exact verify equals the brute-force
    bipartite Jaccard join on the fixture corpus."""
    new = docs.where("doc_id % 3 = 0")
    corpus = docs.where("doc_id % 3 <> 0")
    got = {
        (r.new_id, r.corpus_id)
        for r in dedup.incremental_lsh_pairs(
            new, corpus, "doc_id", "text", n=2, threshold=0.6
        ).collect()
    }
    # brute force in python
    import itertools

    def shingles(text, n=2):
        ts = text.split()
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    rows = docs.collect()
    new_rows = [(r.doc_id, shingles(r.text)) for r in rows if r.doc_id % 3 == 0]
    cor_rows = [(r.doc_id, shingles(r.text)) for r in rows if r.doc_id % 3 != 0]
    want = set()
    for (ni, ns), (ci, cs) in itertools.product(new_rows, cor_rows):
        if not ns or not cs:
            continue
        j = len(ns & cs) / len(ns | cs)
        if j >= 0.6:
            want.add((ni, ci))
    assert got == want


def test_keep_best_picks_highest_score(spark):
    """keep_best keeps the max-score row per key; ties break on min id
    (deterministic across partitionings); ascending mode inverts."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("a", 1, 0.5), ("a", 2, 0.9), ("a", 3, 0.9),
            ("b", 4, 0.1),
            ("c", 6, 0.3), ("c", 5, 0.3),
        ],
        "key string, id long, score double",
    )
    best = {
        (r.key, r.id)
        for r in dedup.keep_best(df, ["key"], "score", "id").collect()
    }
    assert best == {("a", 2), ("b", 4), ("c", 5)}
    worst = {
        (r.key, r.id)
        for r in dedup.keep_best(
            df, ["key"], "score", "id", descending=False
        ).collect()
    }
    assert worst == {("a", 1), ("b", 4), ("c", 5)}
    # full rows survive (not just keys)
    cols = set(dedup.keep_best(df, ["key"], "score", "id").columns)
    assert cols == {"key", "id", "score"}
    # partitioning independence
    rep = {
        (r.key, r.id)
        for r in dedup.keep_best(
            df.repartition(7), ["key"], "score", "id"
        ).collect()
    }
    assert rep == best


def test_contamination_report_severity(spark):
    """Planted severities: a verbatim test copy reports frac=1.0, a
    one-shingle quoter reports exactly that shingle's share, clean docs
    are absent, and decontaminate drops exactly the reported ids."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # verbatim copy of eval
            (2, "zzz yyy alpha beta gamma xxx www"),  # quotes one 3-shingle
            (3, "totally clean text here now"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    rep = {r.doc_id: (r.n_shingles, r.n_hit, r.frac) for r in
           dedup.contamination_report(train, test, "doc_id", "text", n=3).collect()}
    assert set(rep) == {1, 2}
    assert rep[1] == (2, 2, 1.0)          # both 3-shingles hit
    assert rep[2] == (5, 1, 0.2)          # 7 tokens -> 5 shingles, 1 hit
    kept = {r.doc_id for r in
            dedup.decontaminate(train, test, "doc_id", "text", n=3).collect()}
    assert kept == {3}


def test_token_shingles_whitespace_robust(spark):
    """Two docs identical modulo a trailing newline must reach Jaccard
    1.0 — trim+split tokenization minted a phantom empty token on one
    side and failed the threshold (round-5 review)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta\n"),
         (3, "\t alpha  beta\tgamma delta \n")],
        "doc_id long, text string",
    )
    pairs = {(r.id1, r.id2): r.jaccard for r in
             dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=3,
                                       threshold=0.8).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert pairs.get((1, 3)) == 1.0  # runs of mixed whitespace collapse


def test_keep_best_caller_rn_column_survives(spark):
    """A caller column literally named '_rn' must survive keep_best
    (r5 ADVICE: fixed working names silently overwrote user data)."""
    df = spark.createDataFrame(
        [("a", 1, 0.5, "x"), ("a", 2, 0.9, "y")],
        "key string, id long, score double, _rn string",
    )
    out = dedup.keep_best(df, ["key"], "score", "id")
    assert set(out.columns) == {"key", "id", "score", "_rn"}
    assert [(r.id, r._rn) for r in out.collect()] == [(2, "y")]
