"""Text-analysis operator tests against hand-computed values."""

import hashlib

import pytest

from prefixtree_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox, and the lazy dog!"),
        (1, "der hund und die katze und das pferd"),
        (2, ""),
        (3, "x" * 7),  # shorter than the 8-gram fingerprint window
        (4, "numbers 123 and punct?!"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_text_stats(docs):
    got = {r.doc_id: r for r in text.text_stats(docs, "doc_id", "text").collect()}
    r0 = got[0]
    assert r0.n_chars == len("the quick brown fox, and the lazy dog!")
    assert r0.n_tokens == 8
    assert r0.n_punct == 2  # ',' and '!'
    assert r0.n_stopwords == 3  # the, and, the ('fox,' and 'dog!' don't count)
    r2 = got[2]
    assert r2.n_tokens == 0 and r2.mean_token_len == 0.0 and r2.stopword_ratio == 0.0


def test_token_count_bpe(docs):
    got = {r.doc_id: r.n_bpe_tokens for r in text.token_count_regex(docs, "doc_id", "text").collect()}
    # "numbers 123 and punct?!" -> numbers,123,and,punct,?,! = 6
    assert got[4] == 6
    assert got[2] == 0
    assert got[3] == 1


def test_language_id(docs):
    got = {r.doc_id: (r.lang_pred, r.lang_score) for r in text.language_id(docs, "doc_id", "text").collect()}
    assert got[0] == ("en", 3)  # ' the '×2 + ' and '×1
    assert got[1][0] == "de"
    assert got[2] == ("und", 0)


def test_quality_score_bounds_and_ordering(docs):
    got = {r.doc_id: r.quality for r in text.quality_score(docs, "doc_id", "text").collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[2] == 0.0  # empty doc
    # natural english text scores above digit/punct-heavy text
    assert got[0] > got[4]


def test_doc_fingerprint(docs):
    got = {r.doc_id: r.fingerprint for r in text.doc_fingerprint(docs, "doc_id", "text").collect()}
    assert 2 not in got and 3 not in got  # too short: absent
    t = "the quick brown fox, and the lazy dog!"
    expected = min(
        int(hashlib.md5(t[i : i + 8].encode()).hexdigest()[:15], 16)
        for i in range(len(t) - 7)
    )
    assert got[0] == expected


def test_top_tokens_counts_and_tiebreak(spark):
    from prefixtree_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b d")], ["doc_id", "text"]
    )
    got = [(r.tok, r.n) for r in text_ops.top_tokens(df, "text", k=3).collect()]
    # a:3, b:3 (tie -> 'a' first), c:2
    assert got == [("a", 3), ("b", 3), ("c", 2)]


def test_bpe_pair_counts(spark):
    from prefixtree_spark.operators import text as text_ops

    df = spark.createDataFrame([(1, "aab ab x")], ["doc_id", "text"])
    got = [(r.pair, r.n) for r in text_ops.bpe_pair_counts(df, "text", k=10).collect()]
    # token "aab" -> aa, ab ; "ab" -> ab ; "x" too short
    assert got == [("ab", 2), ("aa", 1)]


def test_repetition_signals(spark):
    rows = [
        (0, "spam spam spam spam"),          # one bigram repeated
        (1, "all words here are distinct"),
        (2, ""),
        (3, "one"),                          # no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.top_ngram_frac, r.dup_token_frac)
        for r in text.repetition_signals(df, "doc_id", "text").collect()
    }
    # doc 0: 3 bigrams, all "spam spam" -> 1.0; tokens 4 total 1 distinct -> 0.75
    assert got[0] == (1.0, 0.75)
    assert got[1] == (round(1 / 4, 6), 0.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)


def brute_bpe(token_counts, n_merges):
    """Textbook BPE trainer: full pair recount every iteration."""
    words = {tuple(w): c for w, c in token_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, cnt in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + cnt
        words = new
    return merges


def test_bpe_train_matches_brute_force(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lower",
        "low low low newer",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    counts = {}
    for t in texts:
        for tok in t.split():
            counts[tok] = counts.get(tok, 0) + 1
    for n in (1, 5, 20, 200):
        assert text.bpe_train(df, "text", n) == brute_bpe(counts, n), n


def test_bpe_train_exhausts_pairs(spark):
    df = spark.createDataFrame([(0, "ab ab cd")], ["doc_id", "text"])
    merges = text.bpe_train(df, "text", 100)
    # finite merge list, first merge is the most frequent pair
    assert merges[0] == ("a", "b")
    assert len(merges) < 100


def test_bpe_encode_roundtrip_with_trained_merges(spark):
    texts = ["low lower lowest", "low lower low", "newest newer new"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    merges = text.bpe_train(df, "text", 50)
    out = {r.doc_id: (r.tokens, r.n_tokens) for r in text.bpe_encode(df, "doc_id", "text", merges).collect()}
    # every word must re-concatenate to the original text's words
    for i, t in enumerate(texts):
        toks, n = out[i]
        assert n == len(toks)
        assert "".join(toks) == t.replace(" ", "")
    # with enough merges over a tiny corpus, frequent words collapse to
    # one token each ("low" appears 3x -> fully merged)
    assert "low" in out[1][0]


def test_bpe_encode_matches_stepwise_merge(spark):
    df = spark.createDataFrame([(0, "abab abab")], ["doc_id", "text"])
    # rank order: (a,b) then (ab,ab)
    merges = [("a", "b"), ("ab", "ab")]
    toks = text.bpe_encode(df, "doc_id", "text", merges).collect()[0].tokens
    assert toks == ["abab", "abab"]


def test_bpe_encode_empty_and_unknown(spark):
    df = spark.createDataFrame([(0, ""), (1, "zz qq")], ["doc_id", "text"])
    got = {r.doc_id: r.tokens for r in text.bpe_encode(df, "doc_id", "text", [("a", "b")]).collect()}
    assert got[0] == []
    assert got[1] == ["z", "z", "q", "q"]  # no applicable merges: chars


def test_ngram_counts_hand_computed(spark):
    from prefixtree_spark.operators.text import ngram_counts

    df = spark.createDataFrame(
        [("a b a b c",), ("a b",), ("solo",)], "text string"
    )
    got = {(r.ngram, r.n) for r in ngram_counts(df, "text", n=2, k=10).collect()}
    # "a b" occurs twice in doc1 + once in doc2 (multiplicity counted);
    # "solo" has no bigram
    assert got == {("a b", 3), ("b a", 1), ("b c", 1)}


def test_chunk_text_offsets_and_overlap(spark):
    from prefixtree_spark.operators.text import chunk_text

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks), (2, "short doc"), (3, "")],
                               "doc_id long, text string")
    out = chunk_text(df, "doc_id", "text", chunk_tokens=8, stride=4)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.token_start, r.n_tokens, r.chunk) for r in out.collect())
    )
    # doc1: starts 0,4,8 -> 8,6,2 tokens; doc2: one chunk; doc3 (empty): none
    assert [(d, c, s, n) for d, c, s, n, _ in rows] == [
        (1, 0, 0, 8), (1, 1, 4, 6), (1, 2, 8, 2), (2, 0, 0, 2),
    ]
    # overlap: chunk 1 starts at token 4, which chunk 0 also contains
    assert rows[0][4].split()[4:] == rows[1][4].split()[:4]
    # chunks reassemble the doc: disjoint stride == chunk_tokens
    disjoint = chunk_text(df, "doc_id", "text", chunk_tokens=4, stride=4)
    d1 = sorted(
        (r.chunk_id, r.chunk) for r in disjoint.where("doc_id = 1").collect()
    )
    assert " ".join(c for _, c in d1) == toks
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", chunk_tokens=0, stride=4)


def test_detect_and_redact_pii(spark):
    from prefixtree_spark.operators.text import detect_pii, redact_pii

    rows = [
        (1, "mail a.b+c@ex-ample.org and b@c.io today"),
        (2, "call 555-123-4567 or 555.123.4567"),
        (3, "ssn 123-45-6789 ip 10.0.0.1"),
        (4, "clean text, no identifiers at all"),
        (5, "versions 1.2.3.4 and 255.255.255.255"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in detect_pii(df, "doc_id", "text").collect()}
    assert (got[1].n_email, got[1].has_pii) == (2, True)
    assert (got[2].n_phone, got[2].n_ssn) == (2, 0)
    assert (got[3].n_ssn, got[3].n_ipv4, got[3].has_pii) == (1, 1, True)
    assert got[4].has_pii is False
    assert got[5].n_ipv4 == 2  # honest: dotted quads match, version-like or not

    red = {r.doc_id: r.text for r in redact_pii(df, "text").collect()}
    assert red[1] == "mail <EMAIL> and <EMAIL> today"
    assert red[2] == "call <PHONE> or <PHONE>"
    assert red[3] == "ssn <SSN> ip <IPV4>"
    assert red[4] == rows[3][1]
    # out_col keeps the original column intact
    both = redact_pii(df, "text", out_col="clean").where("doc_id = 3").first()
    assert "123-45-6789" in both.text and "<SSN>" in both.clean


def test_normalize_text(spark):
    from prefixtree_spark.operators.text import normalize_text

    rows = [
        (1, "  Hello   WORLD  "),
        (2, "tab\there\x00and\x1fcontrol\x7fchars"),
        (3, "already clean"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.text for r in normalize_text(df, "text").collect()}
    assert got[1] == "hello world"
    assert got[2] == "tab here and control chars"
    assert got[3] == "already clean"
    # out_col preserves the original
    r = normalize_text(df, "text", out_col="norm").where("doc_id = 1").first()
    assert r.text == "  Hello   WORLD  " and r.norm == "hello world"


def test_normalize_and_redact_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) and redact(redact(x)) ==
    redact(x): both are safe to re-run in restartable pipelines."""
    from prefixtree_spark.operators.text import normalize_text, redact_pii

    rows = [
        (1, "  MiXeD   Case\x00and  control  "),
        (2, "mail a@b.co ssn 123-45-6789 ip 10.0.0.1 call 555-123-4567"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once_n = normalize_text(df, "text", out_col="n1")
    twice_n = normalize_text(once_n, "n1", out_col="n2")
    assert all(r.n1 == r.n2 for r in twice_n.collect())
    once_r = redact_pii(df, "text", out_col="r1")
    twice_r = redact_pii(once_r, "r1", out_col="r2")
    assert all(r.r1 == r.r2 for r in twice_r.collect())


def test_corpus_report_hand_computed(spark):
    """Data card vs hand-computed stats on a tiny corpus, including the
    bucket boundary (quality exactly on a 0.1 edge floors into the
    upper bucket in both engines via the same scaled-integer floor)."""
    from prefixtree_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat."),
            (2, "a b c d e f g h"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.metric: r.value for r in
           T.corpus_report(docs, "doc_id", "text").collect()}
    qual = {r.doc_id: r.quality for r in
            T.quality_score(docs, "doc_id", "text").collect()}
    import math
    q6 = {d: math.floor(q * 1_000_000) for d, q in qual.items()}
    assert got["n_docs"] == 3.0
    assert got["total_tokens"] == 6.0 + 8.0 + 0.0
    assert got["avg_tokens"] == round(14 / 3, 6)
    assert got["avg_quality"] == round(sum(q6.values()) / 3 / 1e6, 6)
    assert got["n_low_quality"] == sum(1 for v in q6.values() if v < 300_000)
    # histogram covers every doc exactly once
    hist = {k: v for k, v in got.items() if k.startswith("quality_bucket_")}
    assert sum(hist.values()) == 3.0
    for d, v in q6.items():
        b = min(math.floor(v / 100_000), 9)
        assert hist.get(f"quality_bucket_{b}", 0) >= 1


def test_lm_nll_hand_computed_and_ranks_gibberish(spark):
    """Exact NLL on a 2-doc corpus against a hand-built bigram LM, and
    the filter property: a doc made of corpus-frequent bigrams scores
    lower NLL than one of never-seen pairs."""
    import math

    from prefixtree_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b"),
            (3, "q z"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in
           T.lm_nll(docs, "doc_id", "text").collect()}
    # corpus bigrams: doc1: (a,b),(b,a),(a,b); doc2: (a,b); doc3: (q,z)
    # C(a,b)=3 C(b,a)=1 C(q,z)=1 ; C(a)=4? no: C(a)=sum_b C(a,b)=3? plus...
    # C(a) = C(a,b)=3 -> 3; C(b)=C(b,a)=1; C(q)=1. V=4 (a,b,q,z)
    lp = {}
    for (a, b), c_ab, c_a in [(("a", "b"), 3, 3), (("b", "a"), 1, 1),
                              (("q", "z"), 1, 1)]:
        lp[(a, b)] = math.floor(math.log((c_ab + 1) / (c_a + 4)) * 1e6)
    exp1 = round(-(lp[("a", "b")] * 2 + lp[("b", "a")]) / (3 * 1e6), 6)
    exp2 = round(-lp[("a", "b")] / 1e6, 6)
    exp3 = round(-lp[("q", "z")] / 1e6, 6)
    assert got[1] == (3, exp1)
    assert got[2] == (1, exp2)
    assert got[3] == (1, exp3)
    # frequent-bigram doc looks more corpus-like than the rare one
    assert got[2][1] < got[3][1]


def test_corpus_report_empty_corpus_zeros(spark):
    """An empty corpus reports zeros, not nulls — release gates compare
    n_docs == 0 and must not meet NaN propagation."""
    from prefixtree_spark.operators import text as T

    docs = spark.createDataFrame([], "doc_id long, text string")
    got = {r.metric: r.value for r in
           T.corpus_report(docs, "doc_id", "text").collect()}
    assert got["n_docs"] == 0.0
    assert got["total_tokens"] == 0.0
    assert got["avg_tokens"] == 0.0
    assert got["avg_quality"] == 0.0
    assert got["n_low_quality"] == 0.0
    assert not any(k.startswith("quality_bucket_") for k in got)


def test_corpus_report_published_incremental(spark, tmp_path):
    """Incremental card over an append-log table: equals the full
    recompute, reuses stored partials (old ones untouched after an
    append), and survives compaction (new vdirs -> fresh partials)."""
    import os

    from prefixtree_spark.operators import text as T
    from prefixtree_spark.sources import io as pio

    root = str(tmp_path / "docs_pub")

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, f"the doc number {i} is here") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    pio.publish_version(batch(0, 50), root)
    pio.append_published(batch(50, 80), root)

    def card(df_or_pub):
        return {r.metric: r.value for r in df_or_pub.collect()}

    got = card(T.corpus_report_published(spark, root, "text"))
    full = card(T.corpus_report(pio.read_published(spark, root), "doc_id", "text"))
    assert got == full and got["n_docs"] == 80.0

    cache = str(tmp_path / "docs_pub_card")
    lq_dir = os.path.join(cache, os.listdir(cache)[0])
    before = {d: os.path.getmtime(os.path.join(lq_dir, d))
              for d in os.listdir(lq_dir)}
    assert len(before) == 2  # one partial per segment

    pio.append_published(batch(80, 95), root)
    got2 = card(T.corpus_report_published(spark, root, "text"))
    assert got2["n_docs"] == 95.0
    after = {d: os.path.getmtime(os.path.join(lq_dir, d))
             for d in os.listdir(lq_dir)}
    assert len(after) == 3
    for d, m in before.items():
        assert after[d] == m  # stored partials untouched

    # compaction mints a new segment dir -> new partial, same answers
    pio.compact_published(spark, root)
    got3 = card(T.corpus_report_published(spark, root, "text"))
    assert got3 == got2


def test_text_stats_and_oov_rate_null_and_empty_text(spark):
    """NULL/empty text: text_stats reports zeros (not -1/NULL), and
    oov_rate emits a (0, 0, 0.0) row instead of dropping the doc."""
    from prefixtree_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    stats = {r.doc_id: (r.n_chars, r.n_tokens, r.n_stopwords)
             for r in T.text_stats(docs, "doc_id", "text").collect()}
    assert stats[2] == (0, 0, 0)
    assert stats[3] == (3, 0, 0)
    oov = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in T.oov_rate(docs, "doc_id", "text").collect()}
    assert set(oov) == {1, 2, 3}
    assert oov[2] == (0, 0, 0.0) and oov[3] == (0, 0, 0.0)


def test_quality_and_corpus_report_null_text(spark):
    """NULL text scores like empty text (0.0 quality, 0 tokens): the
    r5 ADVICE finding — size(NULL)=-1 must not corrupt total_tokens,
    and least/greatest NULL-skipping must not give NULL docs 0.35."""
    from prefixtree_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r.quality
         for r in T.quality_score(docs, "doc_id", "text").collect()}
    assert q[2] == q[3] == 0.0
    card = {r.metric: r.value
            for r in T.corpus_report(docs, "doc_id", "text").collect()}
    assert card["n_docs"] == 3.0
    assert card["total_tokens"] == 3.0  # NULL and empty contribute 0, not -1


def test_vacuum_card_cache_deletes_only_orphans(spark, tmp_path):
    """compaction + vacuum + vacuum_card_cache leaves only partials for
    segments some kept snapshot still references; the refreshed card
    still equals the full recompute (round-5 verdict #4)."""
    import os

    from prefixtree_spark.operators import text as T
    from prefixtree_spark.sources import io as pio

    root = str(tmp_path / "docs_vac")

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, f"the doc number {i} is here") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    pio.publish_version(batch(0, 40), root)
    pio.append_published(batch(40, 60), root)
    pio.append_published(batch(60, 70), root)
    T.corpus_report_published(spark, root, "text").collect()
    cache = str(tmp_path / "docs_vac_card")
    lq_dir = os.path.join(cache, os.listdir(cache)[0])
    assert len(os.listdir(lq_dir)) == 3  # one partial per segment
    # a stale crashed-writer temp dir, old enough to clear
    stale_tmp = os.path.join(lq_dir, ".tmp-crashed-deadbeef")
    os.makedirs(stale_tmp)
    old = 1_000_000_000
    os.utime(stale_tmp, (old, old))

    # compaction folds the chain into one new vdir; vacuum keeps only
    # the latest snapshot, so the three old segments become orphans
    pio.compact_published(spark, root)
    pio.vacuum_published(spark, root, keep=1)
    # refresh first so the new segment's partial exists
    got = {r.metric: r.value
           for r in T.corpus_report_published(spark, root, "text").collect()}
    deleted = T.vacuum_card_cache(spark, root)
    assert deleted == 4  # 3 orphaned partials + 1 stale tmp
    live = [d for d in os.listdir(lq_dir)]
    assert len(live) == 1 and not live[0].startswith(".tmp-")
    # a FRESH tmp (concurrent refresher) survives the grace window
    fresh_tmp = os.path.join(lq_dir, ".tmp-live-cafebabe")
    os.makedirs(fresh_tmp)
    assert T.vacuum_card_cache(spark, root) == 0
    assert os.path.isdir(fresh_tmp)
    os.rmdir(fresh_tmp)
    # the card over the vacuumed cache still equals the full recompute
    full = {r.metric: r.value
            for r in T.corpus_report(
                pio.read_published(spark, root), "doc_id", "text").collect()}
    got2 = {r.metric: r.value
            for r in T.corpus_report_published(spark, root, "text").collect()}
    assert got == got2 == full and got["n_docs"] == 70.0


def test_corpus_report_published_after_cow_delete(spark, tmp_path):
    """COW delete composes with the incremental card: the rewritten
    segment gets a fresh partial, the UNTOUCHED segment's stored
    partial is reused byte-identically (same mtime), and the refreshed
    card equals a full recompute of the post-delete table."""
    import os

    from prefixtree_spark.operators import text as T
    from prefixtree_spark.sources import io as pio

    root = str(tmp_path / "docs_cow_card")

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, f"the doc number {i} is here") for i in range(lo, hi)],
            "doc_id long, text string",
        )

    pio.publish_version(batch(0, 40), root)
    pio.append_published(batch(40, 70), root)

    def card(df):
        return {r.metric: r.value for r in df.collect()}

    assert card(T.corpus_report_published(spark, root, "text"))["n_docs"] == 70.0
    cache = str(tmp_path / "docs_cow_card_card")
    lq_dir = os.path.join(cache, os.listdir(cache)[0])
    untouched_vdir = pio.published_segments(spark, root)[0][0]
    mtime_before = os.path.getmtime(os.path.join(lq_dir, untouched_vdir))

    res = pio.delete_published(spark, root, "doc_id >= 60")
    assert res["rewritten_segments"] == 1 and res["kept_segments"] == 1
    got = card(T.corpus_report_published(spark, root, "text"))
    full = card(
        T.corpus_report(pio.read_published(spark, root), "doc_id", "text")
    )
    assert got == full and got["n_docs"] == 60.0
    assert (
        os.path.getmtime(os.path.join(lq_dir, untouched_vdir)) == mtime_before
    ), "untouched segment's partial must be reused, not recomputed"
