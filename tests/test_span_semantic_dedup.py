"""Round-5 operators: exact-substring (span) dedup, C4-style line
dedup, SemDeDup semantic dedup, and temperature mixture resampling —
each verified against a hand-computed or brute-force twin."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators import ann, dedup
from prefixtree_spark.operators.sampling import mixture_resample

SF_ORACLE = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------


def _brute_spans(rows, width):
    wins = []  # (doc, start, tuple-of-tokens)
    toks = {d: t.split() for d, t in rows}
    for d, ts in toks.items():
        for i in range(len(ts) - width + 1):
            wins.append((d, i + 1, tuple(ts[i : i + width])))
    from collections import Counter

    occ = Counter(w for _, _, w in wins)
    dup = {w for w, c in occ.items() if c >= 2}
    out = {}
    for d, ts in toks.items():
        dw = [(i, w) for (dd, i, w) in wins if dd == d and w in dup]
        covered = set()
        for i, _ in dw:
            covered.update(range(i, i + width))
        n_win = sum(1 for (dd, _, _) in wins if dd == d)
        total = len(ts)
        out[d] = (
            total,
            n_win,
            len(dw),
            len(covered),
            round(len(covered) / total, 6) if total else 0.0,
        )
    return out


def test_duplicate_spans_hand_case(spark):
    # doc 1 and 2 share a 4-token span; doc 3 repeats one internally;
    # doc 4 is all-unique; doc 5 is shorter than the window
    rows = [
        (1, "a b c d e f"),
        (2, "x a b c d y"),
        (3, "p q r s p q r s"),
        (4, "one two three four five"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["covered_tokens"],
            r["dup_cover_frac"],
        )
        for r in dedup.duplicate_spans(df, "doc_id", "text", width=4).collect()
    }
    want = _brute_spans(rows, 4)
    # short doc contributes zero windows but still appears
    assert want[5] == (2, 0, 0, 0, 0.0)
    assert got == want
    # the shared span covers tokens 1-4 in doc1 (a b c d)
    assert got[1][3] == 4
    # intra-doc repetition counts: doc3's "p q r s" occurs twice
    assert got[3][2] == 2 and got[3][3] == 8


def test_duplicate_spans_matches_bruteforce_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(60)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["covered_tokens"],
            r["dup_cover_frac"],
        )
        for r in dedup.duplicate_spans(docs, "doc_id", "text", width=6).collect()
    }
    assert got == _brute_spans(rows, 6)


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def test_line_dedup_hand_case(spark):
    rows = [
        (1, "keep me\nshared line\nunique one"),
        (2, "shared line\nother text"),
        (3, "solo doc\n\n  \nrepeated inside\nrepeated inside"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.line_dedup(df, "doc_id", "text").collect()}
    # "shared line" spans docs 1+2 -> removed from both
    assert got[1]["n_lines"] == 3 and got[1]["n_dup_lines"] == 1
    assert got[1]["text_clean"] == "keep me\nunique one"
    assert got[2]["text_clean"] == "other text"
    # intra-doc repetition is NOT cross-document -> kept; blanks dropped
    assert got[3]["n_lines"] == 3 and got[3]["n_dup_lines"] == 0
    assert got[3]["text_clean"] == "solo doc\nrepeated inside\nrepeated inside"


def test_line_dedup_order_preserved(spark):
    text1 = "\n".join(f"line {i}" for i in range(20)) + "\ncommon"
    text2 = "common\nonly two"
    df = spark.createDataFrame(
        [(1, text1), (2, text2)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dedup.line_dedup(df, "doc_id", "text").collect()}
    assert got[1]["text_clean"] == "\n".join(f"line {i}" for i in range(20))


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def _cos(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_semantic_dedup_dominance_rule(spark):
    # cluster 0: v2 ~ v1 (dropped), v3 ~ v2 but NOT ~ v1 — the
    # published rule drops v3 too (any lower-id neighbor, kept or not)
    v1 = [1.0, 0.0, 0.0]
    v2 = [0.96, 0.28, 0.0]
    v3 = [0.80, 0.60, 0.0]
    v9 = [0.0, 0.0, 1.0]  # cluster 1: alone, survives
    assert _cos(v1, v2) > 0.9 > _cos(v1, v3) and _cos(v2, v3) > 0.9
    df = spark.createDataFrame(
        [(1, 0, v1), (2, 0, v2), (3, 0, v3), (9, 1, v9)],
        "vid long, cl int, v array<double>",
    )
    out = ann.semantic_dedup(df, "vid", "v", "cl", threshold=0.9)
    assert sorted(r["vid"] for r in out.collect()) == [1, 9]


def test_semantic_dedup_cluster_boundary_blocks_compare(spark):
    # identical vectors in DIFFERENT clusters both survive
    v = [1.0, 0.0]
    df = spark.createDataFrame(
        [(1, 0, v), (2, 1, v)], "vid long, cl int, v array<double>"
    )
    out = ann.semantic_dedup(df, "vid", "v", "cl", threshold=0.5)
    assert out.count() == 2


def test_semantic_dedup_max_cluster_guard(spark):
    df = spark.createDataFrame(
        [(i, 0, [1.0, float(i)]) for i in range(5)],
        "vid long, cl int, v array<double>",
    )
    with pytest.raises(ValueError, match="max_cluster"):
        ann.semantic_dedup(df, "vid", "v", "cl", threshold=0.9, max_cluster=3)
    # under the cap it runs
    assert (
        ann.semantic_dedup(
            df, "vid", "v", "cl", threshold=1.1, max_cluster=5
        ).count()
        == 5
    )


def test_semantic_dedup_matches_bruteforce_on_fixture(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(200)
    rows = [(r["vec_id"], r["label"], list(r["embedding"])) for r in emb.collect()]
    dropped = set()
    for i, (bi, bl, bv) in enumerate(rows):
        for aj, al, av in rows:
            if al == bl and aj < bi and _cos(av, bv) >= 0.25:
                dropped.add(bi)
                break
    got = sorted(
        r["vec_id"]
        for r in ann.semantic_dedup(
            emb, "vec_id", "embedding", "label", threshold=0.25
        ).collect()
    )
    assert got == sorted(i for (i, _, _) in rows if i not in dropped)


def test_semantic_dedup_kmeans_deterministic_and_sane(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    a = ann.semantic_dedup_kmeans(
        emb, "vec_id", "embedding", k=10, threshold=0.3, seed=42
    )
    b = ann.semantic_dedup_kmeans(
        emb, "vec_id", "embedding", k=10, threshold=0.3, seed=42
    )
    sa = sorted(r["vec_id"] for r in a.collect())
    assert sa == sorted(r["vec_id"] for r in b.collect())
    assert set(a.columns) == {"vec_id", "cluster"}
    n = emb.count()
    # sane survivor band: dedup happened, but most of the corpus stays
    assert 0.4 * n < len(sa) < n


# ---------------------------------------------------------------------------
# mixture_resample
# ---------------------------------------------------------------------------


def _bucket(doc_id, seed):
    h = hashlib.md5(f"{doc_id}{seed}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def _expected_mixture(rows, target_frac, alpha, seed):
    masses = {}
    for did, src, m in rows:
        masses[src] = masses.get(src, 0) + m
    if alpha == 0.5:
        sg = {g: math.isqrt(m) for g, m in masses.items()}
    elif alpha == 0.0:
        sg = {g: 1 for g in masses}
    else:
        sg = dict(masses)
    S, M = sum(sg.values()), sum(masses.values())
    T = (int(round(target_frac * 1_000_000)) * M) // 1_000_000
    rate = {
        g: min(1_000_000, (1_000_000 * T * sg[g]) // (S * masses[g]))
        for g in masses
    }
    return {did for did, src, _ in rows if _bucket(did, seed) < rate[src]}


def test_mixture_resample_exact_set(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rows = [
        (r["doc_id"], r["source"], len(r["text"])) for r in docs.collect()
    ]
    docs = docs.withColumn("mass", F.length("text").cast("long"))
    got = {
        r["doc_id"]
        for r in mixture_resample(
            docs, "doc_id", "source",
            target_frac=0.5, alpha=0.5, weight_col="mass", seed="t5",
        ).collect()
    }
    assert got == _expected_mixture(rows, 0.5, 0.5, "t5")


def test_mixture_resample_alpha_one_is_flat_rate(spark):
    # α=1 keeps every group at the global target rate: rates equal
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rows = [(r["doc_id"], r["source"], 1) for r in docs.collect()]
    got = {
        r["doc_id"]
        for r in mixture_resample(
            docs, "doc_id", "source", target_frac=0.3, alpha=1.0, seed="u"
        ).collect()
    }
    assert got == _expected_mixture(rows, 0.3, 1.0, "u")
    # and the realized rate is near 30%
    assert 0.2 < len(got) / len(rows) < 0.4


def test_mixture_resample_alpha_zero_equalizes_mass(spark):
    # two sources with 9:1 mass; α=0 targets EQUAL kept mass, so the
    # small source keeps everything (capped) and the big one is cut
    rows = [(i, "big", 9) for i in range(900)] + [
        (i, "small", 9) for i in range(900, 1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, mass long")
    out = mixture_resample(
        df, "doc_id", "source",
        target_frac=0.5, alpha=0.0, weight_col="mass", seed="z",
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            F.count("doc_id").alias("n")
        ).collect()
    }
    assert by_src["small"] == 100  # rate capped at 1.0
    # big source targets 2500/9 ≈ 278 docs of 900 (rate ~0.309)
    assert 200 < by_src["big"] < 360


def test_mixture_resample_validates_and_handles_empty(spark):
    df = spark.createDataFrame([], "doc_id long, source string")
    assert (
        mixture_resample(df, "doc_id", "source", target_frac=0.5).count() == 0
    )
    with pytest.raises(ValueError, match="target_frac"):
        mixture_resample(df, "doc_id", "source", target_frac=1.5)


# ---------------------------------------------------------------------------
# remove_duplicate_spans
# ---------------------------------------------------------------------------


def _brute_removed(rows, width):
    toks = {d: t.split() for d, t in rows}
    occs = {}  # window -> [(doc, start1based)]
    for d, ts in sorted(toks.items()):
        for i in range(len(ts) - width + 1):
            occs.setdefault(tuple(ts[i : i + width]), []).append((d, i + 1))
    removed = {d: set() for d in toks}
    for w, lst in occs.items():
        if len(lst) >= 2:
            for d, i in sorted(lst)[1:]:  # keep first, cut the rest
                removed[d].update(range(i, i + width))
    out = {}
    for d, ts in toks.items():
        kept = [t for j, t in enumerate(ts, 1) if j not in removed[d]]
        out[d] = (len(ts), len(removed[d]), " ".join(kept))
    return out


def test_remove_duplicate_spans_hand_case(spark):
    rows = [
        (1, "a b c d tail one"),
        (2, "head a b c d tail"),
        (3, "a b c d a b c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_tokens"], r["removed_tokens"], r["text_clean"])
        for r in dedup.remove_duplicate_spans(
            df, "doc_id", "text", width=4
        ).collect()
    }
    assert got == _brute_removed(rows, 4)
    # doc 1 holds the first occurrence of "a b c d" -> fully intact
    assert got[1] == (6, 0, "a b c d tail one")
    # doc 2 loses both shared windows: "a b c d" (pos 2-5) and
    # "b c d tail" (pos 3-6, ALSO first-seen in doc 1) -> only "head"
    assert got[2][2] == "head"
    # doc 1 owns the corpus-first "a b c d", so BOTH of doc 3's
    # copies (pos 1-4 and 5-8) are later occurrences - the whole doc
    # is cut even though, in isolation, its first copy would survive
    assert got[3][2] == ""


def test_remove_duplicate_spans_matches_bruteforce_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(80)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        r["doc_id"]: (r["total_tokens"], r["removed_tokens"], r["text_clean"])
        for r in dedup.remove_duplicate_spans(
            docs, "doc_id", "text", width=6
        ).collect()
    }
    assert got == _brute_removed(rows, 6)


def test_remove_then_detect_is_clean(spark):
    # after keep-first removal, re-detection finds no duplicated
    # windows that were introduced by the removal stitching... the
    # FIRST copies survive, so re-running detection on cleaned text
    # must show every duplicated window now occurring at most once
    # corpus-wide (stitched-together boundaries can create new
    # windows, but none of the ORIGINAL duplicated ones remain twice)
    rows = [
        (1, "x y z q r s t u"),
        (2, "p p p x y z q r s t u w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = dedup.remove_duplicate_spans(df, "doc_id", "text", width=8)
    re_detect = dedup.duplicate_spans(
        cleaned, "doc_id", "text_clean", width=8
    )
    assert all(
        r["n_dup_windows"] == 0 for r in re_detect.collect()
    )


def test_span_family_randomized_vs_brute(spark):
    # FIXTURES.md F5 style: tiny alphabets force heavy window
    # collisions (intra- and cross-document); one corpus unions all
    # seeds so a single Spark round checks many regimes at once
    import random

    rows = []
    did = 0
    for seed in range(8):
        rng = random.Random(seed)
        alpha = rng.choice([["a", "b"], ["a", "b", "c"], ["x", "y", "z", "w"]])
        for _ in range(rng.randint(2, 10)):
            n = rng.randint(0, 30)
            rows.append((did, " ".join(rng.choices(alpha, k=n))))
            did += 1
    width = 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    det = {
        r["doc_id"]: (
            r["total_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["covered_tokens"],
            r["dup_cover_frac"],
        )
        for r in dedup.duplicate_spans(df, "doc_id", "text", width=width).collect()
    }
    assert det == _brute_spans(rows, width)
    rem = {
        r["doc_id"]: (r["total_tokens"], r["removed_tokens"], r["text_clean"])
        for r in dedup.remove_duplicate_spans(
            df, "doc_id", "text", width=width
        ).collect()
    }
    assert rem == _brute_removed(rows, width)


def test_span_windows_whitespace_and_null_robust(spark):
    """Trailing newlines/tabs and null text must not mint phantom
    tokens or windows: 'a b c\n' has exactly 3 tokens and, at width 3,
    one window identical to the clean twin's — so the pair dedups."""
    from prefixtree_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c\n"),
            (3, "\t x\ty z \n"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    prof = {r.doc_id: (r.total_tokens, r.n_windows, r.n_dup_windows)
            for r in dd.duplicate_spans(df, "doc_id", "text", width=3).collect()}
    assert prof[1] == (3, 1, 1)
    assert prof[2] == (3, 1, 1)  # trailing \n: same tokens, same window
    assert prof[3] == (3, 1, 0)  # x y z unique
    assert prof[4] == (0, 0, 0)
    assert prof[5] == (0, 0, 0)


def test_duplicate_spans_random_whitespace_adversarial(spark):
    """Randomized corpora whose texts carry tabs, newlines, runs of
    spaces, and leading/trailing whitespace: the engine must agree with
    the Python str.split() brute twin (which drops empties) on every
    document — the regression class behind the round-5 tokenization
    fix."""
    import random

    from prefixtree_spark.operators import dedup as dd

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]
    seps = [" ", "  ", "\t", "\n", " \t ", "\n\n"]
    for trial in range(3):
        rows = []
        for d in range(14):
            n_tok = rng.randint(0, 12)
            toks = [rng.choice(vocab) for _ in range(n_tok)]
            body = "".join(
                t + rng.choice(seps) for t in toks
            )
            text = rng.choice(["", " ", "\n", "\t"]) + body
            rows.append((d, text))
        width = rng.choice([2, 3])
        got = {
            r.doc_id: (r.total_tokens, r.n_windows, r.n_dup_windows,
                       r.covered_tokens)
            for r in dd.duplicate_spans(
                spark.createDataFrame(rows, "doc_id long, text string"),
                "doc_id", "text", width=width,
            ).collect()
        }
        want = {d: v[:4] for d, v in _brute_spans(rows, width).items()}
        assert got == want, f"trial {trial} width {width}"
