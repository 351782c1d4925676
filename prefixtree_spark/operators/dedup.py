"""Deduplication operators for large-scale training-data pipelines.

All exact/near-dup strategies a 100 TB text corpus needs, each
expressed shuffle-consciously:

  - ``exact_dedup`` — hash-groupBy on the key columns; one shuffle,
    map-side partial aggregation for the counts.
  - ``ngram_jaccard_pairs`` — EXACT token-n-gram Jaccard similarity
    join via a shingle-inverted-index equi-join (shuffle on shingle,
    then on pair) — no cross join anywhere. This is also the verifier
    and oracle for the approximate paths.
  - ``minhash_lsh_pairs`` — MinHash signatures (one JVM ``xxhash64``
    per shingle, then all permutations at once via vectorized
    multiply-shift hashing — the shuffle never sees the
    shingle x permutation blow-up) banded into LSH buckets; candidate
    pairs from bucket equi-joins; exact-Jaccard verification of
    candidates only. At the default 32 bands x 2 rows,
    a pair at the 0.8 threshold is missed with prob (1-0.64)^32 ≈ 1e-14,
    so the verified output equals the exact join w.h.p. while scaling
    as the candidate count, not the pair count.
  - ``simhash_signatures`` / ``simhash_pairs`` — 60-bit
    frequency-weighted SimHash over tokens (60 bits so the signature
    survives a signed BIGINT in every engine); near-dup pairs by
    Hamming distance with a 4-band pigeonhole prefilter (hamming ≤ 3
    ⇒ at least one of 4 15-bit bands is identical) so the join is
    equi on band value, never all-pairs.

Token hashing is md5-based (first 15 hex digits → 60-bit int) wherever
an oracle needs to reproduce it in SQL; xxhash64 (faster, JVM) where it
doesn't (MinHash permutations are Spark-internal — correctness is
enforced by the exact-Jaccard verify step).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Plan-audit escape hatch (tools/dump_plans.py): pinning replaces the
# result plan with its checkpoint scan, which would hide the operator's
# real physical plan from explain(); everything else should leave this
# True — it is the cache-lifecycle guarantee.
PIN_RESULTS = True


def _pin_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Materialize the (pair-set-sized) result and free the
    corpus-sized cached intermediates that produced it.

    Every near-dup operator caches a shingle/token/signature table that
    is consumed by several branches of one plan; those caches scale
    with the CORPUS, so leaving them persisted leaks executor memory
    across a long multi-query pipeline (round-2 verdict #4). Pinning
    the result (localCheckpoint) makes it self-contained, after which
    the intermediates are unpersisted immediately. The returned
    DataFrame owns only its own checkpoint storage — proportional to
    the OUTPUT (near-dup pairs), not the corpus."""
    if not PIN_RESULTS:
        return result
    out = result.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist()
    return out


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One row per distinct key: the minimum ``id_col`` (the survivor)
    and the duplicate count. Single hash-aggregate shuffle."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def keep_best(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    id_col: str,
    *,
    descending: bool = True,
) -> DataFrame:
    """One surviving ROW per duplicate group, chosen by score instead of
    arrival order: rank within each key by (score desc, id asc) and keep
    rank 1. ``exact_dedup`` keeps min-id — the right default for
    idempotent re-runs — but a training corpus wants the HIGHEST-QUALITY
    copy of each duplicated text, not the first-crawled one. Single
    window over the group key (one shuffle, same cost shape as the
    hash-agg); ties break on ``id_col`` so the survivor is
    deterministic across partitionings."""
    order = [
        F.desc(score_col) if descending else F.asc(score_col),
        F.asc(id_col),
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # probe for a free working name: a caller column literally named
    # '_rn' must survive (same pattern as relational._free_name)
    rn = "_rn"
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) == 1)
        .drop(rn)
    )


# ---------------------------------------------------------------------------
# token shingles (shared by Jaccard / MinHash)
# ---------------------------------------------------------------------------


def _tokens(text_col: str) -> Column:
    """Non-space token runs (``\\S+``), not trim+split: Spark's trim
    strips only SPACES, so trim+split kept phantom empty tokens around
    tabs/newlines — and two docs identical modulo a trailing "\\n"
    then FAILED the Jaccard threshold (the empty token mints an extra
    shingle on one side). Same fix as ``_span_windows``; the oracles
    tokenize with the equivalent ``regexp_extract_all('\\S+')``."""
    return F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)


def token_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs where shingle = n consecutive
    whitespace tokens joined by one space."""
    toks = df.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("ts"))
    # NB: filter BEFORE sequence() — Spark's sequence(1, 0) counts DOWN
    # and would emit invalid indices for docs shorter than n tokens
    return (
        toks.where(F.size("ts") >= n)
        .select(
            "doc",
            F.explode(F.sequence(F.lit(1), F.size("ts") - (n - 1))).alias("i"),
            "ts",
        )
        .select("doc", F.concat_ws(" ", F.slice("ts", F.col("i"), n)).alias("shingle"))
        .distinct()
    )


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Distinct (id, shingle) pairs over character n-grams — the
    tokenization-free variant (robust to languages without whitespace
    and to formatting noise)."""
    base = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))
    return (
        base.where(F.length("t") >= n)
        .select(
            "doc",
            F.explode(F.sequence(F.lit(1), F.length("t") - (n - 1))).alias("i"),
            "t",
        )
        .select("doc", F.expr(f"substring(t, i, {n})").alias("shingle"))
        .distinct()
    )


def _apply_max_df(sh: DataFrame, max_df: int | None) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    The inverted-index self-join emits df² pair rows per shingle, so a
    boilerplate n-gram shared by m documents alone costs m² rows —
    quadratic blow-up on low-entropy corpora. Capping df bounds the
    join at max_df² rows per shingle (standard 100 TB practice);
    ubiquitous shingles carry ~zero similarity signal anyway. Jaccard
    is then computed over the filtered shingle space (dropped from
    both intersections AND set sizes, so the measure stays a true
    Jaccard on the reduced universe)."""
    if max_df is None:
        return sh
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
    )
    return sh.join(hot, "shingle", "left_anti")


def _jaccard_from_shingles(
    sh: DataFrame,
    threshold: float,
    *,
    candidates: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """id1<id2 pairs with Jaccard ≥ threshold over (doc, shingle) sets —
    the shared inverted-index core of every exact path. With
    ``candidates`` (id1, id2), intersections are computed only for
    those pairs (the LSH verify stage). ``max_df`` (off by default)
    drops ubiquitous shingles first — see ``_apply_max_df``."""
    sh = _apply_max_df(sh, max_df)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    if candidates is None:
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .groupBy(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
            .agg(F.count(F.lit(1)).alias("ic"))
        )
    else:
        inter = (
            candidates.join(a, F.col("id1") == F.col("a.doc"))
            .join(
                b,
                (F.col("id2") == F.col("b.doc"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("ic"))
        )
    sa = sizes.select(F.col("doc").alias("id1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc").alias("id2"), F.col("sz").alias("sz2"))
    jac = F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic"))
    # no broadcast hint: the size tables have one row per DOCUMENT, so
    # at corpus scale they exceed executor memory — let AQE pick
    # broadcast vs shuffle join from runtime statistics
    return (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .where(jac >= threshold)
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Term-frequency-weighted Jaccard over token multisets:
    J_w = Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b). More
    repetition-sensitive than set Jaccard (boilerplate-heavy docs score
    higher). Same inverted-index shape: join on token, aggregate
    Σmin; Σmax = tot_a + tot_b − Σmin.

    ``max_df`` drops tokens appearing in more than ``max_df`` documents
    BEFORE both the intersection join and the per-doc totals — the same
    filtered-universe semantics as ``_apply_max_df`` for the shingle
    paths: the measure stays a true weighted Jaccard on the reduced
    token universe, and the token-level inverted-index join is bounded
    at max_df² pair rows per token (otherwise a boilerplate token
    shared by m docs alone emits m² rows)."""
    toks = (
        df.select(F.col(id_col).alias("doc"), F.explode(_tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        hot = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("tok")
        )
        toks = toks.join(hot, "tok", "left_anti")
    toks = toks.cache()
    totals = toks.groupBy("doc").agg(F.sum("tf").alias("tot"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .agg(F.sum(F.least(F.col("a.tf"), F.col("b.tf"))).alias("smin"))
    )
    ta = totals.select(F.col("doc").alias("id1"), F.col("tot").alias("tot1"))
    tb = totals.select(F.col("doc").alias("id2"), F.col("tot").alias("tot2"))
    jac = F.col("smin") / (F.col("tot1") + F.col("tot2") - F.col("smin"))
    # per-doc totals scale with the corpus — no broadcast hint, AQE
    # decides from runtime sizes
    return _pin_release(
        inter.join(ta, "id1")
        .join(tb, "id2")
        .where(jac >= threshold)
        .select("id1", "id2", F.round(jac, 6).alias("w_jaccard")),
        toks,
    )


def char_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over character n-gram sets.

    NB: exact inverted-index joins are quadratic in per-shingle
    document frequency — low-entropy corpora (every doc shares common
    n-grams) blow up the intersection join. Pass ``max_df`` to drop
    ubiquitous n-grams first (bounds the join; see ``_apply_max_df``),
    or use ``minhash_lsh_pairs`` (candidates ∝ truly-similar pairs) as
    the scale path."""
    return _jaccard_from_shingles(
        char_shingles(df, id_col, text_col, n), threshold, max_df=max_df
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 13,
) -> DataFrame:
    """Remove from ``train`` every document sharing at least one
    ``n``-token shingle with ``test`` — benchmark decontamination, the
    step a pretraining pipeline runs so evaluation data never leaks
    into the training set (13-gram collision is the standard bar; the
    fixture workload uses a smaller n to fit short documents).

    Plan shape: test's distinct shingles (small side — the eval set)
    semi-join against train's shingles on the shingle key, then one
    anti-join removes contaminated ids. Both joins are equi;
    train-side text never moves — only its (doc, shingle) projection
    shuffles once."""
    tr = token_shingles(train, id_col, text_col, n)
    te = token_shingles(test, id_col, text_col, n).select("shingle").distinct()
    contaminated = (
        tr.join(te, "shingle", "left_semi")
        .select(F.col("doc").alias(id_col))
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 13,
) -> DataFrame:
    """The audit companion to ``decontaminate``: instead of silently
    dropping contaminated training docs, report HOW contaminated each
    one is — (id, n_shingles, n_hit, frac) for every train doc sharing
    ≥1 distinct ``n``-token shingle with the eval set. Release reviews
    want this severity split (a doc quoting one benchmark sentence vs
    a verbatim test-set copy are different incidents) before deciding
    what the removal bar is.

    Same plan shape as ``decontaminate`` — eval-side distinct shingles
    semi-join the train shingles — plus one count-aggregate per side of
    the hit: train text never moves, and the output is bounded by the
    contaminated set, not the corpus."""
    tr = token_shingles(train, id_col, text_col, n)
    te = token_shingles(test, id_col, text_col, n).select("shingle").distinct()
    totals = tr.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        tr.join(te, "shingle", "left_semi")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(totals, "doc")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("frac"),
        )
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n: int = 3,
    max_iter: int = 20,
    max_df: int | None = None,
) -> DataFrame:
    """End-to-end near-dup removal: MinHash-LSH candidate pairs →
    connected components (min-id label propagation) → keep only each
    cluster's minimum id. Returns the survivors of ``df`` (same
    schema). The composition a training-data pipeline actually runs.
    ``max_df`` passes through to the LSH verify join's hot-shingle cap
    (see ``minhash_lsh_pairs``)."""
    from prefixtree_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n=n, threshold=threshold, max_df=max_df
    )
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    labels = connected_components(nodes, edges, max_iter=max_iter)
    victims = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similarity self-join on token n-gram shingle sets.

    Returns DataFrame[id1, id2, jaccard] with id1 < id2 and jaccard ≥
    ``threshold`` (rounded to 6 dp). Inverted-index plan: shuffle on
    shingle to count intersections, join the per-doc set sizes back in
    — pair count is bounded by co-occurring shingles, never |docs|².
    ``max_df`` (optional) bounds the per-shingle fan-out on
    boilerplate-heavy corpora; see ``_apply_max_df``."""
    sh = token_shingles(df, id_col, text_col, n).cache()
    return _pin_release(
        _jaccard_from_shingles(sh, threshold, max_df=max_df), sh
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _grouped_shingle_hashes(sh: DataFrame) -> DataFrame:
    """(doc, hs: array<long>) — each doc's distinct shingle set as
    xxhash64 fingerprints, grouped once (map-side partial collect_list;
    the shuffle carries each base hash exactly once).

    This is the shared input of BOTH MinHash stages (r13 fusion): the
    signature UDF consumes it directly, and the LSH verify computes
    exact intersections over the same fingerprint arrays
    (``_jaccard_from_grouped``) instead of re-joining the exploded
    shingle rows per candidate pair.  The signatures have always
    reduced shingles to this 64-bit space before the permutations, so
    verifying on it adds no new collision assumption — a cross-doc
    xxhash64 collision perturbing one pair's intersection has
    p ≈ n1·n2/2^64, far below the probability of an LSH band collision
    admitting (or a sketch miss dropping) the same pair."""
    return (
        sh.select("doc", F.xxhash64("shingle").alias("h"))
        .groupBy("doc")
        .agg(F.collect_list("h").alias("hs"))
    )


def _signatures_from_grouped(
    grouped: DataFrame, *, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(doc, sig) from pre-grouped fingerprint arrays — the UDF half of
    ``minhash_signatures`` for callers that hold (and reuse) the
    grouped table."""
    rng = np.random.default_rng(seed)
    mults = (rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)

    @F.pandas_udf("array<long>")
    def sig_udf(hs: pd.Series) -> pd.Series:
        # one Arrow batch covers MANY docs (vs one applyInPandas group
        # per doc — per-group Python dispatch was the measured cost,
        # the same shape the SimHash de-explode removed); per doc, one
        # (n_shingles x num_perm) multiply-shift outer product + column
        # mins in numpy
        out = []
        with np.errstate(over="ignore"):
            for arr in hs:
                h = np.asarray(arr, dtype=np.uint64)
                m = (h[:, None] * mults[None, :]) >> np.uint64(3)
                out.append(m.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return grouped.select("doc", sig_udf("hs").alias("sig"))


def minhash_signatures(
    shingles: DataFrame, *, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(doc, sig: array<long>) — ``num_perm`` MinHash values per doc.

    One JVM xxhash64 per shingle (the base hash), then all permutations
    at once per Arrow batch with multiply-shift hashing
    (``(a_i * h) mod 2^64 >> 3`` for odd random ``a_i`` — a universal
    family, vectorized as one uint64 outer product in numpy). Compared
    to exploding shingles × permutations this moves ``num_perm×`` less
    data through the shuffle: the only wide stage is the per-doc
    grouping of base hashes."""
    return _signatures_from_grouped(
        _grouped_shingle_hashes(shingles), num_perm=num_perm, seed=seed
    )


def _jaccard_from_grouped(
    grouped: DataFrame, threshold: float, candidates: DataFrame
) -> DataFrame:
    """The LSH verify over pre-grouped fingerprint arrays: two joins of
    the (id1, id2) candidates against the per-doc arrays, intersection
    and set sizes computed per pair as JVM array expressions — no
    exploded candidates×shingles shuffle, no separate size groupBy
    (``size(hs)`` IS the exact distinct-shingle count).  Collision
    caveat in ``_grouped_shingle_hashes``; measured −20-30% on the
    dedup_minhash_lsh entry with identical rows
    (tools/probe_minhash_r13.py)."""
    h1 = grouped.select(F.col("doc").alias("id1"), F.col("hs").alias("hs1"))
    h2 = grouped.select(F.col("doc").alias("id2"), F.col("hs").alias("hs2"))
    sized = (
        candidates.join(h1, "id1")
        .join(h2, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("hs1", "hs2")).alias("ic"),
            F.size("hs1").alias("sz1"),
            F.size("hs2").alias("sz2"),
        )
    )
    jac = F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic"))
    return sized.where(jac >= threshold).select(
        "id1", "id2", F.round(jac, 6).alias("jaccard")
    )


def _band_buckets(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc, band, bucket) rows: bucket = hash of the band's signature
    slice — the LSH candidate key (equal band+bucket ⇒ candidate)."""
    return sig.select(
        "doc",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> slice(sig, b * {rows} + 1, {rows}))"
            )
        ).alias("band", "band_sig"),
    ).select(
        "doc",
        "band",
        F.xxhash64(
            F.concat_ws(",", F.expr("transform(band_sig, x -> cast(x as string))"))
        ).alias("bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 32,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs at Jaccard ≥ threshold via MinHash-LSH candidate
    generation + exact verification. Output schema/semantics identical
    to ``ngram_jaccard_pairs`` (w.h.p.; see module docstring).
    ``max_df`` filters ubiquitous shingles BEFORE both signatures and
    verification, so the whole pipeline operates on one consistent
    filtered shingle space (see ``_apply_max_df``)."""
    assert num_perm % bands == 0
    sh = _apply_max_df(token_shingles(df, id_col, text_col, n), max_df)
    return _lsh_pairs_from_shingles(
        sh, threshold=threshold, num_perm=num_perm, bands=bands
    )


def _lsh_pairs_from_shingles(
    sh: DataFrame,
    *,
    threshold: float,
    num_perm: int,
    bands: int,
) -> DataFrame:
    """The shingles-in core of ``minhash_lsh_pairs`` for callers that
    already hold (doc, shingle) rows.  ``sh`` is consumed exactly once
    (by the grouped-fingerprint build) — the r13 fusion pins the
    GROUPED table instead and feeds it to both the signature UDF and
    the hash-set verify, so callers no longer need to cache the
    exploded shingle rows."""
    grouped = _grouped_shingle_hashes(sh).cache()
    banded = _band_buckets(
        _signatures_from_grouped(grouped, num_perm=num_perm),
        bands,
        num_perm // bands,
    )
    x, y = banded.alias("x"), banded.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
        .distinct()
    )
    # exact verification of candidates only, over the same fingerprint
    # arrays the signatures were built from
    return _pin_release(
        _jaccard_from_grouped(grouped, threshold, candidates), grouped
    )


def incremental_lsh_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Bipartite near-dup detection: which NEW documents are near-dups
    of the EXISTING corpus? Returns (new_id, corpus_id, jaccard ≥
    threshold) — the incremental-ingest primitive ("drop crawl-snapshot
    docs already in the training set") that avoids re-running dedup
    over corpus × corpus.

    Scale shape: signatures and band buckets are computed per side and
    joined only ACROSS sides (delta × corpus candidates; never corpus²
    — at 100 TB the corpus-side signatures/buckets are computed once
    and persisted, so each snapshot pays |delta| signature work plus an
    equi-join on band buckets). Exact verification over the candidate
    pairs' shingles only; id spaces of the two sides may overlap
    (sides never mix — a pair is always one doc from each).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    g_new = _grouped_shingle_hashes(
        token_shingles(new_df, id_col, text_col, n)
    ).cache()
    g_cor = _grouped_shingle_hashes(
        token_shingles(corpus_df, id_col, text_col, n)
    ).cache()
    b_new = _band_buckets(
        _signatures_from_grouped(g_new, num_perm=num_perm), bands, rows
    )
    b_cor = _band_buckets(
        _signatures_from_grouped(g_cor, num_perm=num_perm), bands, rows
    )
    candidates = (
        b_new.select(F.col("doc").alias("new_id"), "band", "bucket")
        .join(
            b_cor.select(F.col("doc").alias("corpus_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    # bipartite verify over each side's grouped fingerprint arrays —
    # the same r13 fusion as ``_lsh_pairs_from_shingles`` (collision
    # caveat in ``_grouped_shingle_hashes``)
    h1 = g_new.select(F.col("doc").alias("new_id"), F.col("hs").alias("hs1"))
    h2 = g_cor.select(F.col("doc").alias("corpus_id"), F.col("hs").alias("hs2"))
    sized = (
        candidates.join(h1, "new_id")
        .join(h2, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.size(F.array_intersect("hs1", "hs2")).alias("ic"),
            F.size("hs1").alias("sz1"),
            F.size("hs2").alias("sz2"),
        )
    )
    jac = F.col("ic") / (F.col("sz1") + F.col("sz2") - F.col("ic"))
    out = sized.where(jac >= threshold).select(
        "new_id", "corpus_id", F.round(jac, 6).alias("jaccard")
    )
    return _pin_release(out, g_new, g_cor)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 60  # fits a signed 64-bit int in every engine


def _md5_60bit(col: Column) -> Column:
    """First 15 hex digits of md5 as a 60-bit int — reproducible in
    DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit frequency-weighted SimHash over whitespace tokens.

    bit b of the signature = 1 iff sum over token occurrences of
    (±1 depending on bit b of md5-60bit(token)) is > 0.

    Plan shape: the shuffle carries each token hash ONCE (a per-doc
    collect_list — map-side partial aggregation applies), then a
    vectorized Arrow-batched pandas UDF folds each doc's hash array
    into the 60-bit signature with one numpy bit-matrix per doc. The
    naive formulation (explode every token row into 60 (doc, bit)
    rows, then two groupBy shuffles) puts 60× the token volume through
    the shuffle — measured 1.6× slower even at sf0.1, and strictly
    worse at scale. Peak UDF memory is O(max_doc_tokens × 60) per row,
    never O(batch)."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(_tokens(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    hashed = toks.select("doc", _md5_60bit(F.col("tok")).alias("h"))
    grouped = hashed.groupBy("doc").agg(F.collect_list("h").alias("hs"))

    @F.pandas_udf("long")
    def sim_udf(hs: pd.Series) -> pd.Series:
        shifts = np.arange(_SIM_BITS, dtype=np.uint64)
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            h = np.asarray(arr, dtype=np.uint64)
            set_counts = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            # bit b set iff score_b = 2·set_count_b − n > 0
            bits = (2 * set_counts > len(h)).astype(np.uint64)
            out[i] = int((bits << shifts).sum())
        return pd.Series(out)

    return grouped.select(F.col("doc").alias("doc_id"), sim_udf("hs").alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Scale path: pigeonhole prefilter — split the 60 bits into
    ``max_hamming + 1`` bands; any pair within the distance budget
    must agree exactly on ≥ 1 band, so candidates come from band-value
    equi-joins instead of |docs|² comparisons."""
    sig = simhash_signatures(df, id_col, text_col).cache()
    n_bands = max_hamming + 1
    width = _SIM_BITS // n_bands
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}").alias("bandval"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bandval") == F.col("y.bandval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id1"),
            F.col("y.doc_id").alias("id2"),
            F.col("x.simhash").alias("h1"),
            F.col("y.simhash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return _pin_release(
        cand.where(ham <= max_hamming).select(
            "id1", "id2", ham.cast("int").alias("hamming")
        ),
        sig,
    )


# ---------------------------------------------------------------------------
# exact substring (span) dedup and cross-doc line dedup
# ---------------------------------------------------------------------------


def _span_windows(
    df: DataFrame, id_col: str, text_col: str, width: int
) -> tuple[DataFrame, DataFrame]:
    """(toks, wins) shared by the span-dedup family: ``toks`` is
    (doc_id, ts) with empty texts normalized to empty arrays; ``wins``
    is one row per sliding ``width``-token window occurrence —
    (doc_id, i, wh) with ``wh`` the window's md5 (16-byte shuffle keys
    instead of ~width-token strings; exact w.h.p.)."""
    # \S+ extraction, not trim+split: Spark's trim strips only SPACES,
    # so text ending in "\n" (ubiquitous in real corpora) would emit a
    # trailing empty token — inflating total_tokens, hashing phantom
    # windows, and diverging from the regexp_extract_all-based oracles.
    # Null text coalesces to the empty array (size(null) is -1).
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0),
            F.array().cast("array<string>"),
        ).alias("ts"),
    )
    wins = (
        toks.where(F.size("ts") >= width)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("ts") - (width - 1))
            ).alias("i"),
            "ts",
        )
        .select(
            "doc_id",
            "i",
            F.md5(F.concat_ws(" ", F.slice("ts", F.col("i"), width))).alias("wh"),
        )
    )
    return toks, wins


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, width: int = 8
) -> DataFrame:
    """Exact-substring duplication profile per document (the
    detection half of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499 — their ExactSubstr
    marks any ``width``-token span that occurs more than once in the
    corpus, including repeats inside one document):

      - ``total_tokens``  — whitespace tokens in the document;
      - ``n_windows``     — sliding ``width``-token windows;
      - ``n_dup_windows`` — windows whose token string occurs ≥2
        times corpus-wide;
      - ``covered_tokens``— distinct token positions lying inside at
        least one duplicated window (the tokens ExactSubstr would cut);
      - ``dup_cover_frac``— covered/total, rounded to 6 (0.0 for docs
        shorter than ``width`` tokens).

    Plan shape at 100 TB: windows never pairwise-join — duplication is
    a GROUP BY on the window key with a count ≥2 filter, then a
    semi-join of occurrences against that key set, so a span shared by
    a million documents costs m rows, not m² (contrast the Jaccard
    pair generators, which need ``max_df`` caps for exactly that
    reason). Windows are grouped by their 128-bit md5, so the two
    aggregation shuffles carry 16-byte keys instead of ~``width``-token
    strings; counts are exact w.h.p. (a corpus would need ~2^64
    windows before one expected collision). The coverage count
    re-explodes positions only for occurrences of duplicated windows —
    bounded by document length, not by corpus duplication. No UDFs;
    everything is sequence/slice/hash-agg inside codegen."""
    toks, wins = _span_windows(df, id_col, text_col, width)
    dup = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= 2)
        .select("wh")
    )
    dup_occ = wins.join(dup, "wh", "left_semi")
    n_dup = dup_occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    covered = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (width - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    # n_windows is a pure function of the token count — computing it
    # as max(0, total - width + 1) saves a whole-corpus aggregation
    # shuffle that an explicit wins.groupBy would pay
    base = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("total_tokens"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.size("ts") - (width - 1)).cast("long"),
        ).alias("n_windows"),
    )
    out = (
        base.join(n_dup, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
        )
    )
    frac = F.when(
        F.col("total_tokens") > 0,
        F.round(F.col("covered_tokens") / F.col("total_tokens"), 6),
    ).otherwise(F.lit(0.0))
    return out.withColumn("dup_cover_frac", frac)


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, width: int = 8
) -> DataFrame:
    """The removal half of ExactSubstr (Lee et al. 2021,
    arXiv:2107.06499): keep each duplicated ``width``-token span's
    FIRST occurrence (corpus order: lowest (doc_id, position)) and cut
    the tokens of every later occurrence. Returns one row per
    document:

      - ``total_tokens``   — whitespace tokens before removal;
      - ``removed_tokens`` — token positions covered by at least one
        non-first occurrence of a duplicated window;
      - ``text_clean``     — the surviving tokens, original order,
        space-joined.

    Keep-first (not drop-all) is the published semantics — the corpus
    retains exactly one copy of every repeated span. A token of the
    first occurrence survives unless some OTHER duplicated window's
    later occurrence also covers it — overlap resolution at token
    granularity, same as cutting byte ranges in the suffix-array
    formulation.

    Scale shape: the first occurrence per window is a ``min(struct(
    doc_id, i))`` aggregate on the window's md5 — same single
    hash-agg as detection, no pairwise join, viral spans stay linear
    in occurrences. Reconstruction anti-joins the removed-position
    set (bounded by document length) and re-sorts each document's
    kept tokens with ``array_sort`` over collected (pos, token)
    structs — per-document state only."""
    toks, wins = _span_windows(df, id_col, text_col, width)
    # one aggregate yields BOTH the duplication filter and the first
    # occurrence: occ >= 2 selects duplicated windows, (fd, fi) pins
    # the occurrence whose tokens survive
    firsts = (
        wins.groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct("doc_id", "i")).alias("first"),
        )
        .where(F.col("occ") >= 2)
        .select(
            "wh",
            F.col("first.doc_id").alias("fd"),
            F.col("first.i").alias("fi"),
        )
    )
    later = wins.join(firsts, "wh").where(
        (F.col("doc_id") != F.col("fd")) | (F.col("i") != F.col("fi"))
    )
    removed = later.select(
        "doc_id",
        F.explode(F.sequence(F.col("i"), F.col("i") + (width - 1))).alias("p"),
    ).distinct()
    pos = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("total_tokens"),
        F.posexplode("ts").alias("p0", "tok"),
    ).select(
        "doc_id", "total_tokens", (F.col("p0") + 1).alias("p"), "tok"
    )
    kept = (
        pos.join(removed, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.first("total_tokens").alias("total_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    base = toks.select(
        "doc_id", F.size("ts").cast("long").alias("total_tokens")
    )
    return (
        base.join(kept.drop("total_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            (F.col("total_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def line_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style cross-document line dedup (Raffel et al. 2020,
    arXiv:1910.10683 §2.2: "we discarded all but one of any
    three-sentence span occurring more than once" — the widely-used
    line-level variant drops every LINE that occurs in more than one
    document). Returns one row per document:

      - ``n_lines``      — non-empty trimmed lines;
      - ``n_dup_lines``  — lines (occurrences) whose text appears in
        ≥2 distinct documents;
      - ``text_clean``   — the document with duplicated lines removed,
        original order preserved (newline-joined).

    Same scale shape as ``duplicate_spans``: the duplicated-line set
    is a hash-agg on the line key with count(distinct doc) ≥ 2 —
    approximated as min(doc) ≠ max(doc), two scalars per group instead
    of a distinct-count state — then a semi/anti-join per occurrence;
    no pairwise blow-up. Reconstruction sorts each document's kept
    (pos, line) pairs with ``array_sort`` over a collected struct
    list — per-document state bounded by document size."""
    lines = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
        )
        .select("doc_id", "pos", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
    )
    dup = (
        lines.groupBy("line")
        .agg(F.min("doc_id").alias("d1"), F.max("doc_id").alias("d2"))
        .where(F.col("d1") != F.col("d2"))
        .select("line")
    )
    n_all = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    n_dup = (
        lines.join(dup, "line", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_lines"))
    )
    kept = (
        lines.join(dup, "line", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean")
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(n_all, "doc_id", "left")
        .join(n_dup, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_dup_lines", F.lit(0)).cast("long").alias("n_dup_lines"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
