"""Text-analysis operators for training-data pipelines: per-document
stats/quality signals, regex token counting, heuristic language ID,
and content fingerprinting.

Everything stays JVM-side (built-in ``pyspark.sql.functions`` inside
whole-stage codegen) — no Python UDFs: these run over every document of
a 100 TB corpus, so the hot path must be narrow, shuffle-free
per-document map work. Each operator has an exactly-equivalent ANSI-SQL
formulation (see workloads_ext.py) used as its DuckDB oracle, so the
formulas are deliberately engine-portable (md5-based hashing, explicit
CASE tie-breaks, integer-ratio doubles).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ["the", "a", "an", "of", "and", "in", "to", "is"]

# BPE-ish tokenization: letter runs, digit runs, single other non-space
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _nonspace_tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality signals: char/token counts, mean token
    length, punctuation ratio, stopword ratio, and a composite quality
    score — all single-pass narrow expressions."""
    # NULL text counts as empty: without the coalesce, size(NULL) is -1
    # under default (non-ANSI) Spark, so a null-text row would report
    # n_tokens=-1 / n_stopwords=-1 and slip through count-based filters
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.regexp_extract_all(txt, F.lit(r"\S+"), 0)
    n_chars = F.length(txt)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    mean_tok = F.when(
        n_tokens > 0,
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / n_tokens,
            6,
        ),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars, 6)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, F.round(stop_hits / n_tokens, 6)).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        stop_hits.cast("long").alias("n_stopwords"),
        mean_tok.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
    )


def token_count_regex(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count under the BPE-ish regex (letter runs / digit runs /
    single punctuation) — the cheap proxy for tokenizer cost."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


# language markers: (lang, [marker words]) — scored by occurrence count
# of " word " in the padded text; first-listed language wins ties.
LANG_MARKERS = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "das"]),
    ("es", ["el", "los", "que"]),
    ("fr", ["le", "les", "et"]),
    ("it", ["il", "che", "di"]),
]


def _marker_score(text_col: str, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    score = F.lit(0)
    for w in words:
        pat = f" {w} "
        # non-overlapping occurrence count via length difference
        score = score + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
            / len(pat)
        ).cast("int")
    return score


def _lang_pred_expr(text_col: str) -> Column:
    """The language-prediction column alone (no score) — shared by
    ``language_id`` and pipeline annotation, so a marker-list change
    reaches both."""
    scores = [(lang, _marker_score(text_col, ws)) for lang, ws in LANG_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic marker-word language heuristic. Returns
    (doc_id, lang_pred, lang_score). Ties break in LANG_MARKERS order
    via a strict greater-than CASE chain (same chain in the oracle)."""
    best = F.greatest(
        *[_marker_score(text_col, ws) for _, ws in LANG_MARKERS]
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        _lang_pred_expr(text_col).alias("lang_pred"),
        best.cast("long").alias("lang_score"),
    )


def _quality_expr(text_col: str) -> Column:
    """The rounded-to-6 quality column shared by ``quality_score`` and
    ``corpus_report`` — one definition so the two can never drift."""
    # NULL text counts as empty (same contract as text_stats): without
    # the coalesce, least/greatest skip NULLs and a null-text doc would
    # score 0.35 instead of the 0.0 an empty string scores
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.regexp_extract_all(txt, F.lit(r"\S+"), 0)
    n_chars = F.length(txt)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_pen = F.when(n_chars > 0, F.least(n_punct * F.lit(10.0) / n_chars, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.lit(0.35) * len_score
        + F.lit(0.35) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        - F.lit(0.1) * punct_pen
    )
    return F.round(F.greatest(score, F.lit(0.0)), 6)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite document-quality heuristic in [0, 1]: rewards
    mid-length docs and high alpha ratio, penalizes punctuation excess
    and stopword-free (keyword-spam-like) text. All integer-ratio
    double arithmetic with explicit parentheses — the oracle evaluates
    the identical expression."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        _quality_expr(text_col).alias("quality"),
    )


def corpus_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    low_quality: float = 0.3,
) -> DataFrame:
    """The corpus data card: one (metric, value) row per release
    statistic — doc count, token totals/average, quality average,
    low-quality share, and a 10-bucket quality histogram. One narrow
    per-doc projection feeds two map-side-combined aggregates (global
    + histogram groupBy on ≤10 keys); nothing corpus-sized shuffles,
    so the report costs one scan at any corpus size.

    Cross-engine determinism: quality is rounded to 6 decimals per doc,
    then scaled to an exact integer (×1e6) BEFORE summing — integer
    sums are order-independent, so the averages (one double division at
    the end) hash-match the SQL oracle no matter how either engine
    orders the fold. Histogram buckets floor the same scaled integer
    (boundary docs land identically in both engines)."""
    # ONE corpus pass: everything — card and histogram — folds into a
    # single ≤10-key hash aggregate, pinned so the two output branches
    # below read 10 rows instead of re-scanning the corpus each
    bucketed = _quality_bucket_partial(
        df, text_col, low_quality
    ).localCheckpoint(eager=True)
    return _card_from_bucketed(bucketed)


def _quality_bucket_partial(
    df: DataFrame, text_col: str, low_quality: float
) -> DataFrame:
    """The decomposable core of the data card: a ≤10-row bucketed
    partial (b, n, toks, q6s, low) whose integer columns fold exactly —
    partials over disjoint corpus slices sum to the whole-corpus
    aggregate, which is what makes the card incrementally maintainable
    over append-log segments (``corpus_report_published``)."""
    # floor explicitly: Spark's double→long cast truncates but DuckDB's
    # rounds, so both engines must floor the scaled double themselves
    q6 = F.floor(_quality_expr(text_col) * 1_000_000).cast("long")
    # coalesce: size(NULL) is -1 under non-ANSI Spark — a null-text doc
    # must contribute 0 tokens to the card, not corrupt total_tokens
    per_doc = df.select(
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(r"\S+"), 0
            )
        ).alias("n_toks"),
        q6.alias("q6"),
    )
    lq = int(round(low_quality * 1_000_000))
    return per_doc.groupBy(
        F.least(F.floor(F.col("q6") / F.lit(100_000)), F.lit(9)).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_toks").alias("toks"),
        F.sum("q6").alias("q6s"),
        F.sum(F.when(F.col("q6") < lq, 1).otherwise(0)).alias("low"),
    )


def _card_from_bucketed(bucketed: DataFrame) -> DataFrame:
    """(metric, value) card rows from a (possibly folded) bucketed
    partial. ``bucketed`` must be small/pinned — both branches scan it."""
    # coalesce: an EMPTY corpus must report zeros, not a row of nulls
    # (sum over no rows is null; a release gate comparing n_docs == 0
    # should not meet NaN propagation instead)
    global_rows = bucketed.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("toks"), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum("q6s"), F.lit(0)).alias("sum_q6"),
        F.coalesce(F.sum("low"), F.lit(0)).alias("n_low"),
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("n_docs"),
                    F.lit("total_tokens"),
                    F.lit("avg_tokens"),
                    F.lit("avg_quality"),
                    F.lit("n_low_quality"),
                ),
                F.array(
                    F.col("n_docs").cast("double"),
                    F.col("total_tokens").cast("double"),
                    F.when(
                        F.col("n_docs") > 0,
                        F.round(F.col("total_tokens") / F.col("n_docs"), 6),
                    ).otherwise(F.lit(0.0)),
                    F.when(
                        F.col("n_docs") > 0,
                        F.round(
                            F.col("sum_q6") / F.col("n_docs") / F.lit(1_000_000.0), 6
                        ),
                    ).otherwise(F.lit(0.0)),
                    F.col("n_low").cast("double"),
                ),
            )
        ).alias("metric", "value")
    )
    hist = bucketed.select(
        F.concat(F.lit("quality_bucket_"), F.col("b").cast("string")).alias(
            "metric"
        ),
        F.col("n").cast("double").alias("value"),
    )
    return global_rows.unionByName(hist)


def corpus_report_published(
    spark,
    root: str,
    text_col: str,
    *,
    low_quality: float = 0.3,
    cache_root: str | None = None,
) -> DataFrame:
    """The data card over a PUBLISHED append-log table
    (``sources.io.append_published``), maintained incrementally:
    per-segment bucketed partials are computed once, stored under
    ``<root>_card/``, and folded into the card — so refreshing the
    stats after an append batch costs O(new segments), not a full
    corpus re-scan. Identical output to
    ``corpus_report(read_published(root))`` (integer partials fold
    exactly; pinned by test).

    Cache correctness rides on the publish contract: segment
    directories are immutable (compaction/vacuum mint NEW vdirs), so a
    stored partial can never go stale. Partials are keyed by
    (low_quality, segment dir); each is written to a temp name and
    RENAMED, so a crashed writer leaves garbage, not a half-partial a
    later call would trust. Orphaned partials (their segment was
    compacted away) are ignored here and deleted by
    ``vacuum_card_cache`` (run by ``maintain_ingest`` alongside the
    table vacuums)."""
    from prefixtree_spark.sources.io import (
        _fs,
        published_segments,
        read_source,
    )

    cache_root = cache_root or f"{root}_card"
    lq_tag = f"lq{int(round(low_quality * 1_000_000))}"
    fs, jvm = _fs(spark, cache_root)
    parts = []
    import uuid as _uuid

    for vdir, fmt in published_segments(spark, root):
        ppath = f"{cache_root}/{lq_tag}/{vdir}"
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(ppath)):
            seg = read_source(spark, f"{root}/{vdir}", format=fmt)
            # uuid'd temp name: a DETERMINISTIC tmp path let two
            # concurrent refreshers write over each other's half-built
            # directory and rename the wreckage into the trusted cache
            # (where segment immutability means it is never recomputed)
            tmp = f"{cache_root}/{lq_tag}/.tmp-{vdir}-{_uuid.uuid4().hex}"
            _quality_bucket_partial(
                seg, text_col, low_quality
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            if fs.exists(jvm.org.apache.hadoop.fs.Path(ppath)) or not fs.rename(
                jvm.org.apache.hadoop.fs.Path(tmp),
                jvm.org.apache.hadoop.fs.Path(ppath),
            ):
                # concurrent refresher beat us — theirs is identical
                fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        parts.append(spark.read.parquet(ppath))
    bucketed = parts[0]
    for p in parts[1:]:
        bucketed = bucketed.unionByName(p)
    folded = bucketed.groupBy("b").agg(
        F.sum("n").alias("n"),
        F.sum("toks").alias("toks"),
        F.sum("q6s").alias("q6s"),
        F.sum("low").alias("low"),
    )
    return _card_from_bucketed(folded.localCheckpoint(eager=True))


def vacuum_card_cache(
    spark,
    root: str,
    *,
    cache_root: str | None = None,
    tmp_grace_minutes: int = 60,
) -> int:
    """Delete cached per-segment card partials whose segment no longer
    appears in ANY kept snapshot's chain (round-5 verdict #4:
    compaction churn mints new vdirs and the orphaned partials grew the
    cache unboundedly — nothing ever cleaned them). Covers every
    ``low_quality`` variant (each ``lq*`` subdir); crashed-writer
    ``.tmp-*`` directories are cleared once older than
    ``tmp_grace_minutes`` (the grace keeps a LIVE concurrent refresher's
    half-written temp safe). Returns the number of directories deleted.
    Safe concurrent with ``corpus_report_published``: a partial is only
    deleted when its segment is unreferenced by every kept manifest
    entry, and immutable segments mean a reader that already resolved
    its chain never revisits the cache for vanished vdirs."""
    import time as _time

    from prefixtree_spark.sources.io import (
        _fs,
        _manifest_entries,
        _resolve_chain,
    )

    cache_root = cache_root or f"{root}_card"
    fs, jvm = _fs(spark, cache_root)
    Path = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(Path(cache_root)):
        return 0
    entries = _manifest_entries(spark, root)
    live: set[str] = set()
    # union over every KEPT entry's snapshot chain, not just the head:
    # vacuum_published(keep=N) leaves N resolvable snapshots and a
    # reader pinned to an older one must still find its partials
    for i in range(len(entries)):
        for vdir, _fmt in _resolve_chain(spark, entries[: i + 1]):
            live.add(vdir)
    deleted = 0
    cutoff_ms = (_time.time() - tmp_grace_minutes * 60) * 1000
    for lq in fs.listStatus(Path(cache_root)):
        if not lq.isDirectory():
            continue
        for part in fs.listStatus(lq.getPath()):
            name = part.getPath().getName()
            if name.startswith(".tmp-"):
                if part.getModificationTime() < cutoff_ms:
                    fs.delete(part.getPath(), True)
                    deleted += 1
            elif name not in live:
                fs.delete(part.getPath(), True)
                deleted += 1
    return deleted


def lm_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style language-model quality signal without an external
    model: train an add-one-smoothed bigram LM on the corpus ITSELF in
    one pass, then score every document by its mean negative
    log-likelihood under that LM. Low NLL ≈ looks like the corpus;
    high NLL flags gibberish, wrong-language, and boilerplate-free
    noise — the perplexity filter of the CCNet/CC-quality pipelines,
    with the corpus standing in for the reference LM.

    Plan: bigram counts C(a,b) and continuation totals C(a) are
    map-side-combined aggregates on the (token, token) key; the
    vocabulary size V (one scalar) is the only driver value. Each
    DISTINCT bigram's log-probability ln((C(ab)+1)/(C(a)+V)) is
    computed once on the stats table — floored to an exact ×1e6
    integer — and docs join their bigram occurrences to it (equi-join
    on the bigram key; the stats side is vocabulary-, not
    corpus-sized). Per-doc sums are integer-exact, so the final
    average (one double division) is order-independent and the whole
    operator carries a SQL oracle.

    Returns (doc_id, n_bigrams, avg_nll); docs with <2 tokens have no
    bigrams and are absent (score them by length rules instead)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), _nonspace_tokens(text_col).alias("ts")
    )
    big = (
        toks.where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("ts") - 1)).alias("i"),
            "ts",
        )
        .select(
            "doc_id",
            F.element_at("ts", F.col("i")).alias("a"),
            F.element_at("ts", F.col("i") + 1).alias("b"),
        )
    )
    v = (
        toks.select(F.explode("ts").alias("t")).agg(
            F.countDistinct("t").alias("v")
        ).collect()[0].v
    )
    c_ab = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    lp = c_ab.join(c_a, "a").select(
        "a",
        "b",
        F.floor(
            F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.lit(float(v))))
            * 1_000_000
        )
        .cast("long")
        .alias("lp6"),
    )
    return (
        big.join(lp, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp6").alias("sum_lp6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("sum_lp6") / (F.col("n_bigrams") * F.lit(1_000_000.0)), 6
            ).alias("avg_nll"),
        )
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, *, gram: int = 8
) -> DataFrame:
    """Content fingerprint: min over all char-``gram``-grams of a
    60-bit md5-derived hash (min-hash winnowing). Documents shorter
    than ``gram`` chars are absent from the output (no shingles).
    NB: the length filter must precede sequence() — Spark's
    sequence(1, 0) counts DOWN."""
    grams = df.where(F.length(text_col) >= gram).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(1), F.length(text_col) - (gram - 1))
        ).alias("i"),
        F.col(text_col).alias("t"),
    )
    h = F.conv(F.substring(F.md5(F.expr(f"substring(t, i, {gram})")), 1, 15), 16, 10).cast("long")
    return grams.groupBy("doc_id").agg(F.min(h).alias("fingerprint"))


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    *,
    max_vocab: int = 1_000_000,
) -> "list[tuple[str, str]]":
    """Train BPE merges over the corpus: returns the ordered merge list
    ``[(left, right), ...]`` (length ≤ ``n_merges``; shorter if the
    corpus exhausts its pairs).

    Architecture mirrors how tokenizer training actually scales: the
    CORPUS-sized work is one distributed pass aggregating the word
    frequency table (explode → hash-agg, map-side partials, top
    ``max_vocab`` words by count — the standard cap: the head carries
    almost all token mass); the merge loop then runs on that
    aggregated vocabulary with the classic incremental algorithm
    (pair counts updated only for words containing the merged pair).
    The loop is inherently sequential (merge i+1's statistics depend
    on merge i), so distributing it would mean n_merges full-corpus
    jobs — the aggregated-vocab loop is the scale design, not a
    shortcut. Deterministic: ties break on the pair lexicographically.
    Pinned by a pure-Python brute-force equivalence test; exposed as a
    rows-only workload (iterative — not SQL-expressible)."""
    vocab_rows = (
        df.select(F.explode(_nonspace_tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(max_vocab)
        .collect()
    )
    # word -> (symbol tuple, count); symbols start as single characters
    words: list[list] = [[tuple(r.tok), int(r.cnt)] for r in vocab_rows]
    # pair -> total count, and pair -> set of word indices containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, cnt) in enumerate(words):
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] = pair_counts.get(pair, 0) + cnt
            pair_words.setdefault(pair, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms, cnt = words[wi]
            # retract this word's old pair contributions
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= cnt
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                ws = pair_words.get(pair)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[pair]
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
            words[wi][0] = syms
            # add the new contributions back
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + cnt
                pair_words.setdefault(pair, set()).add(wi)
    return merges


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: "list[tuple[str, str]]",
) -> DataFrame:
    """Apply a trained merge list to the corpus — the DISTRIBUTED half
    of tokenization (training aggregates once; encoding touches every
    byte of 100 TB). Returns ``(doc_id, tokens array<string>,
    n_tokens)``.

    The merge ranks broadcast with the UDF closure (a tokenizer is
    KBs); encoding is the classic lowest-rank-first merge loop per
    word, memoized per Arrow batch — corpora repeat words heavily, so
    the per-batch cache turns most words into dict hits. Arrow-batched
    pandas UDF (not per-row Python), no shuffle: a pure map stage that
    scales with input bytes."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[w] = syms
            return syms

        return texts.map(
            lambda t: [s for w in t.split() for s in enc_word(w)] if t else []
        )

    return df.select(
        F.col(id_col).alias("doc_id"),
        encode(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

      - ``top_ngram_frac``: occurrences of the single most frequent
        word ``n``-gram over total ``n``-grams — boilerplate/spam
        repeats a phrase, natural text doesn't;
      - ``dup_token_frac``: ``1 - distinct/total`` tokens — keyword
        stuffing and degenerate generations re-use tokens.

    Documents with fewer than ``n`` tokens get 0.0 for the n-gram
    signal (no n-grams exist); empty documents get 0.0 for both.
    Ratios are integer-ratio doubles rounded to 6 (the oracle
    evaluates identical expressions).

    Plan: one explode + hash-agg shuffle per signal (map-side
    partials), joined back on doc_id — no UDFs, no windows over the
    corpus; per-group state is one (max, sum) pair, so skewed
    documents cost their own size only."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), _nonspace_tokens(text_col).alias("ts")
    )
    tok_stats = (
        toks.select("doc_id", F.explode("ts").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total_toks"),
            F.count(F.lit(1)).alias("distinct_toks"),
        )
    )
    grams = toks.where(F.size("ts") >= n).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ts) - {n - 1}),"
                f" i -> array_join(slice(ts, i, {n}), ' '))"
            )
        ).alias("gram"),
    )
    gram_stats = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_gram"), F.sum("c").alias("total_grams"))
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    out = base.join(tok_stats, "doc_id", "left").join(gram_stats, "doc_id", "left")
    dup_frac = F.when(
        F.col("total_toks") > 0,
        F.round(
            F.lit(1.0) - F.col("distinct_toks") / F.col("total_toks"), 6
        ),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("total_grams") > 0,
        F.round(F.col("top_gram") / F.col("total_grams"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        top_frac.alias("top_ngram_frac"),
        dup_frac.alias("dup_token_frac"),
    )


def top_tokens(df: DataFrame, text_col: str, k: int = 1000) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent whitespace
    tokens with counts — the first statistic a tokenizer/vocab build
    looks at. Deterministic tie-break on the token itself so top-k is
    stable across engines.

    Plan: explode → one hash-agg shuffle (map-side partials) → global
    top-k as TakeOrderedAndProject (no full sort of the vocabulary)."""
    toks = df.select(F.explode(_nonspace_tokens(text_col)).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(k)


def bpe_pair_counts(
    df: DataFrame, text_col: str, k: int = 200
) -> DataFrame:
    """The inner statistic of one BPE training step: corpus-wide counts
    of ADJACENT character pairs within whitespace tokens, top-``k`` by
    frequency (deterministic tie-break on the pair). A tokenizer
    trainer calls this repeatedly with merged symbols; the Spark shape
    stays the same — explode to pairs, one hash-agg shuffle (map-side
    partials), TakeOrderedAndProject."""
    toks = df.select(F.explode(_nonspace_tokens(text_col)).alias("tok")).where(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("pair")).limit(k)


def ngram_counts(
    df: DataFrame, text_col: str, *, n: int = 2, k: int = 500
) -> DataFrame:
    """Corpus-wide token n-gram frequencies, top-``k`` (deterministic
    tie-break on the n-gram) — the statistic behind contamination
    screens, boilerplate discovery, and LM data analysis. Counts
    multiplicity (unlike dedup's per-doc DISTINCT shingles).

    Plan: narrow explode → one hash-agg shuffle with map-side partials
    → TakeOrderedAndProject top-k; nothing driver-side."""
    toks = df.select(_nonspace_tokens(text_col).alias("ts")).where(
        F.size("ts") >= n
    )
    grams = toks.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ts) - {n - 1}),"
                f" i -> concat_ws(' ', slice(ts, i, {n})))"
            )
        ).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("ngram")).limit(k)


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    retrieval/context-window chunker): chunk ``c`` covers tokens
    ``[c*stride, c*stride + chunk_tokens)``; the last chunk may be
    short; a document shorter than one stride yields one chunk.
    Output: (doc_id, chunk_id, token_start, n_tokens, chunk) — offsets
    are 0-based so callers can map spans back into the source.

    Narrow 1→N explode, no shuffle, no UDF: chunking 100 TB is a
    map-only pass that parallelizes with the scan. ``stride <
    chunk_tokens`` gives overlap; ``stride == chunk_tokens`` gives a
    disjoint partition of the token stream."""
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    base = df.select(
        F.col(id_col).alias("doc_id"), _nonspace_tokens(text_col).alias("ts")
    ).where(F.size("ts") >= 1)
    # starts: 1, 1+stride, ... while start <= len (1-based slice math)
    chunks = base.select(
        "doc_id",
        "ts",
        F.explode(
            F.expr(f"sequence(1, size(ts), {stride})")
        ).alias("start1"),
    ).select(
        "doc_id",
        (F.col("start1") - 1).cast("long").alias("token_start"),
        F.expr(f"slice(ts, start1, {chunk_tokens})").alias("chunk_ts"),
    )
    return chunks.select(
        "doc_id",
        (F.col("token_start") / stride).cast("long").alias("chunk_id"),
        "token_start",
        F.size("chunk_ts").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "chunk_ts").alias("chunk"),
    )


# ---------------------------------------------------------------------------
# PII hygiene (detection + redaction)
# ---------------------------------------------------------------------------

# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB oracle): character classes, bounded repeats, and \b only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
# Redaction applies in this fixed order: email first (emails contain
# dots/digits that later patterns could chew up), SSN before the more
# general phone shape, IPv4 last.
_PII_ORDER = ("email", "ssn", "phone", "ipv4")


def detect_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII signal: match counts per kind plus ``has_pii``
    — the filter/audit column a training-data pipeline gates exports
    on. Pure JVM ``regexp_count`` expressions (whole-stage codegen, no
    Python), one scan."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col), *counts)
    has = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}") > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has)


def redact_pii(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with a typed token (``<EMAIL>``,
    ``<SSN>``, ``<PHONE>``, ``<IPV4>``) in one JVM expression chain —
    the redact-before-training step. Order is fixed (see _PII_ORDER)
    so overlapping shapes resolve deterministically."""
    expr = F.col(text_col)
    for kind in _PII_ORDER:
        expr = F.regexp_replace(
            expr, F.lit(PII_PATTERNS[kind]), F.lit(f"<{kind.upper()}>")
        )
    return df.withColumn(out_col or text_col, expr)


def normalize_text(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Canonical text normalization for dedup/fingerprint keys:
    lowercase, strip ASCII control characters, collapse whitespace
    runs to single spaces, trim. One JVM expression chain (single
    codegen scan) — normalize ONCE, then hash/shingle the result;
    running exact_dedup on un-normalized text silently misses
    case/whitespace variants of the same document."""
    expr = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[\x00-\x1F\x7F]", " "),
            r"\s+",
            " ",
        )
    )
    return df.withColumn(out_col or text_col, expr)


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, *, vocab_k: int = 1000
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_k`` token vocabulary — the cheap LM-free proxy for
    "does this doc look like the corpus" (gibberish, code dumps, and
    wrong-language docs score high; the filter companion to
    ``quality_score``).

    Plan: one tokenize+count pass builds the vocabulary head
    (TakeOrderedAndProject with deterministic (count desc, token asc)
    ties), which is broadcast into a left-anti-style membership join;
    per-doc totals ride the same exploded pass. Token counts use
    MULTIPLICITY (a doc repeating one rare token is mostly OOV)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_nonspace_tokens(text_col)).alias("tok"),
    ).where(F.col("tok") != "")
    toks = toks.cache()
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_k)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    per_tok = toks.join(F.broadcast(vocab), "tok", "left")
    out = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("_in_vocab").isNull(), 1)).alias("n_oov"),
    )
    # zero-token docs (empty/whitespace/null text) have no exploded
    # rows, so the aggregate alone would DROP them — and a pipeline
    # inner-joining this output onto the corpus would silently lose
    # those docs. Rejoin the doc base: every input doc gets a row, with
    # (0, 0, 0.0) as the defined rate of an empty document (the same
    # emit-zeros convention repetition_signals uses).
    base = df.select(F.col(id_col).alias("doc_id"))
    result = (
        base.join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            F.coalesce(
                F.round(F.col("n_oov") / F.col("n_tokens"), 6), F.lit(0.0)
            ).alias("oov_rate"),
        )
        .localCheckpoint(eager=True)
    )
    toks.unpersist()
    return result
