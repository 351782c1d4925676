"""Deterministic dataset splitting / sampling for training pipelines.

``split_assign`` gives every row a stable train/val/test label derived
ONLY from its id (md5 bucket arithmetic) — not from partitioning, row
order, or a run-time RNG. That is the property a 100 TB pipeline needs:
re-running the job, repartitioning the corpus, or adding columns never
moves a document across the split boundary (no train/test leakage from
nondeterminism), and the SAME assignment is reproducible in any engine
that has md5 — which is exactly how the DuckDB oracle certifies it.

``split_assign`` / ``deterministic_sample`` are narrow JVM-side
projections: no shuffle, no UDF, no collect; Catalyst folds them into
the scan's codegen stage. ``top_n_per_group`` / ``pack_sequences`` are
single-shuffle window ops on the group key (quota sampling and
sequence packing are per-group by definition); both stay UDF-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# parts-per-million resolution keeps threshold arithmetic in exact
# integers (bit-identical across engines; no float boundary ambiguity)
_PPM = 1_000_000


def _bucket_ppm(id_col: Column, seed: str) -> Column:
    """Uniform integer bucket in [0, 1e6) from md5(id || seed): the
    first 15 hex digits as a 60-bit int, mod 1e6 — the same md5-60bit
    construction the SimHash oracle already proves portable
    (reproducible in DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT)."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(seed))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % _PPM


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    *,
    seed: str = "",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to one of the named
    splits with the given fractions (must sum to 1 within 1e-6).
    Assignment depends only on (id, seed): stable under repartitioning,
    re-runs, and engine choice. Split names are assigned in the given
    dict order over increasing bucket ranges."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("at least one split required")
    b = _bucket_ppm(F.col(id_col), seed)
    expr = None
    acc = 0
    names = list(fractions)
    for name in names[:-1]:
        acc += int(round(fractions[name] * _PPM))
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    *,
    order_col: str | None = None,
    id_col: str | None = None,
    seed: str = "",
) -> DataFrame:
    """Per-group quota: at most ``n`` rows from every group — the
    corpus-curation primitive behind "≤N documents per domain/source".

    Ordering inside a group: ``order_col`` ascending if given (quality
    rank, recency, …), else the md5 bucket of ``id_col`` — a stable
    STRATIFIED SAMPLE (same rows chosen on every run/partitioning).
    ``id_col`` always breaks ties so the selection is total-ordered.

    Scale shape: declared as a rank-filter window, which Spark compiles
    to WindowGroupLimit — each map task keeps only its local top-n per
    group BEFORE the shuffle, so the exchange carries O(n · groups ·
    tasks) rows, not the corpus (verified in tests against the plan).
    """
    if id_col is None:
        raise ValueError("id_col is required (total-order tie-break)")
    if order_col is not None:
        ordering = [F.col(order_col).asc(), F.col(id_col).asc()]
    else:
        ordering = [_bucket_ppm(F.col(id_col), seed).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    rn = "rn"  # probe: a fixed name would drop a caller's own column
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) <= n)
        .drop(rn)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Concatenate-and-cut sequence packing: documents are laid out in
    ``id_col`` order (within each group) and cut into context windows
    of ``budget`` tokens. Adds ``token_offset`` (exclusive running sum
    — where this document's tokens start) and ``bin_id``
    (``token_offset div budget`` — the window its first token lands
    in; a document may spill into the next window, exactly like
    GPT-style packed pretraining batches).

    All-integer window arithmetic (exact in any engine). One shuffle on
    the group key; the running sum is a single ordered pass per group —
    pass ``group_cols`` (shard/source) at scale, since packing ONE
    global stream serializes the scan into a single task by definition.
    """
    keys = group_cols or []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("token_offset", offset).withColumn(
        "bin_id", F.floor(F.col("token_offset") / budget).cast("long")
    )


def shard_assign(
    df: DataFrame, id_col: str, n_shards: int, *, seed: str = "shard"
) -> DataFrame:
    """Adds ``shard`` ∈ [0, n_shards): the md5-ppm bucket of the id mod
    ``n_shards`` — a pure function of (id, seed), so the same document
    lands in the same shard across re-runs, repartitionings, and
    engines (the oracle recomputes the identical arithmetic). Unless
    ``n_shards`` divides 1e6 the mod leaves ≤1-in-(1e6/n_shards)
    imbalance across shards — negligible for n_shards ≪ 1e6."""
    return df.withColumn(
        "shard",
        F.pmod(_bucket_ppm(F.col(id_col), seed), F.lit(n_shards)).cast("int"),
    )


def export_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int,
    *,
    token_count_col: str | None = None,
    seed: str = "shard",
    format: str = "parquet",
) -> DataFrame:
    """The training-export last mile: write the corpus as ``n_shards``
    hive-partitioned shard directories (``shard=N/``) with exactly ONE
    file per shard, rows sorted by id within each file — a fully
    deterministic byte layout a trainer can checksum. Returns (and
    writes to ``<path>/_manifest``) the per-shard manifest:
    (shard, n_docs[, n_tokens]).

    Plan: one shuffle (repartition on the shard column — unavoidable:
    one-file-per-shard IS a co-location requirement) with a
    sort-within-partition; several shard values may share a Spark
    partition, but partitionBy still writes each shard's rows to its
    own single file. The manifest is a map-side-combined aggregate on
    ≤n_shards keys. At 100 TB size n_shards so one shard
    (corpus/n_shards) fits an executor's write buffer comfortably —
    shards, not files-per-shard, are the parallelism unit downstream."""
    spark = df.sparkSession
    sharded = shard_assign(df, id_col, n_shards, seed=seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(format)
        .save(path)
    )
    # the manifest aggregates the WRITTEN files, not the input plan: a
    # recompute of `df` could disagree with the exported bytes (lazy
    # non-determinism, a source that moved underneath), and re-running
    # the input DAG — typically an expensive pipeline tail — just for
    # counts doubles the export cost. Reading back pays one scan of the
    # (already columnar) output and is checksum-consistent by
    # construction.
    written = spark.read.format(format).load(path)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_count_col is not None:
        aggs.append(F.sum(token_count_col).cast("long").alias("n_tokens"))
    manifest = written.groupBy("shard").agg(*aggs).orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sample: keep a different fraction of
    each stratum (e.g. downsample boilerplate-heavy sources, keep all
    of rare languages). Selection depends only on (id, seed) — the
    same stability contract as ``deterministic_sample`` — so rebalance
    runs are reproducible and never leak rows across re-runs.

    Strata not named in ``fractions`` fall back to
    ``default_fraction`` (0.0 = drop, 1.0 = keep all).

    Scale shape: a narrow filter — the per-stratum threshold is a
    CASE expression on the stratum column, folded into the scan's
    codegen stage; no shuffle, no driver-side stratum list collect
    (unlike ``DataFrame.sampleBy``, which is also partition-layout
    dependent)."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        ppm = F.lit(int(round(frac * _PPM)))
        thresh = F.when(cond, ppm) if thresh is None else thresh.when(cond, ppm)
    default_ppm = F.lit(int(round(default_fraction * _PPM)))
    thresh = default_ppm if thresh is None else thresh.otherwise(default_ppm)
    return df.where(_bucket_ppm(F.col(id_col), seed) < thresh)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, *, seed: str = ""
) -> DataFrame:
    """Stable fraction-sample by id hash: the same rows are selected on
    every run and any partitioning (unlike ``DataFrame.sample``, whose
    selection depends on partition layout). Narrow filter — pushes to
    the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_bucket_ppm(F.col(id_col), seed) < int(round(fraction * _PPM)))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    *,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows — sequential Poisson
    sampling (Ohlsson): each row gets priority ``u / w`` where ``u`` is
    its uniform md5 bucket and ``w`` its INTEGER weight (rows with
    w <= 0 are excluded); the ``n`` smallest priorities win, so
    inclusion probability grows ~proportionally with weight. The
    quality-weighted corpus-mixture draw, with the engine's standard
    reproducibility contract: the priority is a pure function of
    (id, seed, weight) — independent of partitioning and re-runs.

    Cross-engine exactness: ``u`` and ``w`` are int64s below 2^53, so
    the IEEE double division is exactly rounded — bit-identical in any
    compliant engine (the DuckDB oracle reproduces it) — and ties
    break on id. Plan: a narrow projection + global top-n
    (TakeOrderedAndProject): no shuffle beyond the final n-row
    gather."""
    pri_col = "_pri"
    while pri_col in df.columns:
        pri_col += "_"
    u = _bucket_ppm(F.col(id_col), seed) + F.lit(1)  # 1..1e6: never 0
    w = F.col(weight_col).cast("long")
    pri = u.cast("double") / w.cast("double")
    return (
        df.where(w > 0)
        .withColumn(pri_col, pri)
        .orderBy(F.col(pri_col).asc(), F.col(id_col).asc())
        .limit(n)
        .drop(pri_col)
    )


def mixture_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    target_frac: float,
    alpha: float = 0.5,
    weight_col: str | None = None,
    seed: str = "",
) -> DataFrame:
    """Temperature-scaled domain mixing: resample the corpus so each
    group (source/domain) contributes mass proportional to
    ``mass^alpha`` — the standard multi-corpus mixing rule (uniform
    over domains at α=0, the natural distribution at α=1, the usual
    up-weight-the-tail compromise at α=0.5, as in multilingual and
    multi-source pretraining mixtures). ``mass`` is the per-group sum
    of ``weight_col`` (token/char counts; row count when None); the
    total kept mass targets ``target_frac`` of the corpus. Groups
    whose target exceeds their mass keep everything (rate capped at
    1) — no oversampling.

    Per-row selection reuses ``_bucket_ppm``: a row survives iff its
    md5 bucket < its group's rate_ppm, so the sample is a pure
    function of (id, seed, per-group masses) — stable under
    partitioning, re-runs, and engines.

    The per-group rates are EXACT integer arithmetic, computed
    driver-side over the collected mass table (one row per group —
    thousands of domains at most, a bounded collect like the BPE merge
    head):

        s_g       = isqrt(m_g)            (α = 0.5; 1 at α=0; m_g at α=1)
        T         = (target_ppm · M) // 1e6
        rate_ppm  = min(1e6, (1e6 · T · s_g) // (S · m_g))

    with S = Σ s_g, M = Σ m_g in arbitrary-precision Python ints — no
    float sums whose order could differ across engines, no decimal
    rounding, no int64 overflow at 100 TB masses. The SQL oracle
    reproduces the identical computation with integer division
    (``isqrt(m)`` ≡ ``floor(sqrt(m::DOUBLE))`` exactly for
    m < 2^52: IEEE sqrt is correctly rounded, perfect squares hit
    exactly, and non-squares sit ≥ ~1/(2·sqrt(m)) ≫ ulp from the
    floor boundary). Non-canonical α fall back to ``pow`` doubles —
    deterministic per engine, cross-engine equal only w.h.p.

    Plan: one hash-agg for the masses, a broadcast map-join back, and
    a narrow filter — the corpus itself never shuffles."""
    import math

    if not 0.0 <= target_frac <= 1.0:
        raise ValueError(f"target_frac must be in [0,1], got {target_frac}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    mass_rows = (
        df.groupBy(group_col).agg(F.sum(w).alias("m")).collect()
    )
    # null-safe on both axes: a group whose every weight is NULL sums
    # to NULL (treat as zero mass — keeps nothing, like empty weights);
    # rows with a NULL group key can never match the rates equi-join,
    # so they are zero-mass by the same contract rather than a crash
    masses = {
        r[group_col]: int(r["m"]) if r["m"] is not None else 0
        for r in mass_rows
        if r[group_col] is not None
    }
    # zero-mass groups are excluded from sg as well as from the rates:
    # at alpha=0 each would otherwise contribute sg=1 to S, depressing
    # every REAL group's rate and undershooting target_frac (a group
    # that keeps nothing must not claim a share of the budget)
    if alpha == 0.0:
        sg = {g: 1 for g, m in masses.items() if m > 0}
    elif alpha == 0.5:
        sg = {g: math.isqrt(m) for g, m in masses.items() if m > 0}
    elif alpha == 1.0:
        sg = {g: m for g, m in masses.items() if m > 0}
    else:
        sg = {g: int(math.floor(m ** alpha)) for g, m in masses.items() if m > 0}
    S = sum(sg.values())
    M = sum(masses.values())
    target_ppm = int(round(target_frac * _PPM))
    T = (target_ppm * M) // _PPM
    # zero-mass groups (empty weights) contribute nothing and keep
    # nothing; guards the integer division, and an empty frame yields
    # an empty rate map rather than S=0
    rates = [
        (g, min(_PPM, (_PPM * T * sg[g]) // (S * masses[g])))
        for g in masses
        if masses[g] > 0 and S > 0
    ]
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    rates_df = spark.createDataFrame(
        rates, f"{group_col} {gtype}, rate_ppm long"
    )
    return (
        df.join(F.broadcast(rates_df), group_col)
        .where(_bucket_ppm(F.col(id_col), seed) < F.col("rate_ppm"))
        .drop("rate_ppm")
    )
