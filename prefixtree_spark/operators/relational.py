"""Relational/analytic operators beyond the reference's surface.

The reference has no aggregations, windows, global sorts, or limits
(SURVEY.md §2.9) — Spark provides them natively; these workloads prove
the engine drives them correctly and scalably:

  - ``pricing_summary`` (TPC-H Q1 shape) — hash aggregate with map-side
    partial aggregation; DECIMAL sums so results are exact and
    engine-portable (double summation order varies; decimal doesn't).
  - ``top_revenue_orders`` (TPC-H Q3 shape) — selective dim filter
    broadcast-joined to the fact table, aggregate, global top-k with a
    deterministic tie-break (TakeOrderedAndProject, not a full sort).
  - ``tumbling_counts`` — event-time tumbling-window aggregation
    (the batch twin of streaming/events.py; same logical plan).
  - ``sessionize`` — gap-based sessionization via analytic window
    functions (lag → gap flag → running sum), the classic
    shuffle-once-per-user formulation.

Timestamps are emitted as epoch microseconds (BIGINT) so value hashes
are formatting-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast(DEC) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1).cast(DEC) - disc) * (F.lit(1).cast(DEC) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """Revenue top-k join: the small filtered dimension side is
    explicitly broadcast so the fact scan never shuffles for the join;
    the final top-k is a TakeOrderedAndProject (no global sort)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(price * (F.lit(1).cast(DEC) - disc)).cast("double").alias("revenue"))
    )
    return (
        joined.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
        .select(
            "o_orderkey",
            # o_orderdate is TIMESTAMP_NTZ in the parquet; unix_micros
            # needs TIMESTAMP (session TZ is UTC, so the cast is identity)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "revenue",
        )
    )


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts per event_type — identical
    logical shape to the streaming version (streaming/events.py), which
    is the point: one query, two execution modes."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. One shuffle
    (partition by user), two analytic passes, no self-joins."""
    gap_us = gap_minutes * 60 * 1_000_000
    # ONE window spec shared by the lag and the running sum — they must
    # never disagree on ordering
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    flagged = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    ).withColumn(
        "new_session",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq", F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(w)
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks up ONE right row within its
    ``by`` group — the time-series join (trades⋈quotes,
    event⋈latest-state) the reference has no answer to and Spark has
    no native operator for. ``direction``:

      - ``"backward"`` (default): the LATEST right with
        ``right.on <= left.on`` (inclusive);
      - ``"forward"``: the EARLIEST right with ``right.on >= left.on``;
      - ``"nearest"``: whichever of the two is closer in ``on``
        (ties break backward). ``on`` must be numeric or a timestamp;
        timestamp distances compare on exact µs-epoch integers.

    Spark-first plan (the union + carry formulation): tag both sides,
    union them, and per ``by`` group run ordered window passes where
    every left row inherits the nearest non-null right payload in the
    requested direction. Cost = ONE shuffle on ``by`` + partition-local
    sorts (``nearest`` runs both orderings over the same exchange) —
    no range cross join, no per-row lookup, and skew only where a
    single ``by`` key is itself hot. Equal timestamps are inclusive in
    both directions — exactly DuckDB ``ASOF JOIN``'s ``>=`` / ``<=``
    semantics (the oracles).

    ``right_cols`` are the right payload columns to carry (returned
    with ``suffix``). Right rows should be unique per (by, on) — with
    duplicates, the carry picks the last/first in sort order; dedup
    first for determinism.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    lcols = left.columns
    nearest = direction == "nearest"

    from pyspark.sql import types as T

    def _num(c):
        # exact distance key: µs-epoch int64 for timestamps (every
        # value < 2^53 is a double-exact integer); a raw
        # cast(timestamp as double) has ~0.5µs ulps at current epochs
        # and mis-resolves µs-scale ties
        if isinstance(left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(c).cast("double")
        return c.cast("double")

    # suffixed payload names must not collide with existing left
    # columns — a silent duplicate would make later F.col references
    # ambiguous (or bind the wrong column)
    clashes = [c + suffix for c in right_cols if (c + suffix) in lcols]
    if clashes:
        raise ValueError(
            f"asof_join: suffixed right column(s) {clashes} already exist "
            f"on the left side — pass a different suffix"
        )
    # internal column names must not shadow caller columns
    taken = set(lcols) | {c + suffix for c in right_cols}
    src = "_src"
    while src in taken:
        src += "_"
    hid = "_asof_on"
    while hid in taken or hid == src:
        hid += "_"
    pay = "_asof_pay"
    while pay in taken or pay in (src, hid):
        pay += "_"
    # The carried payload is ONE struct per right row, not one column
    # per right field: last/first(ignorenulls) skip NULLs, so per-column
    # carries (a) skipped a right row whose payload value was
    # legitimately NULL, carrying a STALE older value instead (DuckDB
    # ASOF returns the NULL), and (b) could blend columns from
    # DIFFERENT right rows into one output row. A struct is non-NULL
    # exactly when it comes from a right row, whatever its fields hold,
    # so the whole row carries atomically.
    pay_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in right_cols])
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias(src),
        F.lit(None).cast(pay_type).alias(pay),
        *([F.lit(None).cast("double").alias(hid)] if nearest else []),
    )
    tagged_r = right.select(
        *[
            (
                F.col(c)
                if c in (by, on)
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias(src),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias(pay),
        *([_num(F.col(on)).alias(hid)] if nearest else []),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # backward: right rows sort BEFORE left at equal `on` (_src asc), so
    # the [unbounded, current] frame includes ties. forward mirrors it.
    w_back = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col(src).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col(src).desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )

    def back(c):
        return F.last(F.col(c), ignorenulls=True).over(w_back)

    def fwd(c):
        return F.first(F.col(c), ignorenulls=True).over(w_fwd)

    if direction == "backward":
        chosen = back(pay)
    elif direction == "forward":
        chosen = fwd(pay)
    else:
        cur = _num(F.col(on))
        b_on, f_on = back(hid), fwd(hid)
        use_fwd = (
            F.when(b_on.isNull(), F.lit(True))
            .when(f_on.isNull(), F.lit(False))
            .otherwise((f_on - cur) < (cur - b_on))
        )
        chosen = F.when(use_fwd, fwd(pay)).otherwise(back(pay))
    carried = unioned.select(*lcols, src, chosen.alias(pay))
    return carried.where(F.col(src) == 1).select(
        *lcols,
        *[F.col(pay)[c].alias(c + suffix) for c in right_cols],
    )



def _free_name(df: DataFrame, base: str) -> str:
    """An internal working-column name that cannot shadow (and later
    drop) a caller column: fixed names like '_b' silently overwrote
    same-named user data (round-5 review; asof_join already probes its
    names — this is that pattern, shared)."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    lo: str,
    hi: str,
    by: str | None = None,
    bucket: int,
) -> DataFrame:
    """Interval containment join: pairs where ``right.lo <= left.on <
    right.hi`` (and ``left.by == right.by`` when given) — the θ-join
    Spark would otherwise plan as a broadcast nested loop (quadratic at
    scale).

    Scale shape: ``bucket`` (same integer units as ``on``) discretizes
    time — each left row carries ONE bucket id, each right interval
    explodes to the ~(len/bucket + 1) buckets it overlaps, and the join
    becomes an equi-join on (bucket [, by]) with the exact range
    predicate as a post-filter. Pick ``bucket`` near the typical
    interval length: fan-out stays O(1) per interval and the shuffle is
    hash-partitioned, never all-pairs. Pairs are unique because a left
    row lives in exactly one bucket.
    """
    b = _free_name(left, "_b")
    while b in right.columns:
        b += "_"
    lb = left.withColumn(b, F.floor(F.col(on) / bucket))
    # degenerate intervals (hi <= lo, e.g. sentinel values in dirty
    # data) MUST be dropped before the explode: sequence(start, stop)
    # counts DOWN when start > stop, so one bad row would fan out into
    # (lo-hi)/bucket spurious bucket rows instead of zero — the same
    # pitfall doc_fingerprint guards its sequence() against. The rows
    # contribute nothing anyway (the range post-filter is vacuous).
    rb = right.where(F.col(hi) > F.col(lo)).withColumn(
        b,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket),
                # hi is EXCLUSIVE: the last candidate bucket holds hi-1
                F.floor((F.col(hi) - 1) / bucket),
            )
        ),
    )
    keys = [b] + ([by] if by else [])
    joined = lb.join(rb, keys)
    return joined.where(
        (F.col(on) >= F.col(lo)) & (F.col(on) < F.col(hi))
    ).drop(b)


def extract_json(
    df: DataFrame, json_col: str, fields: dict[str, str]
) -> DataFrame:
    """Typed field extraction from a JSON string column: adds one
    column per ``fields`` entry (``json field name -> spark type``;
    output columns carry the field names), parsed with a single
    schema'd ``from_json`` pass — the document is parsed ONCE per row
    regardless of how many fields are pulled (per-field
    ``get_json_object`` re-parses the string for every field).

    Malformed documents yield NULLs (PERMISSIVE mode) rather than
    failing the job — the right default for web-scale semi-structured
    ingest where a 100 TB corpus always contains broken rows.

    Narrow projection: no shuffle, stays in the scan's codegen stage.
    """
    schema = ", ".join(f"{name} {typ}" for name, typ in fields.items())
    j = _free_name(df, "_j")
    parsed = df.withColumn(j, F.from_json(F.col(json_col), schema))
    for name in fields:
        parsed = parsed.withColumn(name, F.col(j).getField(name))
    return parsed.drop(j)


def hopping_counts(
    events: DataFrame, *, size: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Hopping (sliding) event-time window counts: each event lands in
    ``size/slide`` overlapping windows. Spark's ``window()`` expands
    the row to its windows before the aggregation — the same logical
    plan the streaming twin uses, so batch and stream agree row-for-row.
    Window bounds are emitted as epoch microseconds (engine-portable).
    """
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type",
            "n_events",
        )
    )


def distinct_counts(
    df: DataFrame, group_col: str, value_col: str, *, rsd: float = 0.05
) -> DataFrame:
    """Per-group cardinality: exact ``count(distinct)`` next to the
    HyperLogLog++ sketch estimate (``approx_count_distinct``). The
    sketch is the 100 TB path — fixed ~1.5 KB of state per group and
    ONE shuffle of partial sketches (mergeable, map-side combined),
    where exact distinct needs a shuffle of every distinct (group,
    value) pair. The exact column pins correctness at test scale; the
    approx column's relative error is bounded by ``rsd``."""
    return df.groupBy(group_col).agg(
        F.countDistinct(value_col).alias("n_exact"),
        F.approx_count_distinct(value_col, rsd).alias("n_approx"),
    )


def frequent_items(
    df: DataFrame, value_col: str, *, min_share: float = 0.01
) -> DataFrame:
    """Exact heavy hitters: values whose share of all rows is ≥
    ``min_share``, with count and share. One hash-agg shuffle (map-side
    partials) + a scalar total joined back — output is at most
    ``1/min_share`` rows by definition, so the result is always tiny
    no matter the input scale. The sketch alternative (Misra-Gries /
    count-min) only matters when the VALUE cardinality itself
    overwhelms the cluster; per-value counts at 1e9 distinct values
    are still a routine Spark aggregation."""
    counts = df.groupBy(F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # total from the COUNTS table, not a second corpus scan: the input
    # is read once, and the total always agrees with the counts it
    # normalizes (a re-scan of a moving/sampled source could differ)
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n") >= F.col("_total") * min_share)
        .select(
            "value",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        )
    )


def pseudonymize(
    df: DataFrame, cols: list[str], *, salt: str
) -> DataFrame:
    """Irreversibly replace identifier columns with salted SHA-256
    digests (hex) — the PII hygiene step before a corpus leaves its
    trust boundary. Same value + same salt ⇒ same digest, so joins and
    grouping on the pseudonymized key still work across tables hashed
    with the same salt; without the salt the digests resist dictionary
    reversal of low-entropy identifiers. NULLs stay NULL.

    Narrow JVM-side projection (no UDF, no shuffle)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256),
            ),
        )
    return out


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: one ROW per column with null count,
    approximate-free distinct count, and min/max rendered as strings
    (schema-stable across column types). ONE aggregation job for all
    columns (a single pass over the data — not one job per column),
    then a narrow unpivot of the tiny result."""
    if not cols:
        raise ValueError("profile_table: cols must name at least one column")
    # ONE shared row count for the whole profile (it is the same value
    # for every column; per-column copies just multiplied accumulators)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pivot_counts(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
    *,
    agg_col: str | None = None,
) -> DataFrame:
    """Wide-format pivot: one row per ``group_col``, one column per
    ``pivot_col`` value (``n_<value>`` counts, or sums of ``agg_col``).

    ``values`` is REQUIRED, not inferred: at 100 TB an unconstrained
    ``pivot()`` first runs a distinct scan over the pivot column and
    then builds a row per value — an unbounded-width schema decided by
    the data. A fixed value list keeps this a single hash aggregate
    with map-side partials (one CASE-conditional accumulator per
    column, no extra scan, no second shuffle); unexpected values are
    deliberately NOT silently absorbed — count them with an explicit
    'other' bucket upstream if needed."""
    if agg_col is None:
        aggs = [
            F.count(F.when(F.col(pivot_col) == v, 1)).alias(f"n_{v}")
            for v in values
        ]
    else:
        aggs = [
            F.coalesce(
                F.sum(F.when(F.col(pivot_col) == v, F.col(agg_col).cast(DEC))),
                F.lit(0).cast(DEC),
            )
            .cast("double")
            .alias(f"sum_{v}")
            for v in values
        ]
    return df.groupBy(group_col).agg(*aggs)


def resample_carry_forward(
    df: DataFrame,
    *,
    ts_col: str,
    by_col: str,
    value_cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular time series: one row per ``by`` group per
    ``step`` tick (from the group's first observation, hour-aligned, to
    its last), each carrying the latest observation at-or-before the
    tick — gap-filling for feature/training pipelines that need
    fixed-cadence inputs from event streams.

    Plan: per-group bounds (one hash aggregate) → ``sequence()`` +
    ``explode`` builds the grid as a NARROW 1→N expansion (the grid
    never shuffles on its own) → ``asof_join(grid, observations,
    backward)``, which is the engine's one-shuffle union+carry
    formulation. Total: two shuffles on ``by``, no range join, grid
    size = Σ group spans / step (bounded by time span, not event
    count). Observations should be unique per (by, ts); dedup first
    for determinism (see ``asof_join``)."""
    bounds = df.groupBy(by_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_t0"),
        F.max(ts_col).alias("_t1"),
    )
    grid = bounds.select(
        by_col,
        F.explode(
            F.expr(f"sequence(_t0, _t1, interval {step})")
        ).alias(ts_col),
    )
    obs = df.select(by_col, ts_col, *value_cols)
    return asof_join(
        grid, obs, on=ts_col, by=by_col, right_cols=value_cols,
        direction="backward",
    )


def cohort_retention(
    df: DataFrame, *, user_col: str, ts_col: str, period: str = "week"
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period; one row per (cohort_period, activity_period) with the
    distinct users active then — the standard growth/engagement rollup.

    Two hash aggregates on ``user_col`` (first-period + distinct
    activity periods) and one final count aggregate; the cohort join
    is on the user key, so AQE broadcasts the (|users|-sized) cohort
    side only when it fits — no window functions, no event-grain
    shuffle beyond the two user-keyed passes."""
    cohort = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_period")
    )
    active = df.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("activity_period")
    ).distinct()
    return (
        active.join(cohort, user_col)
        .groupBy("cohort_period", "activity_period")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def attribution_join(df: DataFrame, *, window_minutes: int = 60) -> DataFrame:
    """Batch twin of ``streaming.joins.streaming_attribution_join``:
    purchases joined to every view by the same user within the
    lookback window (inclusive bounds). Equality on ``user_id`` keys
    the hash join; the time bounds are post-filters — never a
    nested-loop range join."""
    views = df.where("event_type = 'view'").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = df.where("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = purchases.alias("p").join(
        views.alias("v"),
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.view_ts") <= F.col("p.purchase_ts"))
        & (
            F.col("v.view_ts")
            >= F.col("p.purchase_ts") - F.expr(f"interval {window_minutes} minutes")
        ),
        "inner",
    )
    return joined.select(
        F.col("p.user_id").alias("user_id"),
        "purchase_id",
        "view_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts").alias("view_ts_us"),
    )
