"""Relational / window / multimodal workloads with DuckDB oracles.

DECIMAL casts make aggregate sums exact (order-independent) so Spark
and DuckDB agree bit-for-bit after the final cast to double; timestamps
travel as epoch microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prefixtree_spark.operators import multimodal, relational
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.workloads import workload


def _latest_per_user_ts(df):
    """One view row per (user_id, ts): highest event_id wins — the
    determinism-critical dedup the as-of/resample workloads share (their
    oracles' row_number(ORDER BY event_id DESC) twin). One definition,
    so the tie-break can never desynchronize between them."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return df.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")


@workload(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@workload(
    "q3_top_revenue_orders",
    """
    SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_revenue_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@workload(
    "events_tumbling_counts",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tumbling_counts(load_table(spark, sf_dir, "events"))


@workload(
    "events_sessionize",
    """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    f AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                       > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    s AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM f
    )
    SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


@workload(
    "events_rollup_cube",
    """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(user_id % 10 AS VARCHAR), '<all>') AS user_bucket,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 10)
    """,
)
def events_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ROLLUP (absent from the reference, SURVEY §2.9) — hierarchy
    totals in one pass; DECIMAL sums keep the oracle exact."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket_raw", F.col("user_id") % 10)
        .rollup("event_type", "user_bucket_raw")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("user_bucket_raw").cast("string"), F.lit("<all>")).alias("user_bucket"),
            "n_events",
            "sum_value",
        )
    )


@workload(
    "events_funnel",
    """
    WITH seq AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(types) AS n_events,
           (coalesce(list_position(types, 'signup'), 0) > 0 AND
            len(list_filter(types[coalesce(list_position(types, 'signup'), 0) + 1:],
                            x -> x = 'purchase')) > 0) AS converted
    FROM seq
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence/funnel analysis: did ANY 'purchase' follow the FIRST
    'signup' per user? Ordered collect_list + array slicing — the
    Spark shape for order-dependent behavioral queries."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.withColumn(
            "et",
            F.struct(F.unix_micros("ts").alias("t"), F.col("event_id").alias("e"), F.col("event_type").alias("v")),
        )
        .groupBy("user_id")
        .agg(F.transform(F.array_sort(F.collect_list("et")), lambda s: s["v"]).alias("types"))
    )
    pos_signup = F.array_position("types", "signup")
    after_signup = F.expr("slice(types, cast(array_position(types, 'signup') as int) + 1, size(types))")
    purchase_after = F.exists(after_signup, lambda t: t == F.lit("purchase"))
    return seq.select(
        "user_id",
        F.size("types").cast("long").alias("n_events"),
        ((pos_signup > 0) & purchase_after).alias("converted"),
    )


@workload(
    "customer_segment_setops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    UNION
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
     EXCEPT
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def customer_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (absent from the reference, SURVEY §2.9):
    INTERSECT / UNION / EXCEPT over customer segments."""
    c = load_table(spark, sf_dir, "customer")
    building = c.where("c_mktsegment = 'BUILDING'").select("c_custkey")
    rich = c.where("c_acctbal > 1000").select("c_custkey")
    machinery = c.where("c_mktsegment = 'MACHINERY'").select("c_custkey")
    very_rich = c.where("c_acctbal > 5000").select("c_custkey")
    # subtract() IS distinct-EXCEPT; exceptAll+distinct only matched the
    # oracle because c_custkey is unique — on a non-unique key it keeps
    # left-heavy duplicates SQL EXCEPT removes
    return building.intersect(rich).union(machinery.subtract(very_rich)).distinct()


@workload(
    "events_value_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles per event type (Spark `percentile`
    ≡ DuckDB `quantile_cont` — same linear interpolation). The sketch
    path (approx_percentile/t-digest) is the 100 TB variant; exact is
    the oracle-able twin."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


@workload(
    "events_value_quantiles_approx",
    """
    SELECT event_type,
           CAST(1 AS INT) AS p25_ok, CAST(1 AS INT) AS p50_ok,
           CAST(1 AS INT) AS p75_ok, CAST(1 AS INT) AS p95_ok
    FROM events GROUP BY event_type
    """,
)
def events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of ``events_value_quantiles`` — the 100 TB path,
    hash-gated on the sketch's own guarantee (r12; this row was
    rows-only). ``approx_percentile`` aggregates a bounded-memory
    quantile summary (Greenwald-Khanna style) with map-side partial
    merge, so per-group state is O(accuracy), independent of group
    cardinality. Its error is RANK-based: ≤ n/accuracy ranks, i.e.
    relative rank error ≤ 1e-4 at accuracy 10,000. The gate checks
    each sketch value lies inside the EXACT percentile bracket at
    rank ±0.01 — a 100× margin over the guarantee — and emits one
    flag row per group; the oracle asserts every flag. The sketch's
    merge order may vary run to run, but any run satisfies the
    guarantee, so the flags are deterministic where raw values are
    not. Numeric error bands vs the exact twin stay in
    tests/test_relational.py.

    Small-group floor (r12 advice #1): the bracket bounds come from
    Spark's INTERPOLATED exact percentile, while the sketch returns a
    rank-nearest DATA VALUE — for groups where 0.01·n is under a
    couple of ranks and values have gaps, an exact sketch value can
    fall outside the interpolated bracket (a 2-row group [0,100]:
    approx p50 = 0, lo = percentile(0.49) = 49 — false red). Groups
    below 200 rows pass unconditionally: at accuracy 10,000 the sketch
    is EXACT for any group under 10,000 rows, so the floor waives only
    the bracket's interpolation artifact, never a sketch error; above
    the floor 0.01·n ≥ 2 ranks and the bracket is sound."""
    ev = load_table(spark, sf_dir, "events")
    acc = 10_000
    cols = ["event_type"]
    aggs = [F.count("value").alias("_n")]
    for q in (25, 50, 75, 95):
        f = q / 100.0
        aggs += [
            F.expr(f"approx_percentile(value, {f}, {acc})").alias(f"a{q}"),
            F.expr(f"percentile(value, {max(f - 0.01, 0.0)})").alias(f"lo{q}"),
            F.expr(f"percentile(value, {min(f + 0.01, 1.0)})").alias(f"hi{q}"),
        ]
    g = ev.groupBy("event_type").agg(*aggs)
    for q in (25, 50, 75, 95):
        cols.append(
            (
                (F.col("_n") < 200)
                | (
                    (F.col(f"a{q}") >= F.col(f"lo{q}"))
                    & (F.col(f"a{q}") <= F.col(f"hi{q}"))
                )
            ).cast("int").alias(f"p{q}_ok")
        )
    return g.select(*cols)


@workload(
    "media_binary_meta",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def media_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing with a real oracle: documents' text
    encoded to bytes stands in for media blobs; metadata extraction is
    the same JVM-side path a real media table would use."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("blob")
    )
    return multimodal.attach_binary_metadata(blobs, "blob").select(
        "media_id", "n_bytes", "sha256"
    )


@workload(
    "events_asof_join",
    """
    WITH v0 AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'view'
    ),
    v AS (SELECT user_id, ts, event_id FROM v0 WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts)::BIGINT AS ts_us,
           v.event_id AS view_event_id,
           epoch_us(v.ts)::BIGINT AS view_ts_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the user's LATEST view at or
    before it (the trades⋈quotes shape). Engine plan: union +
    carry-forward window — ONE shuffle on user_id, no range cross
    join; DuckDB's native ASOF LEFT JOIN is the oracle. The right side
    is deduped to one row per (user, ts) so both engines' pick is
    deterministic."""
    from prefixtree_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events")
    views = _latest_per_user_ts(
        events.where("event_type = 'view'").select("user_id", "ts", "event_id")
    )
    purchases = events.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        right_cols=["event_id", "ts"],
        suffix="_v",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id_v").alias("view_event_id"),
        F.unix_micros("ts_v").alias("view_ts_us"),
    )


@workload(
    "events_range_join",
    """
    WITH s AS (
      SELECT event_id AS signup_id, user_id,
             epoch_us(ts)::BIGINT AS lo,
             epoch_us(ts)::BIGINT + 7200000000 AS hi
      FROM events WHERE event_type = 'signup'
    ),
    c AS (
      SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, s.signup_id
    FROM c JOIN s
      ON c.user_id = s.user_id AND c.ts_us >= s.lo AND c.ts_us < s.hi
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment: clicks landing inside a 2-hour window
    after the same user's signup. Engine plan: bucketed overlap
    equi-join (bucket = 1 hour ⇒ ≤3 bucket rows per interval) + exact
    range filter — never the broadcast-nested-loop θ-join the naive
    formulation plans; oracle is the plain inequality join."""
    from prefixtree_spark.operators.relational import range_join

    events = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    signups = events.where("event_type = 'signup'").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.unix_micros("ts").alias("lo"),
        (F.unix_micros("ts") + 2 * hour_us).alias("hi"),
    )
    clicks = events.where("event_type = 'click'").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    joined = range_join(
        clicks, signups, on="ts_us", lo="lo", hi="hi", by="user_id",
        bucket=hour_us,
    )
    return joined.select("event_id", "signup_id")


@workload(
    "events_hopping_counts",
    """
    WITH starts AS (
      SELECT date_trunc('hour', ts) AS w_start, event_type FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events
    )
    SELECT epoch_us(w_start)::BIGINT AS window_start_us,
           epoch_us(w_start + INTERVAL 2 HOUR)::BIGINT AS window_end_us,
           event_type,
           count(*) AS n_events
    FROM starts
    GROUP BY 1, 2, 3
    """,
)
def events_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows (size 2h, slide 1h): every event counts toward
    2 overlapping windows. Spark's ``window()`` generates the window
    set per row before aggregating; the oracle materializes the same
    two window starts with a UNION ALL."""
    return relational.hopping_counts(
        load_table(spark, sf_dir, "events"), size="2 hours", slide="1 hour"
    )


@workload(
    "events_props_json",
    """
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k_value,
           CAST(props->>'missing' AS VARCHAR) AS absent
    FROM events
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: typed fields out of the JSON
    ``props`` column via ONE schema'd ``from_json`` pass per row;
    absent paths yield NULL (permissive), certified against DuckDB's
    JSON operators."""
    ev = load_table(spark, sf_dir, "events")
    return relational.extract_json(
        ev, "props", {"k": "bigint", "missing": "string"}
    ).select(
        "event_id",
        F.col("k").alias("k_value"),
        F.col("missing").alias("absent"),
    )


@workload(
    "events_topk",
    """
    SELECT event_type, rank, event_id, value FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rank
      FROM events
    ) WHERE rank <= 10
    """,
)
def events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type top-10 events by value — the BATCH twin of
    ``streaming/topk.streaming_topk`` (total order: value DESC,
    event_id ASC; the stream==batch equality is pinned in
    tests/test_streaming_topk.py). Raw parquet doubles pass through
    both engines unchanged, so hashing them is bit-safe."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("event_type", F.col("rank").cast("long").alias("rank"), "event_id", "value")
    )


@workload(
    "events_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY event_type
    """,
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type user cardinality — the oracle-able twin of the
    HLL sketch path below."""
    ev = load_table(spark, sf_dir, "events")
    return relational.distinct_counts(ev, "event_type", "user_id").select(
        "event_type", "n_exact"
    )


@workload(
    "events_distinct_users_approx",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_exact,
           CAST(1 AS INT) AS sketch_ok
    FROM events GROUP BY event_type
    """,
)
def events_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch cardinality next to the exact count — the
    100 TB path (fixed-size mergeable state, one sketch shuffle) —
    hash-gated (r12; this row was rows-only): ``n_exact`` is hashed
    exactly against the SQL count, and the sketch must land within
    ±10% of it (rsd=0.02 → 5σ — effectively certain for a working
    HLL++, broken for a corrupted one) or within ±5 absolute for tiny
    groups, where the sparse-mode sketch is exact anyway. Numeric
    error bands stay in tests/test_relational.py."""
    ev = load_table(spark, sf_dir, "events")
    out = relational.distinct_counts(ev, "event_type", "user_id", rsd=0.02)
    tol = F.greatest(0.1 * F.col("n_exact"), F.lit(5.0))
    return out.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact")) <= tol
        ).cast("int").alias("sketch_ok"),
    )


@workload(
    "events_frequent_types",
    """
    SELECT event_type AS value, count(*) AS n,
           round(count(*)::DOUBLE / (SELECT count(*) FROM events), 6) AS share
    FROM events GROUP BY event_type
    HAVING count(*) >= (SELECT count(*) FROM events) * 0.05
    """,
)
def events_frequent_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (share ≥ 5%) over event types — output is
    bounded at 1/min_share rows regardless of input scale."""
    ev = load_table(spark, sf_dir, "events")
    return relational.frequent_items(ev, "event_type", min_share=0.05)


@workload(
    "customer_pseudonymized",
    """
    SELECT c_custkey,
           sha256('pepper7' || c_name) AS c_name,
           sha256('pepper7' || c_nationkey::VARCHAR) AS c_nationkey,
           c_mktsegment
    FROM customer
    """,
)
def customer_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-SHA256 pseudonymization of PII columns; digests are
    deterministic per (salt, value), certified cross-engine."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    return relational.pseudonymize(c, ["c_name", "c_nationkey"], salt="pepper7")


@workload(
    "events_asof_forward",
    """
    WITH v0 AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'view'
    ),
    v AS (SELECT user_id, ts, event_id FROM v0 WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts)::BIGINT AS ts_us,
           v.event_id AS view_event_id,
           epoch_us(v.ts)::BIGINT AS view_ts_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase picks up the user's EARLIEST view
    at or after it (follow-up attribution). Same single-shuffle
    union+carry plan, mirrored ordering; DuckDB ASOF with ``<=`` is
    the oracle."""
    from prefixtree_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events")
    views = _latest_per_user_ts(
        events.where("event_type = 'view'").select("user_id", "ts", "event_id")
    )
    purchases = events.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases.withColumnRenamed("event_id", "p_event_id"),
        views.withColumnRenamed("event_id", "view_event_id"),
        on="ts", by="user_id", right_cols=["view_event_id", "ts"],
        direction="forward",
    )
    return joined.select(
        F.col("p_event_id").alias("event_id"),
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("view_event_id_r").alias("view_event_id"),
        F.unix_micros("ts_r").alias("view_ts_us"),
    )


# Tiny valid image headers (hex): dims/channels parseable from header
# bytes alone — see multimodal.sniff_image_meta. Payload text appended
# after the header stands in for image data.
_HDR_PNG = "89504E470D0A1A0A0000000D4948445200000040000000300806000000"  # 64x48 RGBA
_HDR_GIF = "4749463839614001C800000000"  # 320x200
_HDR_BMP = "424D00000000000000003600000028000000640000003200000001000800"  # 100x50 8-bit
_HDR_JPG = "FFD8FFC000110801E0028003011100021101031101"  # 640x480 3-comp


@workload(
    "media_image_dims",
    f"""
    SELECT doc_id AS media_id,
           CASE (doc_id % 4)::INT WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                                  WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
           CASE (doc_id % 4)::INT WHEN 0 THEN 64 WHEN 1 THEN 320
                                  WHEN 2 THEN 100 ELSE 640 END AS width,
           CASE (doc_id % 4)::INT WHEN 0 THEN 48 WHEN 1 THEN 200
                                  WHEN 2 THEN 50 ELSE 480 END AS height,
           CASE (doc_id % 4)::INT WHEN 0 THEN 4 WHEN 1 THEN 3
                                  WHEN 2 THEN 1 ELSE 3 END AS channels,
           octet_length(
             CASE (doc_id % 4)::INT
               WHEN 0 THEN unhex('{_HDR_PNG}') WHEN 1 THEN unhex('{_HDR_GIF}')
               WHEN 2 THEN unhex('{_HDR_BMP}') ELSE unhex('{_HDR_JPG}')
             END || encode(text)) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
)
def media_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only image metadata, oracled cross-engine: every doc
    becomes a blob with a REAL (PNG/GIF/BMP/JPEG) header followed by
    the text payload; ``decode_image_meta`` parses dimensions from the
    header bytes alone (no codec), and DuckDB reconstructs the same
    blobs to check format/width/height/channels/n_bytes exactly."""
    docs = load_table(spark, sf_dir, "documents")
    header = F.unhex(
        F.when(F.col("doc_id") % 4 == 0, F.lit(_HDR_PNG))
        .when(F.col("doc_id") % 4 == 1, F.lit(_HDR_GIF))
        .when(F.col("doc_id") % 4 == 2, F.lit(_HDR_BMP))
        .otherwise(F.lit(_HDR_JPG))
    )
    blobs = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode("text", "UTF-8")).alias("blob"),
    )
    return multimodal.decode_image_meta(blobs, "media_id", "blob").select(
        "media_id", "format", "width", "height", "channels", "n_bytes"
    )


@workload(
    "events_pivot_types",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events GROUP BY user_id
    """,
)
def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-format pivot with an EXPLICIT value list (no inference
    scan, no data-decided schema width): one hash aggregate with
    map-side partials, one conditional accumulator per output column."""
    ev = load_table(spark, sf_dir, "events")
    return relational.pivot_counts(
        ev, "user_id", "event_type",
        ["click", "error", "purchase", "signup", "view"],
    )


@workload(
    "events_resampled_hourly",
    """
    WITH o0 AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events
    ),
    obs AS (SELECT user_id, ts, value FROM o0 WHERE rn = 1),
    bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
      FROM bounds
    )
    SELECT g.user_id, epoch_us(g.ts)::BIGINT AS ts_us, o.value AS value_r
    FROM grid g ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.ts >= o.ts
    """,
)
def events_resampled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling of each user's event stream
    (carry-forward), oracled against DuckDB generate_series + native
    ASOF JOIN. Observations deduped to one per (user, ts) first —
    asof carries require unique keys for determinism."""
    ev = load_table(spark, sf_dir, "events")
    obs = _latest_per_user_ts(ev).select("user_id", "ts", "value")
    out = relational.resample_carry_forward(
        obs, ts_col="ts", by_col="user_id", value_cols=["value"], step="1 hour"
    )
    return out.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value_r"
    )


# Tiny valid audio/video headers (hex) — channels/rate/duration are
# all parseable from the header bytes (multimodal.sniff_audio_meta /
# sniff_video_meta); payload text appended after stands in for samples.
_HDR_WAV_ST = "524946464462050057415645666D7420100000000100020044AC000010B10200040010006461746120620500"  # stereo 44.1k, 2.0s
_HDR_WAV_16K = "524946462477010057415645666D74201000000001000100803E0000007D0000020010006461746100770100"  # mono 16k, 3.0s
_HDR_WAV_8K = "52494646649C000057415645666D74201000000001000100401F0000401F00000100080064617461409C0000"  # mono 8k, 5.0s
_HDR_MP4 = "000000106674797069736F6D00000000000000246D6F6F760000001C6D766864000000000000000000000000000003E800001D4C"  # 7.5s


@workload(
    "media_av_meta",
    f"""
    SELECT doc_id AS media_id,
           CASE (doc_id % 4)::INT WHEN 3 THEN 'mp4' ELSE 'wav' END AS format,
           CASE (doc_id % 4)::INT WHEN 0 THEN 2 WHEN 3 THEN NULL ELSE 1 END AS channels,
           CASE (doc_id % 4)::INT WHEN 0 THEN 44100 WHEN 1 THEN 16000
                                  WHEN 2 THEN 8000 ELSE NULL END AS sample_rate,
           CASE (doc_id % 4)::INT WHEN 0 THEN 2.0 WHEN 1 THEN 3.0
                                  WHEN 2 THEN 5.0 ELSE 7.5 END AS duration_s,
           octet_length(
             CASE (doc_id % 4)::INT
               WHEN 0 THEN unhex('{_HDR_WAV_ST}') WHEN 1 THEN unhex('{_HDR_WAV_16K}')
               WHEN 2 THEN unhex('{_HDR_WAV_8K}') ELSE unhex('{_HDR_MP4}')
             END || encode(text)) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
)
def media_av_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only audio/video metadata, oracled cross-engine: every
    doc becomes a blob with a REAL WAV or MP4 header (three WAV
    layouts + one MP4 mvhd) followed by the text payload;
    ``decode_av_meta`` parses channels/sample-rate/duration from the
    container headers alone, and DuckDB reconstructs the same blobs to
    check every column exactly."""
    docs = load_table(spark, sf_dir, "documents")
    header = F.unhex(
        F.when(F.col("doc_id") % 4 == 0, F.lit(_HDR_WAV_ST))
        .when(F.col("doc_id") % 4 == 1, F.lit(_HDR_WAV_16K))
        .when(F.col("doc_id") % 4 == 2, F.lit(_HDR_WAV_8K))
        .otherwise(F.lit(_HDR_MP4))
    )
    blobs = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode("text", "UTF-8")).alias("blob"),
    )
    return multimodal.decode_av_meta(blobs, "media_id", "blob").select(
        "media_id", "format", "channels", "sample_rate", "duration_s", "n_bytes"
    )


@workload(
    "events_cohort_retention",
    """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_period
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_period
      FROM events
    )
    SELECT epoch_us(c.cohort_period)::BIGINT AS cohort_us,
           epoch_us(a.activity_period)::BIGINT AS activity_us,
           count(*) AS n_users
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream — first-activity
    cohorts x activity periods with distinct-user counts."""
    ev = load_table(spark, sf_dir, "events")
    out = relational.cohort_retention(ev, user_col="user_id", ts_col="ts")
    return out.select(
        F.unix_micros("cohort_period").alias("cohort_us"),
        F.unix_micros("activity_period").alias("activity_us"),
        "n_users",
    )


@workload(
    "events_attribution",
    """
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           epoch_us(p.ts)::BIGINT AS purchase_ts_us,
           epoch_us(v.ts)::BIGINT AS view_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 60 MINUTES
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution join (purchases x prior views within an hour, same
    user) — the batch twin of the watermarked stream-stream join in
    streaming/joins.py; both compute this exact row set."""
    ev = load_table(spark, sf_dir, "events")
    return relational.attribution_join(ev, window_minutes=60)
