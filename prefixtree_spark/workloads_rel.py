"""Relational / window / multimodal workloads with DuckDB oracles.

DECIMAL casts make aggregate sums exact (order-independent) so Spark
and DuckDB agree bit-for-bit after the final cast to double; timestamps
travel as epoch microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prefixtree_spark.operators import multimodal, relational
from prefixtree_spark.sources.tables import load_table
from prefixtree_spark.workloads import workload


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
