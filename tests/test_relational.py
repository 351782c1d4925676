"""Relational workload plan checks: the physical plans must be the
ones we'd want at 100 TB (broadcast join for the small dim, top-k as
TakeOrderedAndProject, pushed filters)."""

from pyspark.sql import functions as F

from prefixtree_spark.operators import relational
from prefixtree_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dim_and_takeordered(spark):
    df = relational.top_revenue_orders(
        load_table(spark, SF_SMOKE, "customer"),
        load_table(spark, SF_SMOKE, "orders"),
        load_table(spark, SF_SMOKE, "lineitem"),
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_q1_filter_pushdown(spark):
    df = relational.pricing_summary(load_table(spark, SF_SMOKE, "lineitem"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_scan_column_pruning(spark):
    """A 2-column projection must read 2 columns, not the full schema."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(li)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_sessionize_values(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),
        (3, 100, "2024-01-01 01:10:00"),  # > 30 min gap: new session
        (4, 200, "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "s"]).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in relational.sessionize(ev, gap_minutes=30).collect()
    }
    base = 1704067200000000  # 2024-01-01 00:00:00 UTC µs
    assert got == {
        (100, base, base + 600_000_000, 2),
        (100, base + 4200_000_000, base + 4200_000_000, 1),
        (200, base, base, 1),
    }
