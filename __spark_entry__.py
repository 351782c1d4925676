"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (misspelled-customer-name fuzzy join
through the prefix-tree engine) at sf0.001; ``queries`` /``oracle_sql``
expose every implemented workload from the catalog in
``prefixtree_spark.workloads`` for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prefixtree_spark import workloads
from prefixtree_spark import workloads_ext  # noqa: F401  (registers entries)
from prefixtree_spark import workloads_rel  # noqa: F401  (registers entries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workloads.fuzzy_join_customer(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workloads.ORACLES)
