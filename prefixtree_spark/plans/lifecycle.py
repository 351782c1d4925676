"""Storage lifecycle for checkpointed DataFrames.

``DataFrame.localCheckpoint`` persists its RDD OUTSIDE the cache
manager, so ``DataFrame.unpersist()`` is a silent no-op on it and the
storage survives until (at best) a much-later GC cycle — measured: it
does not drain even after explicit driver+JVM GC. Iterative operators
(bfs levels, star-contraction rounds) would therefore leak one cached
dataset per iteration. This helper reaches the RDD handle on the
``LogicalRDD`` plan node and frees it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame) -> None:
    """Free the executor storage behind a ``localCheckpoint()``-ed
    DataFrame. Call ONLY when the DataFrame will never be read again:
    its lineage was truncated at checkpoint time, so the data is
    unrecoverable afterwards. No-op on non-checkpoint plans."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass
