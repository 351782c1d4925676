"""Python worker daemon that preloads the scientific stack before
forking (set as ``spark.python.daemon.module`` by ``session.get_spark``).

Why: every kernel in this engine crosses the Python boundary through
Arrow (pandas UDFs / mapInPandas), so the FIRST task wave of a session
forks one Python worker per core and each fork then pays a full
``import pandas`` + ``import pyarrow`` (~0.6-0.9 s each, all forks
contending for the same page cache and GIL-free CPU). Importing the
stack ONCE in the daemon parent means every forked worker inherits the
already-initialized modules through copy-on-write pages — the fork
itself stays microseconds and the first-query ("cold") cost drops by
the whole import wave. At cluster scale the same wave repeats per
executor per session; preloading is strictly cheaper there too (one
import per executor instead of one per worker).

Correctness: identical to the stock ``pyspark.daemon`` — this module
only imports libraries the workers would import anyway and then hands
off to the stock manager loop. If any import fails the daemon still
starts (workers import lazily as before).
"""

from __future__ import annotations

import importlib

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.parquet"):
    try:
        importlib.import_module(_mod)
    except Exception:  # pragma: no cover - defensive: never block startup
        pass

# the engine's own kernels (traversal DP, damerau, dedup signatures)
# are imported by reference from worker tasks; warming them here makes
# their first call on every forked worker free as well
for _mod in (
    "prefixtree_spark.functions.levenshtein",
    "prefixtree_spark.functions.damerau",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # pragma: no cover
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
