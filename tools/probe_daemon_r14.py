"""Round-14 cold-start probe: time a fresh session's FIRST Arrow-UDF
query (the dedup_minhash_lsh shape — the bench's first entry, whose
cold/warm ratio the r13 verdict flagged) with and without the
numpy/pandas/pyarrow-preloading Python worker daemon.

The cold run pays, per forked Python worker, a full `import pandas`
(~0.6 s each, 32 forks contending); a daemon module that imports the
scientific stack ONCE before forking shares those pages copy-on-write
with every worker.

Usage: python tools/probe_daemon_r14.py [sf_dir] [preload|stock]
Prints one JSON line. Run alternating variants from a fresh process.
"""

from __future__ import annotations

import json
import os
import sys
import time

_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TREE)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "stock"


def main() -> None:
    if VARIANT == "stock":
        os.environ["PREFIXTREE_DISABLE_DAEMON_PRELOAD"] = "1"
    from prefixtree_spark import workloads, workloads_ext  # noqa: F401
    from prefixtree_spark.session import get_spark

    spark = get_spark("probe_daemon")
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for _ in range(4):
        t0 = time.time()
        n = workloads.QUERIES["dedup_minhash_lsh"](spark, SF).count()
        runs.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "variant": VARIANT,
                "rows": n,
                "cold": runs[0],
                "warm": runs[1:],
                "daemon_module": spark.conf.get(
                    "spark.python.daemon.module", "<default>"
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
