"""Round-14 quiet A/B probe: time catalog workload entries on an
arbitrary package tree (current repo vs an extracted past commit), a
FRESH session per entry, 1 cold + N warm runs, quiet machine.

Used for the r13-verdict attributions:
  - fuzzy_join_damerau (driver 2.36 s vs 1.70 r12 on changed dl_batch
    code, builder A/B said -25% — re-attribute same-epoch)
  - ann_topk_ivf / ann_topk_int8 (driver 0.65x/0.82x on UNTOUCHED code)

Usage:
  python tools/quiet_probe_r14.py <sf_dir> <tree_root> <entry> [<entry>...]

Prints one JSON line per entry. Interleave invocations of the two
trees A/B/A/B from a driver shell so both see the same machine epoch.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_SF = sys.argv[1]
_TREE = os.path.abspath(sys.argv[2])
_ENTRIES = sys.argv[3:]
sys.path.insert(0, _TREE)


def main() -> None:
    from prefixtree_spark import workloads, workloads_ext, workloads_rel  # noqa: F401
    from prefixtree_spark.session import get_spark

    for name in _ENTRIES:
        spark = get_spark(f"probe_{name}")
        spark.sparkContext.setLogLevel("ERROR")
        fn = workloads.QUERIES[name]
        runs = []
        for _ in range(1 + 6):
            t0 = time.time()
            n = fn(spark, _SF).count()
            runs.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "entry": name,
                    "tree": _TREE,
                    "rows": n,
                    "cold": runs[0],
                    "warm_median": round(statistics.median(runs[1:]), 3),
                    "warm_min": min(runs[1:]),
                    "warm_max": max(runs[1:]),
                    "runs": runs,
                }
            ),
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
