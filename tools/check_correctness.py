"""Local stand-in for the driver's CORRECTNESS gate: runs each
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` through
DuckDB on the same parquet tables, compares row count, schema (column
names), and order-insensitive values (columns sorted by name).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonical form: driver hashes values; unify dtypes across engines
    out = df.copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype("int64")
        else:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from prefixtree_spark import workloads
    from prefixtree_spark.session import get_spark
    from prefixtree_spark.sources.tables import TABLES

    spark = get_spark("correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(got)} (no oracle) {t_spark:.1f}s")
            continue
        guard = workloads.ORACLE_GUARDS.get(name)
        if guard is not None:
            guard_sql, expected = guard
            if str(con.sql(guard_sql).fetchone()[0]) != expected:
                # fixture oracle from a different corpus: rows-only,
                # not a false FAIL (r11 advice)
                print(
                    f"weak  {name}: rows={len(got)} "
                    f"(oracle scoped to another corpus) {t_spark:.1f}s"
                )
                continue
        t0 = time.time()
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        t_duck = time.time() - t0
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: schema {sorted(got.columns)} != {sorted(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if not g.equals(e):
            if list(g.dtypes) != list(e.dtypes):
                # e.g. DuckDB sum() -> HUGEINT -> pandas float64 vs
                # Spark int64: values can compare equal elementwise
                # while the hash/dtype differs — name the real culprit
                bad = [
                    f"{c}: spark={g[c].dtype} oracle={e[c].dtype}"
                    for c in g.columns
                    if g[c].dtype != e[c].dtype
                ]
                print(f"FAIL  {name}: dtype mismatch ({'; '.join(bad)})")
                failures += 1
                continue
            diff = (g != e).any(axis=1)
            print(f"FAIL  {name}: values differ in {int(diff.sum())}/{len(g)} rows")
            print(pd.concat([g[diff].head(3), e[diff].head(3)]))
            failures += 1
            continue
        print(f"ok    {name}: rows={len(got)} spark={t_spark:.1f}s duckdb={t_duck:.1f}s")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
