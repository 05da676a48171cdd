"""Driver-style correctness gate, run locally: execute every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row-count, column names, and order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.gate import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    from lucene_solr_spark.session import get_spark

    spark = get_spark(app="selfcheck", cpus=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        ng, cg, hg = canon(got)
        ne, ce, he = canon(exp)
        status = "ok" if (ng, cg, hg) == (ne, ce, he) else "MISMATCH"
        print(f"{status:9s}{name}: rows {ng}/{ne} cols {cg == ce} hash {hg == he}  ({time.time()-t0:.1f}s)")
        if status != "ok":
            failures.append(name)
            if cg != ce:
                print(f"   spark cols: {cg}\n   duck  cols: {ce}")
            if hg != he and ng and ne:
                merged = got[sorted(got.columns)].head(5)
                print("   spark head:\n", merged.to_string())
                print("   duck head:\n", exp[sorted(exp.columns)].head(5).to_string())
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
