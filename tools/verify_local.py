"""Local stand-in for the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, compare row count, column names, and
order-insensitive values.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from go_fluentd_spark.session import build_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notna(df), None)
    # stringify everything for order-insensitive compare (floats pre-rounded
    # by the queries themselves)
    df = df.map(lambda v: f"{v:.6f}" if isinstance(v, float) else str(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark("verify_local", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failed.append(name)
            continue
        a, b = norm(sdf), norm(ddf)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failed.append(name)
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows spark={len(a)} duck={len(b)}")
            failed.append(name)
            continue
        if not a.equals(b):
            neq = (a.values != b.values).any(axis=1)
            print(f"[FAIL] {name}: {neq.sum()}/{len(a)} rows differ; first diffs:")
            idx = [i for i, x in enumerate(neq) if x][:3]
            for i in idx:
                for c in a.columns:
                    if a.iloc[i][c] != b.iloc[i][c]:
                        print(f"    row{i} {c}: spark={a.iloc[i][c]!r} duck={b.iloc[i][c]!r}")
            failed.append(name)
            continue
        print(f"[OK] {name}: {len(a)} rows, {len(a.columns)} cols")
    print("FAILED:" if failed else "ALL OK", failed or "")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
