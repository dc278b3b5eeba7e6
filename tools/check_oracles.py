"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir, compare row count, column names, and order-insensitive
values (exact).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from codedup.queries import ORACLES, QUERIES
    from codedup.session import build_session

    spark = build_session("local[8]", app_name="oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in ORACLES:
            # non-SQL-expressible op: the driver records a rows-only
            # check; mirror that here
            print(f"OK  {name:28s} rows={len(sdf):6d} spark={t_spark:5.1f}s "
                  f"duck=  n/a  (rows-only: no oracle)")
            continue
        t0 = time.time()
        ddf = con.sql(ORACLES[name]).df()
        t_duck = time.time() - t0
        status = []
        if len(sdf) != len(ddf):
            status.append(f"ROWS {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            status.append(f"COLS {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not status:
            a, b = canon(sdf), canon(ddf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status.append("VALUES " + str(ex).split("\n")[0])
                merged = a.merge(b, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
        ok = "OK " if not status else "FAIL"
        print(f"{ok} {name:28s} rows={len(sdf):6d} spark={t_spark:5.1f}s duck={t_duck:5.1f}s {' '.join(status)}")
        failures += bool(status)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
