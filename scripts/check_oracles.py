"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
schema (column names), and order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
(trailing args restrict the run to the named queries)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from zellige_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> int:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: repr(v))
    rows = sorted(map(tuple, pdf.itertuples(index=False, name=None)))
    return hash(tuple(rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        keep = set(sys.argv[2:])
        unknown = keep - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in keep}
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"{name:24s} {status} rows {len(sdf)}/{len(odf)} cols={ok_cols} values={ok_vals}")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print("  spark:", sorted(sdf.columns), " oracle:", sorted(odf.columns))
            if ok_rows and ok_cols and not ok_vals:
                merged = sdf.merge(odf, how="outer", indicator=True)
                print(merged[merged["_merge"] != "both"].head(10))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
