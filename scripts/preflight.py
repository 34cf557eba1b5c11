#!/usr/bin/env python3
"""Pre-flight oracle check (dev-only, mirrors the driver's t2 compare).

Usage: python3 scripts/preflight.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, loads the Spark parquet dump for the same key, sorts
columns by name and rows by all columns, and diffs values. Exit 1 on any
mismatch. This script is a dev tool only — the engine itself is pure Scala.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if len(sys.argv) > 3:  # optional comma-separated key subset
        keys = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keys}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for key, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: duckdb error: {e}")
            failed.append(key)
            continue
        parts = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not parts:
            print(f"FAIL {key}: no spark output at {out_dir}/{key}")
            failed.append(key)
            continue
        spark = pq.read_table(parts).to_pandas()
        d_cols, s_cols = sorted(duck.columns), sorted(spark.columns)
        if d_cols != s_cols:
            print(f"FAIL {key}: columns differ duck={d_cols} spark={s_cols}")
            failed.append(key)
            continue
        duck, spark = duck[d_cols], spark[s_cols]
        if len(duck) != len(spark):
            print(f"FAIL {key}: rows duck={len(duck)} spark={len(spark)}")
            failed.append(key)
            continue
        d_rows = [tuple(norm(v) for v in r) for r in duck.itertuples(index=False)]
        s_rows = [tuple(norm(v) for v in r) for r in spark.itertuples(index=False)]
        if d_rows != s_rows:
            n_bad = sum(1 for a, b in zip(d_rows, s_rows) if a != b)
            ex = next((a, b) for a, b in zip(d_rows, s_rows) if a != b)
            print(f"FAIL {key}: {n_bad}/{len(d_rows)} rows differ; first: duck={ex[0]} spark={ex[1]}")
            failed.append(key)
            continue
        print(f"OK   {key}: {len(d_rows)} rows")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"\nall {len(oracle)} queries match")

if __name__ == "__main__":
    main()
