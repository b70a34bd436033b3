#!/usr/bin/env python3
"""Driver-simulation: compare Verify parquet dumps against DuckDB oracles.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Mimics the round driver: registers each testdata parquet as a DuckDB view,
runs every oracle_sql.json entry, and compares (rows, schema names, sorted
value multiset) against the Spark parquet output.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        import math
        if math.isnan(v):
            return None
        return round(v, 9)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        d_cols = sorted(duck.columns)
        s_cols = sorted(spark.columns)
        if d_cols != s_cols:
            print(f"[SCHEMA] {name}: duck={d_cols} spark={s_cols}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"[ROWS] {name}: duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        dv = sorted(tuple(norm(x) for x in row) for row in duck[d_cols].itertuples(index=False))
        sv = sorted(tuple(norm(x) for x in row) for row in spark[d_cols].itertuples(index=False))
        if dv != sv:
            diffs = [(a, b) for a, b in zip(dv, sv) if a != b][:3]
            print(f"[VALUES] {name}: first diffs {diffs}")
            n_fail += 1
            continue
        print(f"[OK] {name}: {len(duck)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
