#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [queryName ...]

Reads <verifyOutDir>/oracle_sql.json, binds the testdata parquet tables as
DuckDB views, runs each oracle, and compares against the Spark parquet dump
in <verifyOutDir>/<name>/ — column names (sorted), row count, and exact
row-set equality (EXCEPT both directions).
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: FAIL (no spark output)")
            failures += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{files[0]}')")
            oracle_rel = con.sql(sql)
            scols = sorted(spark_rel.columns)
            ocols = sorted(oracle_rel.columns)
            if scols != ocols:
                print(f"{name}: FAIL schema {scols} vs {ocols}")
                failures += 1
                continue
            cols = ", ".join(f'"{c}"' for c in scols)
            con.execute(f"CREATE OR REPLACE TEMP TABLE _s AS SELECT {cols} FROM spark_rel")
            con.execute(f"CREATE OR REPLACE TEMP TABLE _o AS SELECT {cols} FROM oracle_rel")
            ns = con.execute("SELECT count(*) FROM _s").fetchone()[0]
            no = con.execute("SELECT count(*) FROM _o").fetchone()[0]
            d1 = con.execute("SELECT count(*) FROM (SELECT * FROM _s EXCEPT ALL SELECT * FROM _o)").fetchone()[0]
            d2 = con.execute("SELECT count(*) FROM (SELECT * FROM _o EXCEPT ALL SELECT * FROM _s)").fetchone()[0]
            if ns != no or d1 or d2:
                print(f"{name}: FAIL rows spark={ns} oracle={no} onlyspark={d1} onlyoracle={d2}")
                if d1 or d2:
                    print("  spark-only:", con.execute(
                        "SELECT * FROM _s EXCEPT ALL SELECT * FROM _o LIMIT 3").fetchall())
                    print("  oracle-only:", con.execute(
                        "SELECT * FROM _o EXCEPT ALL SELECT * FROM _s LIMIT 3").fetchall())
                failures += 1
            else:
                print(f"{name}: OK ({ns} rows)")
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:300]}")
            failures += 1
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
