#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
and compares: column names (sorted), dtypes, row count, and values
(rows sorted by all columns). Strict — any mismatch is listed.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"EXEC: {e}"))
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"COLS: spark={list(g.columns)} duck={list(w.columns)}"))
            continue
        if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
            failures.append((name, f"DTYPES: spark={dict(g.dtypes.astype(str))} "
                                   f"duck={dict(w.dtypes.astype(str))}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"ROWS: spark={len(g)} duck={len(w)}"))
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1)
            sample = pd.concat(
                [g[idx].head(3).add_suffix("_spark"),
                 w[idx].head(3).add_suffix("_duck")], axis=1)
            failures.append((name, f"VALUES in {bad_cols}:\n{sample.to_string()}"))
            continue
        print(f"  OK {name}: {len(g)} rows")

    print()
    if failures:
        for name, why in failures:
            print(f"FAIL {name}: {why}")
        print(f"\n{len(failures)}/{len(oracles)} queries FAILED")
        return 1
    print(f"all {len(oracles)} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
