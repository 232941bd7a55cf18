#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/local_verify.py <sfDir> <verifyOut> [name ...]

Reads <verifyOut>/oracle_sql.json (written by graft.Verify), registers the
sfDir parquet tables in DuckDB, runs each oracle SQL, and compares against
<verifyOut>/<name>/ parquet the same way the driver does: sort columns by
name, sort rows, hash values with light float rounding.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    rows = sorted(tuple(norm(v) for v in r) for r in df.itertuples(index=False))
    return "\n".join("|".join(r) for r in rows)


def main():
    sf_dir, out_dir, *names = sys.argv[1:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    todo = names or sorted(oracle)
    n_pass = n_fail = 0
    for name in todo:
        if name not in oracle:
            print(f"{name}: NO ORACLE (rows-only check)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"{name}: SCHEMA {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"{name}: ROWS {len(got)} vs {len(want)}")
            n_fail += 1
        elif canon(got) != canon(want):
            print(f"{name}: HASH mismatch ({len(got)} rows)")
            n_fail += 1
        else:
            print(f"{name}: pass ({len(got)} rows)")
            n_pass += 1
            continue
    print(f"== {n_pass} pass, {n_fail} fail, {len(todo)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
