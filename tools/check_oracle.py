#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the fixture tables, normalizes
(sort columns by name, sort rows by everything), and diffs. Dev tool only —
the shipped Scala library does not depend on this.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to comparable primitives
    def canon(v):
        if isinstance(v, (list, np.ndarray)):
            return tuple(canon(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, canon(x)) for k, x in v.items()))
        if isinstance(v, pd.Timestamp):
            return v.floor("us").isoformat()
        if isinstance(v, float):
            return float(v)
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return None
        return v
    out = df.apply(lambda c: c.map(canon))
    out = out.sort_values(by=list(out.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        path = f"{outdir}/{name}"
        if not os.path.isdir(path):
            print(f"  {name}: MISSING spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  sorted(glob.glob(f"{path}/*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            print(f"  {name}: SPARK READ FAIL {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE FAIL {str(e)[:200]}"); n_fail += 1; continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  {name}: COLS differ spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"  {name}: ROWS differ spark={len(a)} duck={len(b)}")
            n_fail += 1; continue
        if a.equals(b):
            print(f"  {name}: OK ({len(a)} rows)"); n_pass += 1
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"  {name}: VALUE MISMATCH cols={bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"      row {i} col {c}: spark={a[c][i]!r} duck={b[c][i]!r}")
            n_fail += 1
    print(f"PASS {n_pass} / FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
