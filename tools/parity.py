#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from the verify out dir, runs each oracle against
DuckDB views over the sfDir parquet tables, and compares with the Spark
result parquet (sorted columns, sorted rows, exact values).
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single files; ScaleGen/TpchGen growth
        # dirs are Spark-written DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if len(a) == 0:
            print(f"WARN {name}: both empty (passes, but weak)"); n_pass += 1; continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    eq = np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                    exact = eq.all()
                    close = np.isclose(av.astype(float), bv.astype(float), rtol=1e-12, atol=1e-12, equal_nan=True).all()
                    if not exact:
                        bad.append((c, "float-inexact" if close else "float-differs"))
                else:
                    if not av.astype(str).equals(bv.astype(str)):
                        bad.append((c, "differs"))
            except Exception as e:
                bad.append((c, f"cmp-error {e}"))
        if bad:
            print(f"FAIL {name}: {bad}")
            for c, _ in bad[:2]:
                m = (a[c].astype(str) != b[c].astype(str))
                idx = list(np.where(m)[0][:3])
                for i in idx:
                    print(f"  row{i} {c}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
