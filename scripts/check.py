#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching oracle_sql.json query in DuckDB over <sfDir>'s tables, then
compares: row count, column names (sorted), and values (rows sorted by all
columns). Reports exact mismatches and max numeric deltas.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tname in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"ROWS  {name}: rows={len(got)} {status}"); n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(ec):
                gv = gc.astype(float).to_numpy(); ev = ec.astype(float).to_numpy()
                both_nan = np.isnan(gv) & np.isnan(ev)
                neq = ~both_nan & (gv != ev)
                if neq.any():
                    d = np.nanmax(np.abs(gv[neq] - ev[neq]))
                    bad.append(f"{c} (maxdiff={d:.3e}, n={neq.sum()})")
            else:
                gs = gc.astype(str); es = ec.astype(str)
                neq = (gs != es) & ~(gc.isna() & ec.isna())
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c} (n={neq.sum()}, e.g. {gc[i]!r} vs {ec[i]!r})")
        if bad:
            print(f"FAIL  {name}: value mismatch: {'; '.join(bad)}"); n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(g)}"); n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
