#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<query>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB with the testdata tables
registered as views. Compares: column names (sorted), row count, and
values (rows sorted, NaN-aware).
This script is verification tooling only — the library itself never
uses Python.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes-ish: timestamps to iso strings, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                 (hasattr(v, "__len__") and not isinstance(v, str) and not isinstance(v, bytes)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp_vals(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError): pass
    return a == b

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    qdirs = sorted(d for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    n_pass = n_fail = n_noracle = 0
    for qd in qdirs:
        name = os.path.basename(qd)
        files = glob.glob(os.path.join(qd, "*.parquet"))
        if not files:
            print(f"!! {name}: no spark output"); n_fail += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        if name not in oracle:
            print(f"-- {name}: no oracle (rows-only): {len(got)} rows")
            n_noracle += 1
            continue
        try:
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"!! {name}: oracle SQL failed: {e}"); n_fail += 1; continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"!! {name}: columns differ spark={list(got.columns)} duck={list(want.columns)}"); ok = False
        elif len(got) != len(want):
            print(f"!! {name}: rowcount spark={len(got)} duck={len(want)}"); ok = False
        else:
            for c in got.columns:
                bad = [i for i in range(len(got)) if not cmp_vals(got[c].iloc[i], want[c].iloc[i])]
                if bad:
                    i = bad[0]
                    print(f"!! {name}: col {c} differs at {len(bad)} rows; first row {i}: "
                          f"spark={got[c].iloc[i]!r} duck={want[c].iloc[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"ok {name}: {len(got)} rows"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
