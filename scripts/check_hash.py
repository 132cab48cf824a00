#!/usr/bin/env python3
"""Stricter local mimic of the driver's hash gate.

Usage: python3 scripts/check_hash.py <verify_out_dir> <sf_dir> [query...]

Unlike check_oracle.py (tolerant value equality), this canonicalizes each
cell to a string the way a hashing driver plausibly would (str() of the
python object after pandas read), sorts columns by name and rows by all
columns, then md5s the whole frame. Reports first differing cells with
dtypes so representation mismatches (float32 vs float64, int32 vs int64,
NaN vs None, -0.0, timestamp precision) are visible.
Verification tooling only — the library itself never uses Python.
"""
import json, math, sys, glob, os, hashlib
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_cell(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NULL"  # driver may treat NaN as NULL or not; flag separately
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        if math.isnan(f): return "NULL"
        return repr(f)
    if isinstance(v, (np.integer,)): return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes): return v.hex()
    try:
        if pd.isna(v): return "NULL"
    except (TypeError, ValueError): pass
    return str(v)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame({c: [canon_cell(v) for v in df[c]] for c in df.columns})
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def frame_hash(df):
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()

def main(outdir, sfdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    qdirs = sorted(d for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    n_pass = n_fail = 0
    for qd in qdirs:
        name = os.path.basename(qd)
        if only and name not in only: continue
        files = glob.glob(os.path.join(qd, "*.parquet"))
        if not files or name not in oracle: continue
        spark_raw = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            want_raw = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"!! {name}: oracle SQL failed: {e}"); n_fail += 1; continue
        got, want = norm(spark_raw), norm(want_raw)
        hg, hw = frame_hash(got), frame_hash(want)
        if hg == hw:
            n_pass += 1
            continue
        n_fail += 1
        print(f"XX {name}: hash mismatch ({len(got)} vs {len(want)} rows)")
        sdt = {c: str(spark_raw[c].dtype) for c in sorted(spark_raw.columns)}
        wdt = {c: str(want_raw[c].dtype) for c in sorted(want_raw.columns)}
        for c in sdt:
            if sdt[c] != wdt.get(c):
                print(f"   dtype {c}: spark={sdt[c]} oracle={wdt.get(c)}")
        shown = 0
        for i in range(min(len(got), len(want))):
            for c in got.columns:
                if got.at[i, c] != want.at[i, c]:
                    print(f"   row{i} {c}: spark={got.at[i,c]!r} oracle={want.at[i,c]!r}")
                    shown += 1
                    break
            if shown >= 5: break
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
