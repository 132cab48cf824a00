#!/usr/bin/env python3
"""Sweep every declared oracle SQL for driver-hash-hostile result types.

DuckDB widens sum(BIGINT) to HUGEINT; pandas materializes HUGEINT as
float64, so an uncast HUGEINT projection hashes `1050.0` against
Spark's `1050` and goes red even when every value matches (the
w7_gap_fill failure in round 10). This script runs each oracle with a
LIMIT-0 wrapper (schema only — no data scan) and flags HUGEINT /
UHUGEINT / UBIGINT columns so the mismatch is caught at authoring time,
not by the round's hash gate.

Usage: python3 scripts/check_oracle_types.py <verify_out_dir> <sf_dir>
  where <verify_out_dir>/oracle_sql.json was written by graft.Verify.
"""
import json, sys, duckdb

BAD = {"HUGEINT", "UHUGEINT", "UBIGINT"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir: str, sf_dir: str) -> int:
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in BAD]
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            print(f"ERR  {name}: {type(e).__name__}: {str(e).splitlines()[0]}")
            bad += 1
            continue
        if hits:
            bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in hits)
            print(f"BAD  {name}: {cols}")
    print(f"{len(oracles)} oracles swept, {bad} flagged")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
