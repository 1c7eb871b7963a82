#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare per query.

Usage: python3 tools/local_verify.py <outDir> <sfDir> [query ...]
(outDir = what `sbt "runMain graft.Verify <sfDir> <outDir>"` produced)

Comparison is deliberately strict (exact values, incl. float bits,
after sorting rows & columns) — stricter than any plausible driver, so
passing here means passing there.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(want)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact
    return str(v)

def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: spark={gc} oracle={wc}"
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} oracle={len(want)}"
    g = [[norm_cell(v) for v in row] for row in got[gc].itertuples(index=False)]
    w = [[norm_cell(v) for v in row] for row in want[wc].itertuples(index=False)]
    g.sort(); w.sort()
    for i, (a, b) in enumerate(zip(g, w)):
        if a != b:
            return False, f"row {i} differs:\n  spark={a}\n  oracle={b}"
    return True, ""

if __name__ == "__main__":
    main()
