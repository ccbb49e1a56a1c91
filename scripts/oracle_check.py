#!/usr/bin/env python3
"""Dev-only oracle parity check (mirrors the driver's DuckDB compare).

Usage: scripts/oracle_check.py [sfDir] [verifyOutDir]

Reads verifyOutDir/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, and compares against the Spark result
parquet written by graft.Verify. Compare semantics (strictest plausible
version of the driver's): sort columns by name, exact value equality,
row order as produced (queries must impose a total ORDER BY).
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y) or (x is None and y is None) \
                    or (isinstance(x, float) and isinstance(y, float)
                        and (x == y or (math.isnan(x) and math.isnan(y))))
                # numpy/py scalar None-vs-NaN mismatch tolerance for missing
                if not same and str(x) == str(y):
                    same = True
                if not same:
                    print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}")
                    ok = False; break
            if not ok: break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
