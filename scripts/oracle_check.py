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
            cur = con.execute(f"SELECT * FROM read_parquet('{files[0]}')")
            gcols = [d[0] for d in cur.description]
            got = cur.fetchall()
            cur = con.execute(sql)
            wcols = [d[0] for d in cur.description]
            want = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} vs {sorted(wcols)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # reorder columns by sorted name (driver semantics)
        gidx = [gcols.index(c) for c in sorted(gcols)]
        widx = [wcols.index(c) for c in sorted(wcols)]
        ok = True
        for i, (gr, wr) in enumerate(zip(got, want)):
            for j, (gi, wi) in enumerate(zip(gidx, widx)):
                x, y = gr[gi], wr[wi]
                same = (x == y) or (x is None and y is None) \
                    or (isinstance(x, float) and isinstance(y, float)
                        and math.isnan(x) and math.isnan(y))
                if not same and str(x) == str(y):
                    same = True
                if not same:
                    print(f"FAIL {name}: col {sorted(gcols)[j]} row {i}: spark={x!r} duckdb={y!r}")
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
