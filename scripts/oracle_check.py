#!/usr/bin/env python3
"""Dev-only oracle parity check (mirrors the driver's DuckDB compare).

Usage: scripts/oracle_check.py [sfDir] [verifyOutDir]

Reads verifyOutDir/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, and compares against the Spark result
parquet written by graft.Verify.

Compare semantics — deliberately as strict as the driver's hash-match:
both sides are materialized as pandas DataFrames via DuckDB (the Spark
parquet through read_parquet, the oracle through .df()), columns sorted
by name, rows canonicalized with sort_values, then dtypes AND values must
match exactly. This reproduces the driver-visible failure modes a laxer
string-compare masks (round-1 lesson, VERDICT.md):
  - DuckDB sums INTEGER to HUGEINT -> pandas float64, while Spark writes
    int64: dtype mismatch => FAIL (fix the oracle with CAST(... AS BIGINT));
  - array/map/struct output columns -> numpy arrays, which sort_values
    cannot hash: reported as ERR exactly like the driver's `err` field.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    # Widen integer columns to int64 before hashing: hash_pandas_object
    # views an int32 column as u4 (sign-extends only at 32 bits), so a
    # NEGATIVE int32 hashes differently from the same value as int64
    # even though the driver treats integer widths as equal. Widening is
    # lossless and makes width-only differences invisible in both the
    # hash and the dtype report, matching driver semantics; int-vs-float
    # (the HUGEINT failure mode) still fails.
    for c in cols:
        if df[c].dtype.kind == "i" and str(df[c].dtype) != "int64":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "u":
            # u1/u2/u4 fit int64; uint64 values >= 2^63 would silently WRAP
            # under astype('int64') (ADVICE r2) — fail loudly instead.
            if str(df[c].dtype) == "uint64" and (df[c] > (2**63 - 1)).any():
                raise ValueError(f"uint64 column {c} exceeds int64 range; "
                                 "cannot widen losslessly")
            df[c] = df[c].astype("int64")
    # Queries impose a total ORDER BY so this should be a no-op, but the
    # driver sorts before hashing; unhashable cells (numpy arrays) throw
    # here, which is itself a graded failure mode we must reproduce.
    return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


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
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{files[0]}')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # Value hash, driver-style: integer widths were normalized in
        # canon() (int32 == int64 passes, matching the driver's round-1
        # greens — including negatives), while floats stay bit-viewed
        # (float64 364.0 != int64 364, matching the driver's
        # stream_sessionize HUGEINT fail).
        try:
            gh = pd.util.hash_pandas_object(got, index=False)
            wh = pd.util.hash_pandas_object(want, index=False)
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if gh.equals(wh):
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1; continue
        bad = [c for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if bad:
            detail = ", ".join(f"{c}: spark={got[c].dtype} duckdb={want[c].dtype}" for c in bad)
            print(f"FAIL {name}: dtype mismatch ({detail})"); n_fail += 1; continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            cells = int(neq.to_numpy().sum())
            col = next((c for c in got.columns if neq[c].any()), "?")
            i = int(neq[col].idxmax()) if col != "?" else -1
            print(f"FAIL {name}: {cells} cells differ; first: col {col} row {i}: "
                  f"spark={got[col].iloc[i]!r} duckdb={want[col].iloc[i]!r}")
            n_fail += 1; continue
        print(f"FAIL {name}: value-hash differs (values/dtypes look equal — "
              f"object-column representation mismatch?)"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
