#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOut]

Runs every oracle_sql.json query in DuckDB over the testdata parquet,
reads the corresponding Spark parquet dump, sorts columns by name and
rows by all columns, and compares values (exact for strings/ints,
tiny-epsilon for floats to mirror a hash on rounded values).
"""
import sys, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    got = duckdb.connect().execute(f"SELECT * FROM read_parquet({files!r})").df()
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        fails.append(name)
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        continue
    if len(want) != len(got):
        fails.append(name)
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        continue
    want = want.sort_values(by=list(want.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    bad = None
    for c in want.columns:
        w, g = want[c], got[c]
        # DTYPE GATE: an int-vs-float kind mismatch means the oracle SQL
        # returned a widened numeric type (DuckDB sum(BIGINT) -> HUGEINT,
        # which pandas renders float64) while Spark returned an integer.
        # The driver's hash compare is exact on the rendered value
        # (123.0 != 123), so the epsilon branch below would pass locally
        # while the driver fails — fail HERE instead (the r12
        # q_bpe_train class; fix is CAST(... AS BIGINT) in the oracle).
        kinds = {w.dtype.kind, g.dtype.kind}
        if "f" in kinds and kinds & {"i", "u"}:
            bad = (c, f"dtype mismatch: oracle {w.dtype} vs spark {g.dtype}"
                      " — cast the oracle column (e.g. CAST(x AS BIGINT))",
                   "")
            break
        if w.dtype.kind == "f" or g.dtype.kind == "f":
            diff = (w.astype(float) - g.astype(float)).abs()
            if (diff > 1e-9).any():
                bad = (c, w[diff > 1e-9].head(3), g[diff > 1e-9].head(3)); break
        else:
            if (w.astype(str) != g.astype(str)).any():
                m = w.astype(str) != g.astype(str)
                bad = (c, w[m].head(3), g[m].head(3)); break
    if bad:
        fails.append(name)
        print(f"FAIL {name}: col {bad[0]}\n want:\n{bad[1]}\n got:\n{bad[2]}")
    else:
        print(f"ok   {name} ({len(want)} rows)")

nonoracle = [d.split("/")[-1] for d in glob.glob(f"{out}/q_*") if d.split("/")[-1] not in oracle]
print(f"\nrows-only (no oracle): {sorted(nonoracle)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
