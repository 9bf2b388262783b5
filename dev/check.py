#!/usr/bin/env python3
"""Dev mirror of the driver's correctness gate: compare Verify parquet
dumps against the DuckDB oracle SQL. Usage:
  dev/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
  python3 dev/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Fast parse-only gate (validates every rewritten oracle — incl. the
AS MATERIALIZED rewrite — still parses/binds in DuckDB, without running
anything; pair with a no-match Verify filter to refresh the manifest):
  dev/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out __oracles_only__
  python3 dev/check.py /root/testdata/sf0.01 /tmp/verify_out --explain
"""
import sys, json, glob, os
import duckdb
import pandas as pd

explain_only = "--explain" in sys.argv
argv = [a for a in sys.argv if a != "--explain"]
sfdir, outdir = argv[1], argv[2]
only = set(argv[3:])

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0

if explain_only:
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            con.execute(f"EXPLAIN {sql}")
            print(f"OK   {name} (parses)")
        except Exception as e:
            print(f"FAIL {name}: oracle does not parse/bind: {e}")
            fails += 1
    print("ALL OK" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)

for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pq = f"{outdir}/{name}"
    files = glob.glob(f"{pq}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.read_parquet(pq)
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    # order-insensitive value compare (stringify then sort rows)
    gs = sorted(map(tuple, got.astype(str).values.tolist()))
    es = sorted(map(tuple, exp.astype(str).values.tolist()))
    if gs != es:
        bad = [(g, e) for g, e in zip(gs, es) if g != e][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
        fails += 1
        continue
    print(f"OK   {name} ({len(got)} rows)")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
