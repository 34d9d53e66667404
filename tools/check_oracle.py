#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir under
outDir, run the matching oracle SQL (oracle_sql.json) in DuckDB against the
sf parquet tables, then compare to the Spark parquet dump (columns sorted by
name, rows sorted, values compared with small float tolerance)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only, exclude = None, None
if len(sys.argv) > 3:
    if sys.argv[3].startswith("^"):       # run the COMPLEMENT (gate mode)
        exclude = set(sys.argv[3][1:].split(","))
    else:
        only = sys.argv[3].split(",")
con = duckdb.connect()
# the iterative-CTE oracles thrash at high thread counts (sys time ~=
# user time at 32 threads); the sf0.1 gate caps them (2.2x less CPU for
# ~17% wall on the heaviest row)
if os.environ.get("GRAFT_ORACLE_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # Spark directory layout (e.g. SeedGen output)
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
oracle_secs = {}
import time
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    if exclude and name in exclude: continue
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        results[name] = "MISSING_SPARK_OUTPUT"
        print(f"[progress] {name}: {results[name]}", flush=True)
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{pdir}/*.parquet"))])
        t0 = time.time()
        duck_df = con.execute(sql).fetchdf()
        oracle_secs[name] = time.time() - t0
    except Exception as e:
        results[name] = f"ERROR: {str(e)[:200]}"
        print(f"[progress] {name}: {results[name]}", flush=True)
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        results[name] = f"SCHEMA: spark={list(s.columns)} duck={list(d.columns)}"; continue
    if len(s) != len(d):
        results[name] = f"ROWS: spark={len(s)} duck={len(d)}"; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    ok = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            dv = pd.to_numeric(dv, errors="coerce").astype(float)
            bad = ~(np.isclose(sv, dv, rtol=0, atol=1e-9) | (sv.isna() & dv.isna()))
        else:
            try:
                bad = ~((sv == dv) | (sv.isna() & dv.isna()))
            except Exception:
                bad = sv.astype(str) != dv.astype(str)
        if bad.any():
            i = bad.idxmax()
            results[name] = f"VALUE col={c} row={i}: spark={s[c][i]!r} duck={d[c][i]!r} (n_bad={bad.sum()})"
            ok = False; break
    if ok:
        results[name] = f"OK ({len(s)} rows)"
    print(f"[progress] {name}: {results[name]}"
          + (f" [{oracle_secs[name]:.1f}s oracle]" if name in oracle_secs else ""),
          flush=True)

width = max(len(k) for k in results)
nok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in sorted(results.items()):
    print(f"{k:<{width}}  {v}")
print(f"\n{nok}/{len(results)} OK")
if nok < len(results):
    print("\nNON-OK ROWS:")
    for k, v in sorted(results.items()):
        if not v.startswith("OK"):
            print(f"  {k:<{width}}  {v}")
if oracle_secs:
    total = sum(oracle_secs.values())
    print(f"\noracle wall total: {total:.1f} s; 15 heaviest:")
    for k, v in sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:<{width}}  {v:7.1f} s")
sys.exit(0 if nok == len(results) else 1)
