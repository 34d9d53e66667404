#!/usr/bin/env python3
"""Build the deterministic prefix slice of an sf dir for the sf0.1 gate's
HEAVY oracle rows (tools/sf01_gate.sh): every fact table keeps the first
1/FRACTION of its key space (dimension tables copy whole), so iterative /
super-linear DuckDB oracles (recursive-CTE components, pointer-doubling
critical path, unrolled k-means) verify on a structurally identical but
FRACTION-times-smaller instance — mirrored exactly on the Spark side,
which reads the same sliced dir. Prefix (not modulus) slicing keeps
join locality: lineitem is cut by its parent orders cut, so derived call
traces stay well-formed.
"""
import sys
import duckdb

src = sys.argv[1]
dst = sys.argv[2]
frac = int(sys.argv[3]) if len(sys.argv) > 3 else 4

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def rd(table):
    # Spark directory layout (e.g. a SeedGen dir) vs the driver's
    # single-file layout — same handling as check_oracle.py
    p = f"{src}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

def cut(table, key):
    return con.execute(
        f"SELECT (MAX({key}) + 1) // {frac} FROM '{rd(table)}'"
    ).fetchone()[0]

def copy(table, where=""):
    con.execute(
        f"COPY (SELECT * FROM '{rd(table)}' {where}) "
        f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"[slice] {table}: {n} rows {where}")

o_cut = cut("orders", "o_orderkey")
copy("orders", f"WHERE o_orderkey < {o_cut}")
copy("lineitem", f"WHERE l_orderkey < {o_cut}")
copy("part", f"WHERE p_partkey < {cut('part', 'p_partkey')}")
copy("events", f"WHERE event_id < {cut('events', 'event_id')}")
copy("documents", f"WHERE doc_id < {cut('documents', 'doc_id')}")
copy("embeddings", f"WHERE vec_id < {cut('embeddings', 'vec_id')}")
for t in ("region", "nation", "customer", "supplier"):
    copy(t)
