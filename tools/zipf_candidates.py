#!/usr/bin/env python3
"""Candidate-count measurement for the exact-Jaccard AllPairs prefix
filter (tau = 1/5) on a documents dir — the DuckDB replica of
Dedup.jaccardPrefixPairs's candidate-generation stage (same md5Hash60
hashing, same (df, h) canonical order, same integer prefix length).

Reports the distinct candidate-pair count WITHOUT and WITH the PPJoin
positional filter (Xiao et al. 2008 §3.2) that jaccardPrefixPairs now
applies at generation, plus the implied verify-payload bytes (pairs x
(sza + szb) x 8B). Both counts use identical shingling, so the ratio is
the filter's candidate/payload cut. The VERIFIED pair set is provably
identical (losslessness argument in Dedup.scala); this script measures
what the filter saves, not what it returns.

Usage: tools/zipf_candidates.py <docs_dir> [threads]
"""
import sys, json, os
import duckdb

d = sys.argv[1]
con = duckdb.connect()
if len(sys.argv) > 2:
    con.execute(f"SET threads={int(sys.argv[2])}")
p = f"{d}/documents.parquet"
if os.path.isdir(p):
    p = f"{p}/*.parquet"
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")

base = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
  FROM documents),
sh AS (
  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, toks,
          unnest(generate_series(1, GREATEST(len(toks) - 2, 1))) AS i
        FROM t)),
dsh AS (SELECT DISTINCT doc_id,
    CAST(concat('0x', substr(md5('0:' || shingle), 1, 15)) AS BIGINT) AS h
  FROM sh),
dft AS (SELECT h, COUNT(*) AS df FROM dsh GROUP BY 1),
ranked AS (
  SELECT d.doc_id, d.h,
         COUNT(*) OVER (PARTITION BY d.doc_id) AS sz,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY f.df, d.h) AS r
  FROM dsh d JOIN dft f ON d.h = f.h),
prefix AS (
  SELECT doc_id, h, r, sz FROM ranked
  WHERE r <= sz - (1 * sz + 4) // 5 + 1)
"""

out = {"dir": d}
for label, extra in [
    ("prefix_only", ""),
    ("prefix_plus_positional",
     " AND (LEAST(x.sz - x.r, y.sz - y.r) + 1) * 6 >= (x.sz + y.sz) * 1")]:
    q = base + f"""
,cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM prefix x JOIN prefix y
    ON x.h = y.h AND x.doc_id < y.doc_id{extra}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dsh GROUP BY 1)
SELECT COUNT(*) AS pairs, SUM(sa.sz + sb.sz) * 8 AS payload_bytes
FROM cand JOIN sizes sa ON cand.a = sa.doc_id
          JOIN sizes sb ON cand.b = sb.doc_id"""
    pairs, payload = con.execute(q).fetchone()
    out[label] = {"pairs": int(pairs), "payload_bytes": int(payload)}

bo = out["prefix_only"]; bp = out["prefix_plus_positional"]
out["candidate_cut"] = round(bo["pairs"] / max(bp["pairs"], 1), 2)
out["payload_cut"] = round(bo["payload_bytes"] / max(bp["payload_bytes"], 1), 2)
print(json.dumps(out, indent=2))
