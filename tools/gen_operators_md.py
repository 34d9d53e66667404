#!/usr/bin/env python3
"""Regenerate docs/OPERATORS.md from SparkEntry.queries registration
comments. Run from the repo root after adding queries."""
import re

src = open('src/main/scala/graft/SparkEntry.scala').read()
qregion = src.split('// ----------------------------------------------------------------- oracle')[0]
pat = re.compile(r'((?:^\s*//[^\n]*\n)*)\s*"([a-z0-9_]+)" -> \(\(s, dir\)', re.M)
entries = []
for m in pat.finditer(qregion):
    comment = ' '.join(l.strip().lstrip('/').strip() for l in m.group(1).strip().splitlines())
    comment = re.sub(r'^-+\s*|\s*-+$', '', comment.replace('---', '').strip()).strip()
    entries.append((m.group(2), comment))

fams = [
 ('TPC-H-style relational', lambda n: n in ('q1_pricing', 'q3_topk', 'q5_region_revenue')),
 ('Trace ingest / interchange', lambda n: n.startswith(('nsight', 'trace_chrome', 'pprof'))),
 ('Trace enrichment & profiles', lambda n: n.startswith('trace_')),
 ('Communication analysis', lambda n: n.startswith(('comm_', 'msg_'))),
 ('Dedup / fingerprinting', lambda n: n.startswith(('dedup', 'minhash', 'simhash', 'ngram',
   'winnow', 'fingerprint', 'dup_', 'cdc_', 'tile_', 'jaccard', 'lsh', 'decontaminate',
   'semdedup', 'doc_fingerprint', 'doc_novelty'))),
 ('Similarity / embeddings', lambda n: n.startswith(('ann_', 'emb_', 'knn', 'kmeans',
   'pq_', 'sq8', 'rp_reduce', 'retrieval'))),
 ('Text analysis / curation', lambda n: n.startswith(('text_', 'token', 'bpe_', 'vocab',
   'tfidf', 'bm25', 'hybrid', 'cluster_terms', 'quality', 'docs_curated', 'dsir',
   'sample_', 'split_', 'epoch_', 'chunk', 'pack', 'shard', 'source_', 'langid',
   'colloc', 'pipeline_funnel', 'cms_topk', 'hll', 'zipf', 'contrastive'))),
 ('Multimodal', lambda n: n.endswith('_features')),
 ('Graph', lambda n: n.startswith('graph_')),
 ('Event-stream / time-series analytics', lambda n: n.startswith('q_')),
 ('Data quality / profiling', lambda n: True),  # remainder
]
out = ['# Operator / query index', '',
 'Generated from `SparkEntry.queries` registration comments — one row per',
 'driver query; every one is DuckDB-oracle-checked (see README',
 '"Correctness gate"). Regenerate with `tools/gen_operators_md.py`.', '',
 f'Registry size: **{len(entries)} queries**.', '']
used = set()
for fam, pred in fams:
    rows = [(n, c) for n, c in entries if n not in used and pred(n)]
    if not rows:
        continue
    used.update(n for n, _ in rows)
    out += [f'## {fam} ({len(rows)})', '', '| query | what it computes |', '|---|---|']
    last = ''
    for n, c in rows:
        desc = c if c else f'(with `{last}`)'
        if c:
            last = n
        out.append(f'| `{n}` | {desc} |')
    out.append('')
open('docs/OPERATORS.md', 'w').write('\n'.join(out) + '\n')
print(f'wrote docs/OPERATORS.md with {len(entries)} queries')
