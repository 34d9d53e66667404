#!/bin/sh
# Per-round 10x scaling sweep AND GATE: generate the sf1 tiling once (reused
# across rounds while /tmp survives), then run the heaviest-20 registry
# queries at sf1 and emit the sf0.1->sf1 scaling table (stdout markdown +
# scale_sf1.json). Exits NONZERO if any >10x row lacks an attribution line
# in tools/scale_attribution.tsv — scale regressions cannot land silently.
# Run from the repo root AFTER a bench run so bench_full.json is fresh.
set -e
SF1=${SF1:-/tmp/sf1}
if [ ! -d "$SF1/documents.parquet" ]; then
  echo "[scale_sweep] generating sf1 tiling at $SF1"
  sbt -batch "runMain graft.demo.ScaleGen /root/testdata/sf0.1 $SF1"
fi
sbt -batch "runMain graft.demo.ScaleBench $SF1 --heaviest ${1:-20}"
