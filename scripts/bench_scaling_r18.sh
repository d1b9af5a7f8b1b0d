#!/usr/bin/env bash
# Round-18 scaling runner (verdict brief #1/#2/#3):
# (a) the dedup-family ADVERSARIAL-SKEW instrument — DedupScaleBench's
#     clone+boilerplate synthetic corpus across 4 decades, measuring
#     band-bucket / posting-df concentration and candidate pair volume
#     vs each governor's stated bound for minhashPairs (governed this
#     round — maxBucket), jaccardPairs, winnowingPairs. The ungoverned
#     BEFORE curve is in bench_scaling_r18_dedup_before.raw
#     (SPARK_GRAFT_MAXBUCKET=999999999 reruns it).
# (b) winnowing (q338) and the KN bigram LM (q330) on the registry
#     decades incl. the ~sf1 ScaleCorpus corpus — the two round-17
#     families with argued-but-unmeasured bounds.
# (c) the streaming capstone under a sustained feed at two input
#     scales — rows/s, micro-batch latency, state-store footprint.
#
# Usage: scripts/bench_scaling_r18.sh [out.txt]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-scripts/bench_scaling_r18.txt}"
SF1_DIR=/root/repo/target/scaling_sf1

SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.ScaleCorpus" 2>&1 \
  | grep scaled_dir

: > "$OUT.raw"
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 \
  sbt -batch "runMain graft.tools.DedupScaleBench 1 4 16 64" 2>&1 \
  | grep '"metric"' >> "$OUT.raw"
for sf in 0.001 0.01 0.1; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf SPARK_GRAFT_CPUS=8 \
    sbt -batch "runMain graft.Bench q338 q330" 2>&1 \
    | grep '"metric"' | sed "s|^|sf=$sf |" >> "$OUT.raw"
done
SPARK_GRAFT_SF_DIR=$SF1_DIR SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Bench q338 q330" 2>&1 \
  | grep '"metric"' | sed "s|^|sf=1 |" >> "$OUT.raw"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.StreamScaleBench 2000 20000" 2>&1 \
  | grep '"metric"' >> "$OUT.raw"
cat "$OUT.raw"
