#!/usr/bin/env bash
# Scaling-curve runner (round 14): bench the 10 heaviest registry
# queries (by r13 min-time) at all three driver scale factors with a
# FIXED core count, so the curve isolates data growth. Each step is a
# 10x row-count increase; a scale-safe plan should grow ~linearly
# (ratio ~10 per step, less where fixed overhead dominates at tiny SF),
# and the df-capped dedup queries should bend SUB-linear in candidate
# volume by construction (the Sigma df^2 governor caps posting-list
# blowup independently of corpus size).
#
# Usage: scripts/bench_scaling.sh [out.txt]
# Emits the raw per-SF bench lines to <out>.raw and the growth table
# to <out> via scripts/scaling_table.py.
set -euo pipefail
cd "$(dirname "$0")/.."
QUERIES="q277 q288 q296 q272 q294 q275 q299 q291 q297 q300"
OUT="${1:-scripts/bench_scaling_r14d.txt}"
: > "$OUT.raw"
for sf in 0.001 0.01 0.1; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf SPARK_GRAFT_CPUS=8 \
    sbt -batch "runMain graft.Bench $QUERIES" 2>&1 \
    | grep '"metric"' | sed "s|^|sf=$sf |" >> "$OUT.raw"
done
python3 scripts/scaling_table.py "$OUT.raw" > "$OUT"
cat "$OUT"
