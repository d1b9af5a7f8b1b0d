#!/usr/bin/env bash
# Round-19 scaling runner (verdict brief #2/#3/#7): the round-18
# adversarial-skew instrument pointed at the two banded self-joins
# governed THIS round —
# (a) simhashPairs: byte-band bucket concentration + governed
#     (maxBucket=1000) vs ungoverned pair-join timing across 4
#     decades of the clone+boilerplate corpus; byte keys make the
#     ungoverned join quadratic EVEN BENIGN (256 keys/band).
# (b) bandedHammingPairs: 16-bit-band concentration + governed vs
#     ungoverned timing across 4 decades of the deterministic
#     perceptual-hash corpus (hot one-bit-flip cluster at 0.1*n).
# (c) the verdict-agreement probes for both (brief #7): full
#     pairs -> componentLabels -> per-doc verdict from governed and
#     ungoverned runs, count divergent docs — measures the
#     "under-reports-never-inflates" contract corpus-wide at decades
#     where ungoverned is still feasible.
#
# Runs the compiled classes directly (no sbt — keeps the build lock
# free); min-of-2 per timed point, corpus synthesis localCheckpoint'd
# out of the timing.
#
# Usage: scripts/bench_scaling_r19.sh [out.txt]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-scripts/bench_scaling_r19.txt}"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
JV="--add-exports java.base/sun.nio.ch=ALL-UNNAMED"

: > "$OUT.raw"

# governed AFTER curves + concentration probes + agreement (<=32k:
# the agreement probe runs the ungoverned join too)
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 \
  SPARK_GRAFT_DEDUP_OPS=simhash,simhash_compare,hamming,hamming_compare \
  java $JV -cp "$CP" graft.tools.DedupScaleBench 1 4 16 2>&1 \
  | grep '"metric"' >> "$OUT.raw"
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 \
  SPARK_GRAFT_DEDUP_OPS=simhash,hamming \
  java $JV -cp "$CP" graft.tools.DedupScaleBench 64 2>&1 \
  | grep '"metric"' >> "$OUT.raw"
# governed headroom decade (cap-linearity holds past the measured fit)
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 \
  SPARK_GRAFT_DEDUP_OPS=simhash,hamming \
  java $JV -cp "$CP" graft.tools.DedupScaleBench 256 2>&1 \
  | grep '"metric"' >> "$OUT.raw"

# ungoverned BEFORE curves (cap pushed out of reach)
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 SPARK_GRAFT_MAXBUCKET=999999999 \
  SPARK_GRAFT_DEDUP_OPS=simhash,hamming \
  java $JV -cp "$CP" graft.tools.DedupScaleBench 1 4 16 64 2>&1 \
  | grep '"metric"' | sed 's/"op":"/"op":"ungoverned_/' >> "$OUT.raw"

cat "$OUT.raw"
