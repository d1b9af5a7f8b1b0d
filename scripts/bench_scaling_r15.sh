#!/usr/bin/env bash
# Round-15 scaling runner: push the curve ONE MORE DECADE for the six
# worst scalers of round 14 (q296 q157 q236 q19 q138 q209 — the exact
# similarity self-joins plus the explode-heavy bootstrap). The fourth
# point is a deterministic ~sf1-equivalent corpus synthesized from the
# committed sf0.1 data by graft.tools.ScaleCorpus (10-way self-union,
# replica-disjoint vocabularies — see its scaladoc for why that is the
# honest 10x point). Fixed cores (8) so each step isolates data growth.
#
# Usage: scripts/bench_scaling_r15.sh [out.txt]
set -euo pipefail
cd "$(dirname "$0")/.."
QUERIES="q296 q157 q236 q19 q138 q209"
OUT="${1:-scripts/bench_scaling_r15.txt}"
SF1_DIR=/root/repo/target/scaling_sf1

# build the sf1-equivalent corpus once (idempotent overwrite)
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.ScaleCorpus" 2>&1 \
  | grep scaled_dir

: > "$OUT.raw"
for sf in 0.001 0.01 0.1; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf SPARK_GRAFT_CPUS=8 \
    sbt -batch "runMain graft.Bench $QUERIES" 2>&1 \
    | grep '"metric"' | sed "s|^|sf=$sf |" >> "$OUT.raw"
done
SPARK_GRAFT_SF_DIR=$SF1_DIR SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Bench $QUERIES" 2>&1 \
  | grep '"metric"' | sed "s|^|sf=1 |" >> "$OUT.raw"
python3 scripts/scaling_table.py "$OUT.raw" > "$OUT"
cat "$OUT"
