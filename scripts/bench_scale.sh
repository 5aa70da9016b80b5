#!/bin/bash
# 10x scale bench (SURVEY §6): synthesize the shifted-union corpus from
# sf0.1 (if absent) and run the headline bench against it, appending a
# /tmp/graft-sf1 entry to BENCH_HISTORY.json — so scale regressions
# trend round-over-round exactly like the sf0.1 series does (Bench
# compares each run against the latest entry AT THE SAME sf dir).
#   usage: scripts/bench_scale.sh [synthDir] [srcSfDir] [k]
set -e
cd "$(dirname "$0")/.."
SYNTH=${1:-/tmp/graft-sf1}
SRC=${2:-/root/testdata/sf0.1}
K=${3:-10}
if [ ! -d "$SYNTH" ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.ScaleSynth $SRC $SYNTH $K"
fi
SPARK_GRAFT_SF_DIR=$SYNTH SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench"
