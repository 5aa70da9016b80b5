#!/bin/bash
# Scale-sweep bench (SURVEY §6): synthesize shifted-union corpora from
# sf0.1 (if absent) and run the headline bench against them, appending
# /tmp/graft-sf1 (10×) and /tmp/graft-sf10 (100×) entries to
# BENCH_HISTORY.json — so scale regressions trend round-over-round
# exactly like the sf0.1 series does (Bench compares each run against
# the latest entry AT THE SAME sf dir). After each bench, PlanDump
# writes the plan skeletons next to the history so designed strategy
# flips (broadcast→sort-merge past the threshold) stay distinguishable
# from accidental ones: diff /tmp/graft-plans-sf0.1.txt against
# /tmp/graft-plans-<synth>.txt.
#   usage: scripts/bench_scale.sh [k ...]   (default: 10 100)
set -e
cd "$(dirname "$0")/.."
SRC=${SRC:-/root/testdata/sf0.1}
KS=${@:-10 100}

run_one() {
  K=$1
  case $K in
    10) SYNTH=/tmp/graft-sf1 ;;
    100) SYNTH=/tmp/graft-sf10 ;;
    *) SYNTH=/tmp/graft-x$K ;;
  esac
  if [ ! -d "$SYNTH" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.ScaleSynth $SRC $SYNTH $K"
  fi
  SPARK_GRAFT_SF_DIR=$SYNTH SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench"
  sbt -batch "runMain graft.tools.PlanDump $SYNTH" \
    > "/tmp/graft-plans-$(basename "$SYNTH").txt" 2>/dev/null || true
}

# baseline skeletons at the source sf for the diff
if [ ! -f "/tmp/graft-plans-$(basename "$SRC").txt" ]; then
  sbt -batch "runMain graft.tools.PlanDump $SRC" \
    > "/tmp/graft-plans-$(basename "$SRC").txt" 2>/dev/null || true
fi
for K in $KS; do run_one "$K"; done
