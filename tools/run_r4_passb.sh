#!/bin/bash
# Round-4 pass B: re-run the int8 stages against the dynamic-scale kernel,
# the auto stages against the prepass-free bypass, then the remaining
# VERDICT evidence items. Retries the whole battery until every stage's
# done-marker exists or the deadline passes — run_measurements.sh itself
# probe-gates each stage, so a wedged tunnel just means "sleep and retry".
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-14400}   # seconds from launch
START=$SECONDS
STAGES="int8_spheres int8_quality auto_spheres siren eg3d cluster auto_cluster int8_cluster parity_cluster"
for pass in 1 2 3 4 5 6 7 8 9 10 11 12; do
  left=$((DEADLINE - (SECONDS - START)))
  [ $left -le 0 ] && break
  missing=""
  for s in $STAGES; do [ -f "/tmp/battery/$s.done" ] || missing="$missing $s"; done
  [ -z "$missing" ] && { echo "ALL STAGES DONE"; break; }
  echo "=== pass $pass (${left}s left): running$missing"
  bash tools/run_measurements.sh $missing
  # if nothing completed this pass the tunnel is down: wait it out
  done_now=0
  for s in $missing; do [ -f "/tmp/battery/$s.done" ] && done_now=1; done
  [ $done_now -eq 0 ] && { echo "no progress; sleeping 600s"; sleep 600; }
done
echo "pass B finished; markers:"; ls /tmp/battery/*.done 2>/dev/null
