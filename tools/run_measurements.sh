#!/bin/bash
# Serialized on-chip measurement battery for the round-3 evidence items.
#
# The axon TPU tunnel wedges for long stretches (BENCH_r01/r02 both died to
# it), so every stage is (a) gated on a cheap device probe, (b) run as the
# ONLY process touching the tunnel, and (c) bounded with a generous timeout.
# A stage that can't get a healthy probe is skipped (logged), not retried
# forever — rerun the script to fill gaps. Progress + logs: /tmp/battery/.
#
# Stages (VERDICT round-2 "do this" order):
#   bench      — python bench.py (headline rays/s + secondary metrics)
#   spheres    — tools/fast_frontier.py multi-pose sweep, spheres scene
#   cluster    — tools/fast_frontier.py, sparser 9-object scene
#   parity     — tools/fused_train_parity.py jnp/fused/culled/culled_fused
#   noise      — same, jnp seed 1 (run-to-run noise band for the +-0.1 dB bar)
#   eg3d       — tools/eg3d_fast_frontier.py on a converged (5K-step) field
#   siren      — tools/siren_convergence.py (siren vs mlp PSNR + step time)
#   semantic   — tools/semantic_convergence.py (pointnet + conv3d)
#
# Usage: tools/run_measurements.sh [stage ...]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/battery

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

run_stage() {
  local name="$1" tmo="$2"; shift 2
  local done_f="/tmp/battery/$name.done" log="/tmp/battery/$name.log"
  if [ -f "$done_f" ]; then echo "[$name] already done, skipping"; return 0; fi
  echo "[$name] probing tunnel ..."
  if ! probe; then echo "[$name] SKIP: tunnel not answering"; return 1; fi
  echo "[$name] running: $* (timeout ${tmo}s)"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$log" 2>&1
  local rc=$?
  echo "[$name] rc=$rc after $((SECONDS - t0))s (log: $log)"
  if [ $rc -eq 0 ]; then touch "$done_f"; else tail -5 "$log"; fi
  return $rc
}

STAGES=${*:-"bench spheres cluster parity noise eg3d siren semantic"}
for s in $STAGES; do
  case "$s" in
    bench)    run_stage bench    3600 python bench.py ;;
    spheres)  run_stage spheres  5400 python tools/fast_frontier.py \
                --scene spheres --fused_only ;;
    cluster)  run_stage cluster  5400 python tools/fast_frontier.py \
                --scene cluster --fused_only ;;
    parity)   run_stage parity   5400 python tools/fused_train_parity.py \
                --backends jnp fused culled culled_fused ;;
    noise)    run_stage noise    2400 python tools/fused_train_parity.py \
                --backends jnp --seed 1 \
                --out docs/fused_train_parity_seed1.json ;;
    eg3d)     run_stage eg3d     7200 python tools/eg3d_fast_frontier.py \
                --steps 5000 ;;
    # --scan_chunk 100: the default 500-step scanned program with the
    # SIREN field crashed the TPU worker twice in r4 ("kernel fault");
    # the single-step and 100-step programs run fine
    siren)    run_stage siren    5400 python tools/siren_convergence.py \
                --scan_chunk 100 ;;
    semantic) run_stage semantic 3600 python tools/semantic_convergence.py ;;
    # round-3 follow-ons: delta-vs-ratio quadrature pairs + re-measure of
    # the auto-cull rows under the two-sided eps calibration (both merge
    # row-wise into the existing frontier JSONs; --reuse_scene skips the
    # ~25 min retrain by loading /tmp/frontier_scene_<scene>.msgpack)
    ratio_spheres) run_stage ratio_spheres 3600 python tools/fast_frontier.py \
                --scene spheres --reuse_scene --ratio_only ;;
    ratio_cluster) run_stage ratio_cluster 3600 python tools/fast_frontier.py \
                --scene cluster --reuse_scene --ratio_only ;;
    auto_spheres)  run_stage auto_spheres  3600 python tools/fast_frontier.py \
                --scene spheres --reuse_scene --auto_only ;;
    auto_cluster)  run_stage auto_cluster  3600 python tools/fast_frontier.py \
                --scene cluster --reuse_scene --auto_only ;;
    # round-4 stages (VERDICT r3): int8 trunk measured for real (item 2 —
    # frontier rows on both scenes + the scheme-level quality probe),
    # second-scene culled_fused convergence evidence (item 7)
    int8_spheres)  run_stage int8_spheres  3600 python tools/fast_frontier.py \
                --scene spheres --reuse_scene --int8_only ;;
    int8_cluster)  run_stage int8_cluster  3600 python tools/fast_frontier.py \
                --scene cluster --reuse_scene --int8_only ;;
    int8_quality)  run_stage int8_quality  2400 python tools/int8_quality.py ;;
    parity_cluster) run_stage parity_cluster 5400 python \
                tools/fused_train_parity.py --scene cluster \
                --backends jnp culled_fused \
                --out docs/fused_train_parity_cluster.json ;;
    *) echo "unknown stage: $s" ;;
  esac
done
echo "battery pass complete; done-markers:"; ls /tmp/battery/*.done 2>/dev/null
