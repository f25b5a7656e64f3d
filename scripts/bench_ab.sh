#!/bin/bash
# A/B bench matrix for the rasterizer perf knobs. Waits for the TPU relay
# to come back (tiny-matmul probe), then runs bench.py under each knob
# combination, logging one JSON line per run to $LOG.
#
# Usage: bash scripts/bench_ab.sh [logfile]
set -u
LOG=${1:-/tmp/bench_ab.log}
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
(jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
print('probe-ok')" 2>/dev/null | grep -q probe-ok
}

echo "[ab] waiting for TPU relay..." | tee -a "$LOG"
until probe; do
  echo "[ab] $(date +%H:%M:%S) relay still down" >> "$LOG"
  sleep 180
done
echo "[ab] relay up at $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  local label=$1; shift
  echo "[ab] run: $label ($*)" | tee -a "$LOG"
  local t0=$SECONDS
  env "$@" timeout 1500 python bench.py 2>/dev/null | tail -1 \
    | sed "s/^/[$label] /" | tee -a "$LOG"
  echo "[ab] $label wall $((SECONDS - t0))s" >> "$LOG" 2>/dev/null || true
}

# Compiled-mode parity FIRST (3 legs) — kernel changes must re-prove
# compiled==interpret before any throughput number is trusted.
echo "[ab] tpu_parity..." | tee -a "$LOG"
if timeout 1800 python -u scripts/tpu_parity.py >> "$LOG" 2>&1; then
  echo "[ab] tpu_parity GREEN" | tee -a "$LOG"
else
  echo "[ab] tpu_parity FAILED (see log) — aborting bench matrix" | tee -a "$LOG"
  exit 1
fi

run base
run suffix_high GH_SUFFIX_PREC=high
run unstable GH_SORT_STABLE=0
run both GH_SUFFIX_PREC=high GH_SORT_STABLE=0
run both_b28 GH_SUFFIX_PREC=high GH_SORT_STABLE=0 GH_BENCH_BUDGET=2.8
echo "[ab] done" | tee -a "$LOG"
