#!/bin/bash
# Unattended round-4 hardware sweep. Arms itself on the next healthy tunnel
# probe and runs every pending measurement in priority order; re-probes
# between steps so a mid-sweep outage pauses instead of wasting a slot.
#
#   nohup bash tools/hw_sweep.sh >/tmp/hw_sweep_drv.log 2>&1 &
#
# Results append to $LOG (default /tmp/hw_sweep.log). Steps, in order:
#   1-2  bench.py twice (compile-cache validation, VERDICT r3 next #2)
#   3-7  ViT-L/32 MFU sweep: half-flat baseline, remat_policy names /
#        names+unroll2 / dots, rbg PRNG (VERDICT r3 next #5)
#   8    MultiChain(1) wrapper overhead on the real chip (VERDICT #4a)
# Do NOT run CPU-heavy work (pytest, parity sweeps) while this is active:
# host CPU saturation starves the tunnel client (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_sweep.log}

probe() {
  local i
  for i in $(seq 1 40); do
    if timeout 120 python tools/tpu_probe.py >>"$LOG" 2>&1; then
      return 0
    fi
    echo "$(date -u +%F\ %T) probe degraded; sleep 600s (attempt $i)" >>"$LOG"
    sleep 600
  done
  return 1
}

step() { # step <timeout_s> <label> cmd...
  local T=$1 L=$2 rc
  shift 2
  probe || { echo "GIVE UP waiting for tunnel before $L" >>"$LOG"; exit 1; }
  echo "=== $L start $(date -u +%F\ %T) ===" >>"$LOG"
  local t0=$SECONDS
  timeout "$T" "$@" >>"$LOG" 2>&1
  rc=$?
  echo "--- $L exit=$rc wall=$((SECONDS - t0))s ---" >>"$LOG"
}

step 1800 bench_run1 env BENCH_BIG_BUDGET_S=1200 python bench.py
step 1200 bench_run2 python bench.py
step 1500 vit_halfflat_base python tools/big_model_bench.py vit_l_32 128 bfloat16 remat
step 1500 vit_names python tools/big_model_bench.py vit_l_32 128 bfloat16 remat names
step 1500 vit_names_unroll2 python tools/big_model_bench.py vit_l_32 128 bfloat16 remat names 2
step 1500 vit_dots python tools/big_model_bench.py vit_l_32 128 bfloat16 remat dots
step 1500 vit_names_rbg env BAYESDLL_TPU_PRNG=rbg python tools/big_model_bench.py vit_l_32 128 bfloat16 remat names
step 900 overhead_real_chip python tools/scaling_bench.py --overhead --steps 8
echo "SWEEP COMPLETE $(date -u +%F\ %T)" >>"$LOG"
