#!/bin/bash
# Round-4 measurement queue: run everything that needs the real TPU, most
# valuable first, so a short tunnel window still yields the deliverables.
# Each step is bounded; a mid-run tunnel death fails that step only.
cd "$(dirname "$0")/.."
LOG=extras/r4_measure.log
run() {
  echo "=== [$(date -u +%H:%M:%S)Z] $* ===" | tee -a "$LOG"
  timeout "$1" env "${@:3}" python -u "$2" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}
# 1. officials: headline, HMR 4fs, 100k scaling
run 2400 bench.py NBS_BENCH_DEADLINE_S=2100
run 1800 bench.py NBS_BENCH_DEADLINE_S=1500 NBS_HMR=1
run 2400 bench.py NBS_BENCH_DEADLINE_S=2100 NBS_MOLECULES=33333
# 2. diagnostics for the optimization pass
run 1800 extras/probe_pair_variants.py
run 3000 extras/profile_fused_r3.py
echo "=== QUEUE COMPLETE $(date -u +%H:%M:%S)Z ===" | tee -a "$LOG"
