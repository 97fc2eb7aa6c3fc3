#!/bin/bash
# Round-4 serial hardware queue (ONE TPU process at a time — see CLAUDE.md).
# Priority order: perf levers first (R1 argmin re-measure, wave check_every),
# then attribution (ablation), then the L=16 requalification, then headline.
#
#   bash scripts/hw_queue_r4.sh [start_step]
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
mkdir -p $LOG
START=${1:-1}

run() {  # run <n> <timeout_s> <cmd...>
  local n=$1 t=$2; shift 2
  if [ "$n" -lt "$START" ]; then echo "skip step $n"; return; fi
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -5 "$LOG/step$n.log"
}

# 1: R1 bounded-fork re-measure after the tree-argmin fix (r1=0 baseline
#    recompiles too — the kernel edit invalidated its cache entry)
run 1 5400 env PD_R1S=0,4,8 python scripts/ab_r1.py 1024 8 8192 24 3
# 2: in-wave G-check latch cadence A/B (verdict item 3; target >=350k @2dB)
run 2 4200 python scripts/ab_wavecheck.py 16384 30 3 2.0 8
# 3: phase ablation for the calibrated-model attribution (verdict item 1)
run 3 7200 python scripts/ablate_scl.py 1024 8 8192 24 3
# 4: L=16 requalification through the packed-sigma kernel, scalar fetch
#    (verdict item 6) — production wloop only to bound compile time
run 4 5400 env PD_WLOOPS=2 python scripts/ab_sclfast.py 1024 16 8192 24 3
# 5: headline refresh with current defaults
run 5 2400 python bench.py
echo "QUEUE DONE $(date)" | tee -a $LOG/summary.txt
