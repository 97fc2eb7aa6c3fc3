#!/bin/bash
# Round-4 queue F: re-run every floor-clipped A/B with scan-batched
# dispatches (PD_SCANK) — the ~24 ms/dispatch tunnel floor compressed all
# previous B=8192 deltas to zero (probe_floor3.py).  Wave K retune first
# (headline-binding engine), then the SCL attribution and candidate
# optimizations at their true rates.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
mkdir -p $LOG

run() {
  local n=$1 t=$2; shift 2
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -8 "$LOG/step$n.log"
}

# 13: wave K retune, 8 steps per dispatch (true small-K rates)
run 13 5400 python scripts/ab_wavescan.py 16384 8 3 2.0 8
# 14: phase ablation at true rates
run 14 9000 env PD_SCANK=8 \
  "PD_PHASES=,sigread,forksel,forkpen,pmbreak,sigread+forkrank+forksel+forkeager+loopdescent+descent+boundaryfg" \
  python scripts/ablate_scl.py 1024 8 8192 6 3
# 15: stacked fork at true rates
run 15 5400 env PD_SCANK=8 python scripts/ab_stackfork.py 1024 8 8192 6 3
# 16: LUT tree vs chain at true rates
run 16 5400 env PD_SCANK=8 python scripts/ab_lut.py 1024 8 8192 6 3
# 17: R1 flavor at true rates
run 17 5400 env PD_SCANK=8 PD_R1S=0,4 python scripts/ab_r1.py 1024 8 8192 6 3
echo "QUEUE F DONE $(date)" | tee -a $LOG/summary.txt
