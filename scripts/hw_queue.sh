#!/bin/bash
# Serial hardware-validation queue (ONE TPU process at a time — concurrent
# axon processes block each other; see CLAUDE.md).  Run when the tunnel is
# up; each step logs to .hw_queue_log/ and the queue continues on failure.
#
#   bash scripts/hw_queue.sh [start_step]
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_log
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

# default --frames 512 matches the r2 parity runs' shapes (compile cache
# hits for every config except the reworked L=32 S=2 kernel)
run 1 3600 python scripts/scl_parity_hw.py
run 2 1800 python scripts/es_sanity_hw.py
run 3 1800 python scripts/bench_wave.py --ab-fused
run 4 3000 python scripts/ab_chkfast.py --perf --bler
run 5 1200 python scripts/verify_drive.py --fast
run 6 1200 python bench.py
run 7 3600 python scripts/bench_scl.py
# headline probe: is SCL (the current min) faster at batch 8192?
run 8 1200 python bench.py --scl-batch 8192 --skip-wave
# never-measured S in {2,3} for the per-path kernel (binding headline)
run 9 2400 python scripts/ab_subtree_depth.py
echo "QUEUE DONE $(date)" | tee -a $LOG/summary.txt
