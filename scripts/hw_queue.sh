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

# ---- round 3: frozen-specialized (fast) SCL kernel campaign ----
# 1: dispatch parity (now routes to the fast kernel) at all {N}x{L}
run 1 5400 python scripts/scl_parity_hw.py
# 2: packed-sigma fast kernel vs per-path incumbent at the binding config
run 2 5400 python scripts/ab_sclfast.py 1024 8 8192 24 3
# 3: L=1 (SC path) — unmeasured routing change
run 3 3600 python scripts/ab_sclfast.py 1024 1 8192 24 3
# 4: headline with the new dispatch
run 4 1800 python bench.py
# 5: wave-engine K/batch retune on the production config (fused + FASTCHK)
run 5 3000 python scripts/bench_wave.py --retune
# 6: end-to-end BLER verification drive
run 6 1200 python scripts/verify_drive.py --fast
# 7: ES-engine hardware sanity (fixed import; never ran in r2)
run 7 1800 python scripts/es_sanity_hw.py
# 8: SCL batch probe at 16384 with the fast kernel
run 8 1800 python bench.py --scl-batch 16384 --skip-wave
# 9: N=128 rerun with scalar fetch (round-3 first run was tunnel-bound)
run 9 2400 python scripts/ab_sclfast.py 128 8 16384 48 3
echo "QUEUE DONE $(date)" | tee -a $LOG/summary.txt
