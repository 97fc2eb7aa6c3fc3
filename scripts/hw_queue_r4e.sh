#!/bin/bash
# Round-4 queue E: the structural-floor probes.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
while ! grep -q "QUEUE D DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

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

# 11: shape-matched empty kernel — the grid/DMA/init floor
run 11 3600 python scripts/probe_floor.py 1024 8 8192 24 3
# 12: everything ablatable at once INCLUDING the PM recurrence + PHI
run 12 7200 env "PD_PHASES=,sigread+forkrank+forksel+forkeager+loopdescent+descent+boundaryfg+forkpen+pmbreak" \
  python scripts/ablate_scl.py 1024 8 8192 24 3
echo "QUEUE E DONE $(date)" | tee -a $LOG/summary.txt
