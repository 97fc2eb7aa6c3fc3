#!/bin/bash
# Round-4 queue C: waits for queue B, then the LUT-depth latency probe.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
while ! grep -q "QUEUE B DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

run() {
  local n=$1 t=$2; shift 2
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -5 "$LOG/step$n.log"
}

# 9: balanced-tree vs chain LUT (pure latency probe, bit-identical)
run 9 5400 python scripts/ab_lut.py 1024 8 8192 24 3
echo "QUEUE C DONE $(date)" | tee -a $LOG/summary.txt
