#!/bin/bash
# Round-4 queue G: sig_read accumulation + eager-region retune at true
# rates, then the production bench with the scan-batched harness.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
while ! grep -q "QUEUE F DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

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

# 18: chunked-value sig_read vs gat-ref incumbent
run 18 7200 env PD_SCANK=8 python scripts/ab_sigchunk.py 1024 8 8192 6 3
# 19: eager-region size retune at true rates
run 19 7200 env PD_SCANK=8 python scripts/ab_subtree.py 1024 8 8192 6 3
echo "QUEUE G DONE $(date)" | tee -a $LOG/summary.txt
