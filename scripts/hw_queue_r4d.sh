#!/bin/bash
# Round-4 queue D: the decisive bottleneck probes after every per-phase
# ablation measured flat — (a) drop the PHI LUT from the inter-fork PM
# recurrence (forkpen), (b) sever the recurrence entirely (pmbreak),
# (c) ablate every stub-able phase at once (how fast is the skeleton?).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
while ! grep -q "QUEUE C DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

run() {
  local n=$1 t=$2; shift 2
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -6 "$LOG/step$n.log"
}

run 10 7200 env "PD_PHASES=,forkpen,pmbreak,sigread+forkrank+forksel+forkeager+loopdescent+descent+boundaryfg" \
  python scripts/ablate_scl.py 1024 8 8192 24 3
echo "QUEUE D DONE $(date)" | tee -a $LOG/summary.txt
