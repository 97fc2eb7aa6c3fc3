#!/bin/bash
# Round-4 follow-up queue: waits for hw_queue_r4.sh to finish (ONE TPU
# process at a time), then runs the stacked-fork A/B, the corrected phase
# ablation (forksel/descent/boundaryfg — the first sweep's phases all
# measured flat), and the end-to-end verification drive.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
mkdir -p $LOG

while ! grep -q "QUEUE DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

run() {  # run <n> <timeout_s> <cmd...>
  local n=$1 t=$2; shift 2
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -5 "$LOG/step$n.log"
}

# 6: across-d stacked fork vs incumbent flat emission (the round-4 perf
#    lever; on-HW bit-parity gate included in the script)
run 6 5400 python scripts/ab_stackfork.py 1024 8 8192 24 3
# 7: corrected phase attribution
run 7 7200 env PD_PHASES=,forksel,descent,boundaryfg \
  python scripts/ablate_scl.py 1024 8 8192 24 3
# 8: end-to-end BLER drive (kernel file changed since the last pass)
run 8 1800 python scripts/verify_drive.py --fast
echo "QUEUE B DONE $(date)" | tee -a $LOG/summary.txt
