#!/bin/bash
# Round-4 queue H: true-rate requalification of floor-contaminated rows —
# N=128 (was measured AT the floor), T-tiles (r3 negative now suspect),
# and the R1 flavor at L=16/L=32 for the dispatch table.
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
  tail -6 "$LOG/step$n.log"
}

# 20: N=128 L=8 exact + R1 at true rates (the 629k row was AT the floor)
run 20 5400 env PD_SCANK=16 PD_R1S=0,4 python scripts/ab_r1.py 128 8 16384 6 3
# 21: T-tiles recheck at true rates
run 21 5400 env PD_SCANK=8 PD_TILES=1,2 python scripts/ab_tiles.py 1024 8 8192 6 3
# 22: R1 at L=16
run 22 7200 env PD_SCANK=4 PD_R1S=0,4 python scripts/ab_r1.py 1024 16 8192 6 3
# 23: R1 at L=32 (long compiles: ~13 min/variant)
run 23 10800 env PD_SCANK=2 PD_R1S=0,4 python scripts/ab_r1.py 1024 32 4096 6 3
echo "QUEUE H DONE $(date)" | tee -a $LOG/summary.txt
