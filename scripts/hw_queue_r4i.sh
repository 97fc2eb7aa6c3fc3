#!/bin/bash
# Round-4 queue I: compose the two real SCL wins — T-tile interleave
# (+9.7%) x bounded-fork R1 (+28.7%) — and probe T=4.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
while ! grep -q "QUEUE H DONE" $LOG/summary.txt 2>/dev/null; do sleep 30; done

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

# 24: T in {1,2,4} with the R1 flavor on (the production candidate)
run 24 9000 env PD_SCANK=8 PD_TILES=1,2,4 PD_R1=4 python scripts/ab_tiles.py 1024 8 8192 6 3
# 25: T4 exact (completes the T sweep without R1)
run 25 7200 env PD_SCANK=8 PD_TILES=4 python scripts/ab_tiles.py 1024 8 8192 6 3
# 26: N=128 with T2+R1 (does the tile win hold at N=128?)
run 26 5400 env PD_SCANK=16 PD_TILES=1,2 PD_R1=4 python scripts/ab_tiles.py 128 8 16384 6 3
echo "QUEUE I DONE $(date)" | tee -a $LOG/summary.txt
