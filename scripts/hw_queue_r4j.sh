#!/bin/bash
# Round-4 queue J: final headline record + SCL batch retune for the
# faster (T2+FASTR1) kernel.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=.hw_queue_r4
run() {
  local n=$1 t=$2; shift 2
  echo "=== step $n: $* (timeout ${t}s) $(date)" | tee -a $LOG/summary.txt
  if timeout "$t" "$@" > "$LOG/step$n.log" 2>&1; then
    echo "step $n OK $(date)" | tee -a $LOG/summary.txt
  else
    echo "step $n FAILED rc=$? $(date)" | tee -a $LOG/summary.txt
  fi
  tail -4 "$LOG/step$n.log"
}

run 28 3600 python bench.py
run 29 3600 python - <<'EOF'
import sys, time, json
sys.path.insert(0, "/root/repo")
from bench import bench_step
for B in (16384, 32768):
    fps = bench_step("SCL_1024_L8_FASTR1", B, 2.0, iters=6, warmup=2)
    print(json.dumps({"preset": "SCL_1024_L8_FASTR1", "B": B,
                      "full_mc_fps": round(fps, 1)}), flush=True)
EOF
echo "QUEUE J DONE $(date)" | tee -a $LOG/summary.txt
