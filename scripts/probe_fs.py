"""Latency-vs-throughput probe for the fast SCL kernel.

Shrinks the sublane frame groups per tile (fs = 8 -> 4 -> 2) at constant
batch.  Every row op processes fs*F frames; if the kernel were
VPU-THROUGHPUT-bound, fps would scale ~linearly with fs.  A flat fps curve
means the kernel is LATENCY-bound (serial chains of single-vreg ops on
[1, fs, 128] tiles) — in which case interleaving T>1 independent frame
tiles per kernel body is the next lever (ROOFLINE §fourth generation).

Usage: python scripts/probe_fs.py [N] [L] [B] [iters] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np
import jax.numpy as jnp

from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)

variants = {
    f"fs{cap or 8}": jax.jit(lambda x, cap=cap: jnp.sum(
        scl_decode_fast(x, frt, list_size=L, wloop=2, fs_cap=cap)[1]))
    for cap in (0, 4, 2)
}
for name, f in variants.items():
    t0 = time.perf_counter()
    np.asarray(f(llr))
    print(json.dumps({"variant": name,
                      "compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

best = {name: 0.0 for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr))
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        best[name] = max(best[name], iters * B / (time.perf_counter() - t0))
print(json.dumps({k: round(v, 1) for k, v in best.items()}), flush=True)
