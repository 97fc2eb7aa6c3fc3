"""A/B: T-tile ILP interleave at TRUE rates (PD_SCANK dispatch-floor fix).
The round-3 'flat' tiles verdict was taken at B=8192 where every variant
sat at the ~24 ms dispatch floor — re-measure before trusting it.

Usage: python scripts/ab_tiles.py [N] [L] [B] [iters] [reps]
Env: PD_TILES (default "1,2"), PD_SCANK
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast
from polardecoding_tpu.utils.sequences import frozen_mask
from _scanwrap import SCANK, scan_jit

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 6
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
TILES = tuple(int(v) for v in os.environ.get("PD_TILES", "1,2").split(","))
R1 = int(os.environ.get("PD_R1", "0"))  # apply the R1 flavor to every variant

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


variants = {}
for T in TILES:
    variants[f"T{T}_r1_{R1}"] = scan_jit(
        lambda x, T=T: _scalar(scl_decode_fast(x, frt, list_size=L,
                                               wloop=2, tiles=T, r1=R1)))

for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr))
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append(iters * SCANK * B / (time.perf_counter() - t0))

for name, fpss in results.items():
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "scank": SCANK, "best_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
