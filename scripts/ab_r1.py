"""A/B: approximate bounded-fork R1 flavor vs the exact frozen-specialized
SCL kernel (scl_decode_fast r1=...), DVFS-resistant methodology of
ab_scl.py (kernel-only, scalar-reduced outputs, >=1 s windows, interleaved
best-of-reps).

Also verifies, on a small sub-batch fetched to host, that the HW kernel's
R1 outputs equal the numpy twin (tests/scl_fast_ref.py) bit-for-bit — the
same oracle the CPU interpret suite pins — so the measured variant is
provably the intended algorithm.

Usage: python scripts/ab_r1.py [N] [L] [B] [iters] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
R1S = tuple(int(v) for v in
            os.environ.get("PD_R1S", "0,2,4,8").split(","))

fr_np = np.asarray(frozen_mask(N, N // 2))
frt = tuple(bool(b) for b in fr_np)
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


from _scanwrap import SCANK, scan_jit  # noqa: E402  (PD_SCANK dispatch-floor fix)

variants = {}
for r1 in R1S:
    variants[f"r1_{r1}"] = scan_jit(
        lambda x, r1=r1: _scalar(scl_decode_fast(x, frt, list_size=L,
                                                 wloop=2, r1=r1)))

for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

# HW-vs-twin parity on a small sub-batch (r1=4): fetches 64 frames' u_all
sub = 64
try:
    from scl_fast_ref import decode_batch

    u_hw, pm_hw, t_hw = jax.jit(
        lambda x: scl_decode_fast(x, frt, list_size=L, wloop=2, r1=4))(
            llr[:sub])
    u_tw, pm_tw, t_tw = decode_batch(np.asarray(llr[:sub]), fr_np, L,
                                     wloop=2, r1min=4)
    print(json.dumps({
        "parity": "hw_r1_4_vs_numpy_twin", "frames": sub,
        "bits_equal": bool((np.asarray(u_hw) == u_tw).all()),
        "pm_equal": bool((np.asarray(pm_hw) == pm_tw).all()),
        "ties_equal": bool((np.asarray(t_hw) == t_tw).all())}), flush=True)
except Exception as e:  # twin is a test asset; keep the bench usable alone
    print(json.dumps({"parity": "skipped", "err": repr(e)}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr))  # re-warm
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append(iters * SCANK * B / (time.perf_counter() - t0))

for name, fpss in results.items():
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "scank": SCANK, "best_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
