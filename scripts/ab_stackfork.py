"""A/B: across-d stacked fork emission vs the incumbent per-d height-1
chains in the frozen-specialized SCL kernel (scl_decode_fast stacked=),
DVFS-resistant methodology of ab_scl.py (kernel-only, scalar-reduced
outputs, >=1 s windows, interleaved best-of-reps).

The two variants are BIT-IDENTICAL by construction (every cross-d
accumulation the stacked path re-associates is one-hot) — verified here on
the benchmarked batch before timing via an on-device comparison reduced to
one scalar (no tunnel traffic).

Usage: python scripts/ab_stackfork.py [N] [L] [B] [iters] [reps]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


from _scanwrap import SCANK, scan_jit  # noqa: E402  (PD_SCANK dispatch-floor fix)

variants = {
    "flat": scan_jit(lambda x: _scalar(
        scl_decode_fast(x, frt, list_size=L, wloop=2))),
    "stacked": scan_jit(lambda x: _scalar(
        scl_decode_fast(x, frt, list_size=L, wloop=2, stacked=True))),
}

for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)


@jax.jit
def _mismatch(x):
    ua, pma, ta = scl_decode_fast(x, frt, list_size=L, wloop=2)
    ub, pmb, tb = scl_decode_fast(x, frt, list_size=L, wloop=2, stacked=True)
    return (jnp.sum(jnp.abs(ua.astype(jnp.int32) - ub.astype(jnp.int32)))
            + jnp.sum(jnp.where(pma != pmb, 1, 0))
            + jnp.sum(jnp.abs(ta - tb)))


mm = int(np.asarray(_mismatch(llr[: max(128, 2 * (128 // L) * 8)])))
print(json.dumps({"parity": "stacked_vs_flat_on_hw", "mismatches": mm,
                  "bit_identical": mm == 0}), flush=True)

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
