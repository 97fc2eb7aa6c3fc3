"""A/B: chunked VALUE accumulation in sig_read vs the incumbent gat-ref
accumulation (scl_decode_fast sig_chunk=), at TRUE rates (PD_SCANK).
Sigma re-gathers are 28.9% of kernel time (round-4 ablation); each ref
+= is a read+add+write round trip the value form drops.  Bit-identical
(same one-hot adds, same d order per chunk) — parity asserted on-device.

Usage: python scripts/ab_sigchunk.py [N] [L] [B] [iters] [reps]
Env: PD_CHUNKS (default "0,16,64"), PD_SCANK
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
CHUNKS = tuple(int(v) for v in
               os.environ.get("PD_CHUNKS", "0,16,64").split(","))

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


variants = {}
for ch in CHUNKS:
    variants[f"chunk{ch}"] = scan_jit(
        lambda x, ch=ch: _scalar(scl_decode_fast(x, frt, list_size=L,
                                                 wloop=2, sig_chunk=ch)))

for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

sub = max(128, (128 // L) * 8)


@jax.jit
def _mismatch(x):
    ua, pma, ta = scl_decode_fast(x, frt, list_size=L, wloop=2)
    m = jnp.int32(0)
    for ch in CHUNKS[1:]:
        ub, pmb, tb = scl_decode_fast(x, frt, list_size=L, wloop=2,
                                      sig_chunk=ch)
        m = (m + jnp.sum(jnp.abs(ua.astype(jnp.int32) - ub.astype(jnp.int32)))
             + jnp.sum(jnp.where(pma != pmb, 1, 0)))
    return m


mm = int(np.asarray(_mismatch(llr[:sub])))
print(json.dumps({"parity": "chunk_vs_ref_on_hw", "mismatches": mm,
                  "bit_identical": mm == 0}), flush=True)

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
