"""A/B: frozen-specialized (fast) SCL kernel vs the incumbent generation,
with the DVFS-resistant methodology of ab_scl.py (>=1 s timed windows,
interleaved round-robin reps, best-of-reps) plus per-variant COMPILE wall
time (the fast kernel's static schedule changes the traced-program size —
docs/ROOFLINE.md trace table).

Incumbent: per-path-refs subtree kernel at L<=8, paths-in-lanes tree kernel
at L>=16 (models/scl.py dispatch).  Variants: scl_decode_fast at wloop in
WLOOPS.  Also verifies bit parity of every variant against the incumbent on
the benchmarked batch before timing (free — the outputs are already there).

Usage: python scripts/ab_sclfast.py [N] [L] [B] [iters] [reps]
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

from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
WLOOPS = tuple(int(v) for v in
               os.environ.get("PD_WLOOPS", "2,4,8").split(","))

fr_np = np.asarray(frozen_mask(N, N // 2))
fr = jnp.asarray(fr_np)
frt = tuple(bool(b) for b in fr_np)
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)

from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast
from polardecoding_tpu.ops.pallas.scl_subtree_kernel import scl_decode_subtree
from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

# scalar-reduced outputs: fetching PM [B, L] per timed iteration saturates
# the ~10 MB/s tunnel at B=8192 (24 x 256 KB = 0.6 s — the N=128 round-3
# run read a flat ~240k fps for every variant: fetch-bound, not compute).
# jnp.sum keeps all compute alive while the host readback is 4 bytes.
# XLA still dead-code-eliminates the u_all transpose, as the harness does.
def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


if L <= 8:
    incumbent = ("subtree", jax.jit(
        lambda x: _scalar(scl_decode_subtree(x, fr, list_size=L))))
else:
    incumbent = ("tree", jax.jit(
        lambda x: _scalar(scl_decode_tree(x, fr, list_size=L))))

variants = {incumbent[0]: incumbent[1]}
for wl in WLOOPS:
    variants[f"fast_w{wl}"] = jax.jit(
        lambda x, wl=wl: _scalar(scl_decode_fast(x, frt, list_size=L,
                                                 wloop=wl)))

# full-output parity probes (decoded bits must agree across generations)
inc_full = (jax.jit(lambda x: scl_decode_subtree(x, fr, list_size=L))
            if L <= 8 else
            jax.jit(lambda x: scl_decode_tree(x, fr, list_size=L)))

outs = {}
for name, f in variants.items():  # compile (timed) + clock spin-up
    t0 = time.perf_counter()
    outs[name] = float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s": round(time.perf_counter() - t0,
                                                    1)}), flush=True)

u_inc = np.asarray(inc_full(llr)[0])
for wl in WLOOPS:
    u_fast = np.asarray(jax.jit(
        lambda x, wl=wl: scl_decode_fast(x, frt, list_size=L, wloop=wl))(llr)[0])
    pm_eq = outs[incumbent[0]] == outs[f"fast_w{wl}"]
    print(json.dumps({"parity": f"fast_w{wl}", "bits_equal":
                      bool((u_inc == u_fast).all()), "pm_sum_equal": pm_eq}),
          flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr))  # re-warm
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append(iters * B / (time.perf_counter() - t0))

for name, fpss in results.items():
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "best_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
