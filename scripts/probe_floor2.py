"""Floor dissection: which element of the SCL fast kernel's pallas_call
costs the ~376 us/grid-step the empty-kernel probe measured?

Variants (all empty-compute, shape-matched to scl_decode_fast at
N=1024 L=8 fs=8 unless noted):
  bare      — probe_floor.py's baseline (4 MB ch DMA in, 1 MB i8 u out)
  C16/C4    — same per-step shapes, smaller batch -> fewer grid steps:
              separates per-call from per-step cost
  noscratch — drop the llr/bits/gat VMEM scratch allocations
  no_u      — u_out shrunk to one row (kills the [N,fs,128] i8 block write)
  u_i32     — u_out int32 (layout probe: i8 stores pad 8-sublane tiles)
  no_in     — input left in HBM (ANY memory space, never copied/read)

Usage: python scripts/probe_floor2.py [iters] [reps]
"""
from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

N, fs, LANES, T, PSR = 1024, 8, 128, 1, 2
FPT = fs * (LANES // 8)  # fpt at L=8


def make(B, *, scratch=True, u_rows=N, u_dtype=jnp.int8, dma_in=True):
    C = B // FPT

    def body(ch_ref, u_out_ref, pm_out_ref):
        u_out_ref[...] = jnp.zeros((T, u_rows, fs, LANES), u_dtype)
        pm_out_ref[...] = jnp.zeros((T, 1, fs, LANES), jnp.float32)

    def body_s(ch_ref, u_out_ref, pm_out_ref, llr, bits, gat):
        body(ch_ref, u_out_ref, pm_out_ref)

    in_spec = pl.BlockSpec(
        (None, T, N, fs, LANES), lambda g: (g, 0, 0, 0, 0),
        memory_space=pltpu.VMEM) if dma_in else pl.BlockSpec(
        memory_space=pltpu.ANY)

    scratches = (
        pltpu.VMEM((T, N, fs, LANES), jnp.float32),
        pltpu.VMEM((T, N, fs, LANES), jnp.float32),
        pltpu.VMEM((T, N // 2, fs, LANES), jnp.float32),
    ) if scratch else ()

    def run(ch_c):
        u, pm = pl.pallas_call(
            body_s if scratch else body,
            grid=(C,),
            in_specs=[in_spec],
            out_specs=(
                pl.BlockSpec((None, T, u_rows, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, T, 1, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((C, T, u_rows, fs, LANES), u_dtype),
                jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.float32),
            ),
            scratch_shapes=scratches,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ch_c)
        return jnp.sum(pm)

    return jax.jit(run), C


VARIANTS = {
    "bare": make(8192),
    "C16": make(2048),
    "C4": make(512),
    "noscratch": make(8192, scratch=False),
    "no_u": make(8192, u_rows=1),
    "u_i32": make(8192, u_dtype=jnp.int32),
    "no_in": make(8192, dma_in=False),
}

rng = np.random.default_rng(0)
chs = {}
for name, (f, C) in VARIANTS.items():
    chs[name] = jnp.asarray(
        rng.normal(size=(C, T, N, fs, LANES)).astype(np.float32))
    t0 = time.perf_counter()
    float(np.asarray(f(chs[name])))
    print(json.dumps({"variant": name, "C": C,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in VARIANTS}
for r in range(reps):
    for name, (f, C) in VARIANTS.items():
        np.asarray(f(chs[name]))
        t0 = time.perf_counter()
        window = [f(chs[name]) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append((time.perf_counter() - t0) / iters)

for name, ts in results.items():
    C = VARIANTS[name][1]
    best = min(ts)
    print(json.dumps({"variant": name, "C": C,
                      "ms_per_call": round(best * 1000, 2),
                      "us_per_grid_step": round(best * 1e6 / C, 1),
                      "reps_ms": [round(v * 1000, 2) for v in ts]}),
          flush=True)
