"""Dispatch-floor characterization: probe_floor2 found an empty
pallas_call costs ~24 ms PER CALL through the axon tunnel regardless of
grid size (C=4 vs C=64 identical).  Here: (a) how does ms/call scale with
MUCH bigger grids (C up to 512)?  (b) is the cost per jit DISPATCH or per
pallas_call (10 sequential pallas_calls inside one jit)?  (c) does
lax.scan-wrapping the kernel amortize it?

Usage: python scripts/probe_floor3.py [iters] [reps]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

N, fs, LANES, T = 1024, 8, 128, 1
FPT = fs * (LANES // 8)


def bare_call(ch_c, C):
    def body(ch_ref, u_out_ref, pm_out_ref):
        u_out_ref[...] = jnp.zeros((T, N, fs, LANES), jnp.int8)
        pm_out_ref[...] = jnp.zeros((T, 1, fs, LANES), jnp.float32)

    u, pm = pl.pallas_call(
        body,
        grid=(C,),
        in_specs=[pl.BlockSpec((None, T, N, fs, LANES),
                               lambda g: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, T, N, fs, LANES), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, 1, fs, LANES), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, T, N, fs, LANES), jnp.int8),
            jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ch_c)
    return jnp.sum(pm)


def make_plain(C):
    return jax.jit(lambda ch: bare_call(ch, C)), C, 1


def make_x(C, k):
    def run(ch):
        s = jnp.float32(0)
        for _ in range(k):
            s = s + bare_call(ch, C) + s * 0  # keep all k calls live
        return s
    return jax.jit(run), C, k


def make_scan(C, k):
    def run(ch):
        def step(carry, _):
            return carry + bare_call(ch, C), None
        s, _ = lax.scan(step, jnp.float32(0), None, length=k)
        return s
    return jax.jit(run), C, k


VARIANTS = {
    "C64": make_plain(64),
    "C128": make_plain(128),
    "C512": make_plain(512),
    "C4_x10": make_x(4, 10),
    "C64_x10": make_x(64, 10),
    "C64_scan20": make_scan(64, 20),
}

rng = np.random.default_rng(0)
chs = {}
for name, (f, C, k) in VARIANTS.items():
    chs[name] = jnp.asarray(
        rng.normal(size=(C, T, N, fs, LANES)).astype(np.float32))
    t0 = time.perf_counter()
    float(np.asarray(f(chs[name])))
    print(json.dumps({"variant": name, "C": C, "k": k,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in VARIANTS}
for r in range(reps):
    for name, (f, C, k) in VARIANTS.items():
        np.asarray(f(chs[name]))
        t0 = time.perf_counter()
        window = [f(chs[name]) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append((time.perf_counter() - t0) / iters)

for name, ts in results.items():
    _, C, k = VARIANTS[name]
    best = min(ts)
    print(json.dumps({"variant": name, "C": C, "k": k,
                      "ms_per_jit_call": round(best * 1000, 2),
                      "ms_per_inner_call": round(best * 1000 / k, 2),
                      "reps_ms": [round(v * 1000, 2) for v in ts]}),
          flush=True)
