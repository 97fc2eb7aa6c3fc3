"""Structural-floor probe for the SCL fast kernel's pallas_call shape:
same grid, BlockSpecs, scratch shapes and output shapes as
scl_decode_fast at [N, L, B], but the kernel body only (a) zero-inits the
scratch the way the real kernel does and writes constant outputs
("init"), or (b) writes constant outputs only ("bare").  Measures the
per-call and per-grid-step cost floor that NO amount of compute-phase
optimization can beat — the round-4 ablation campaign found the full
kernel runs within ~11 % of the all-phases-ablated kernel, so the floor
is where the time is.

Usage: python scripts/probe_floor.py [N] [L] [B] [iters] [reps]
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

from polardecoding_tpu.ops.pallas.scl_fast_kernel import (
    LANES,
    frames_per_tile,
)
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

n = N.bit_length() - 1
T = 1
F = LANES // L
fpt = frames_per_tile(L, B)
fs = fpt // F
C = B // (T * fpt)
S = 1
NS = n - 1 - S
SROWS = max(2 * NS, 1)
LBITS = max(1, (L - 1).bit_length())
DPF = max(1, 24 // LBITS)
PSR = (SROWS + DPF - 1) // DPF
print(json.dumps({"grid_C": C, "fs": fs, "PSR": PSR}), flush=True)


def _body(init, ch_ref, fr_ref, u_out_ref, pm_out_ref, tie_out_ref,
          llr, bits, sig, gat, pm_ref, ub_ref, tie_ref):
    if init:
        for t in range(T):
            llr[t] = jnp.zeros((N, fs, LANES), jnp.float32)
            bits[t] = jnp.zeros((N, fs, LANES), jnp.float32)
            sig[t] = jnp.zeros((PSR, fs, LANES), jnp.float32)
            pm_ref[t] = jnp.zeros((1, fs, LANES), jnp.float32)
            ub_ref[t] = jnp.zeros((1, fs, LANES), jnp.float32)
            tie_ref[t] = jnp.zeros((1, fs, LANES), jnp.float32)
    u_out_ref[...] = jnp.zeros((T, N, fs, LANES), jnp.int8)
    pm_out_ref[...] = jnp.zeros((T, 1, fs, LANES), jnp.float32)
    tie_out_ref[...] = jnp.zeros((T, 1, fs, LANES), jnp.int32)


def make(init):
    kernel = functools.partial(_body, init)

    def run(ch_c, fr_row):
        u, pm, tie = pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((None, T, N, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, T, N, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, T, 1, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, T, 1, fs, LANES),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((C, T, N, fs, LANES), jnp.int8),
                jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.float32),
                jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.int32),
            ),
            scratch_shapes=(
                pltpu.VMEM((T, N, fs, LANES), jnp.float32),
                pltpu.VMEM((T, N, fs, LANES), jnp.float32),
                pltpu.VMEM((T, PSR, fs, LANES), jnp.float32),
                pltpu.VMEM((T, N // 2, fs, LANES), jnp.float32),
                pltpu.VMEM((T, 1, fs, LANES), jnp.float32),
                pltpu.VMEM((T, 1, fs, LANES), jnp.float32),
                pltpu.VMEM((T, 1, fs, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ch_c, fr_row)
        return jnp.sum(pm) + jnp.sum(tie)

    return jax.jit(run)


fr_row = jnp.asarray(np.asarray(frozen_mask(N, N // 2), np.int32))[None, :]
rng = np.random.default_rng(0)
ch = rng.normal(size=(B, N)).astype(np.float32) * 2
ch_c = jnp.asarray(
    np.tile(ch.reshape(C, T, fs, F, N).transpose(0, 1, 4, 2, 3),
            (1, 1, 1, 1, L)))

variants = {"bare": make(False), "init": make(True)}
for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(ch_c, fr_row)))
    print(json.dumps({"variant": name,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(ch_c, fr_row))
        t0 = time.perf_counter()
        window = [f(ch_c, fr_row) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        dt = time.perf_counter() - t0
        results[name].append(iters * B / dt)

for name, fpss in results.items():
    best = max(fpss)
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "best_equiv_fps": round(best, 1),
                      "ms_per_call": round(B / best * 1000, 2),
                      "us_per_grid_step": round(B / best * 1e6 / C, 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
