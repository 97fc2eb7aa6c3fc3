"""Empirical VPU ceiling for the SCL fast kernel's hot op pattern.

The kernel's forks/gathers are chains of {pltpu.roll + compare-mask + mul +
add} on single-vreg [1, 8, 128] rows.  The analytic op model weighs these
at nominal VPU issue (3.85 T lane-op/s on v5e); this microbench measures
what Mosaic ACTUALLY sustains for exactly that pattern, so the kernel's
utilization can be judged against an empirical bound instead of a nominal
one (ROOFLINE round-3 utilization note).

Two patterns:
  gather: acc += where(sel == const, 1, 0) * roll(x, d)   (the L-roll loop)
  chkrow: chk(a, b) on [8, 128] rows                      (the f/g chains)

Usage: python scripts/microbench_rolls.py [--iters 200000]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk

LANES = 128


def _gather_kernel(x_ref, o_ref, acc, *, iters, L):
    pidx = lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 2) // (LANES // L)
    pmd = [(pidx - d) % L for d in range(L)]
    acc[:] = x_ref[:]

    def body(i, c):
        a = acc[:]
        out = jnp.zeros((1, 8, LANES), jnp.float32)
        for d in range(L):
            m = jnp.where(pmd[d] == pidx, 1.0, 0.0)
            out = out + m * pltpu.roll(a, d * (LANES // L), axis=2)
        acc[:] = out * 0.5  # keep values bounded
        return c

    lax.fori_loop(0, iters, body, jnp.int32(0))
    o_ref[:] = acc[:]


def _chk_kernel(x_ref, o_ref, acc, *, iters, rows):
    acc[:] = x_ref[:]

    def body(i, c):
        a = acc[:]
        up, dn = a[: rows // 2], a[rows // 2 :]
        acc[:] = jnp.concatenate([chk(up, dn), dn + 0.999 * up], axis=0)
        return c

    lax.fori_loop(0, iters, body, jnp.int32(0))
    o_ref[:] = acc[:]


def _gather_rows_kernel(x_ref, o_ref, acc, *, iters, L, rows):
    """The kernel's MULTI-ROW roll-mask gather (sig_read / fork eager copy):
    rows x {roll + cmp-mask + mul + add} per of L terms, rows independent —
    the calibration row for boundary_sigread / fork_eager / fork_gather."""
    pidx = lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 2) // (LANES // L)
    pmd = [(pidx - d) % L for d in range(L)]
    acc[:] = x_ref[:]

    def body(i, c):
        a = acc[:]
        out = jnp.zeros((rows, 8, LANES), jnp.float32)
        for d in range(L):
            m = jnp.where(pmd[d] == pidx, 1.0, 0.0)
            out = out + m * pltpu.roll(a, d * (LANES // L), axis=2)
        acc[:] = out * 0.5
        return c

    lax.fori_loop(0, iters, body, jnp.int32(0))
    o_ref[:] = acc[:]


def _lut_kernel(x_ref, o_ref, acc, *, iters, rows):
    """The 8-bin LUT ladder alone (7 cmp + 7 sel per lookup) — calibrates
    the LUT=14 weight that dominates chk/PHI."""
    from polardecoding_tpu.ops.chk import lut_correction

    acc[:] = x_ref[:]

    def body(i, c):
        a = acc[:]
        acc[:] = a * 0.9999 + lut_correction(jnp.abs(a)) * 0.001
        return c

    lax.fori_loop(0, iters, body, jnp.int32(0))
    o_ref[:] = acc[:]


def _rank_kernel(x_ref, o_ref, acc, *, iters, L):
    """The fork's 2L-candidate rank pattern: per d, 2 rolls + 6 cmp/or +
    4 add on single rows — calibrates fork_rank."""
    pidx = lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 2) // (LANES // L)
    pidxf = ((pidx - 0) % L).astype(jnp.float32)
    pmd = [((pidx - d) % L).astype(jnp.float32) for d in range(L)]
    acc[:] = x_ref[:]

    def body(i, c):
        c0 = acc[:]
        c1 = c0 * 1.0001
        rank0 = jnp.zeros((1, 8, LANES), jnp.int32)
        rank1 = jnp.zeros((1, 8, LANES), jnp.int32)
        for d in range(L):
            silt = pmd[d] < pidxf
            r0 = pltpu.roll(c0, d * (LANES // L), axis=2)
            r1 = pltpu.roll(c1, d * (LANES // L), axis=2)
            rank0 = rank0 + ((r0 < c0) | ((r0 == c0) & silt)) + (r1 < c0)
            rank1 = rank1 + ((r0 < c1) | (r0 == c1)) \
                + ((r1 < c1) | ((r1 == c1) & silt))
        acc[:] = c0 * 0.9999 + rank0.astype(jnp.float32) * 1e-6 \
            + rank1.astype(jnp.float32) * 1e-6
        return c

    lax.fori_loop(0, iters, body, jnp.int32(0))
    o_ref[:] = acc[:]


def run(kind, iters, L=8, rows=8):
    rng = np.random.default_rng(0)
    if kind == "gather":
        shape = (1, 8, LANES)
        kern = functools.partial(_gather_kernel, iters=iters, L=L)
        # per fori iteration: L x (roll + cmp-mask + mul + add) on 1 row
        ops_per_iter = L * 4 * 8 * LANES
    elif kind == "gather_rows":
        shape = (rows, 8, LANES)
        kern = functools.partial(_gather_rows_kernel, iters=iters, L=L,
                                 rows=rows)
        ops_per_iter = L * 4 * rows * 8 * LANES
    elif kind == "lut":
        shape = (rows, 8, LANES)
        kern = functools.partial(_lut_kernel, iters=iters, rows=rows)
        # lut = 7 cmp + 7 sel (+ abs + mul/add harness = 4)
        ops_per_iter = (14 + 4) * rows * 8 * LANES
    elif kind == "rank":
        shape = (1, 8, LANES)
        kern = functools.partial(_rank_kernel, iters=iters, L=L)
        # per d: 2 rolls + ~10 cmp/or/add rows, + ~5 harness ops
        ops_per_iter = (L * 12 + 5) * 8 * LANES
    else:
        shape = (rows, 8, LANES)
        kern = functools.partial(_chk_kernel, iters=iters, rows=rows)
        # chk = ~47 elementwise ops on rows/2 rows + g on rows/2
        ops_per_iter = (47 + 3) * (rows // 2) * 8 * LANES
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    f = jax.jit(lambda v: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        scratch_shapes=(pltpu.VMEM(shape, jnp.float32),),
    )(v))
    np.asarray(f(x))  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        dt = time.perf_counter() - t0
        best = max(best, iters * ops_per_iter / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200_000)
    args = ap.parse_args()
    PEAK = 3.85e12
    for kind, kw in (("gather", {"L": 8}), ("gather", {"L": 32}),
                     ("gather_rows", {"L": 8, "rows": 8}),
                     ("gather_rows", {"L": 8, "rows": 32}),
                     ("gather_rows", {"L": 8, "rows": 128}),
                     ("lut", {"rows": 8}), ("lut", {"rows": 32}),
                     ("rank", {"L": 8}),
                     ("chkrow", {"rows": 8}), ("chkrow", {"rows": 64})):
        ops = run(kind if kind != "chkrow" else "chk", args.iters, **kw)
        print(json.dumps({"pattern": kind, **kw,
                          "lane_ops_per_s": round(ops / 1e9, 1),
                          "unit": "G/s",
                          "of_nominal_peak": round(ops / PEAK, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
