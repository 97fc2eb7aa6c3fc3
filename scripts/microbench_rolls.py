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


def run(kind, iters, L=8, rows=8):
    rng = np.random.default_rng(0)
    if kind == "gather":
        shape = (1, 8, LANES)
        kern = functools.partial(_gather_kernel, iters=iters, L=L)
        # per fori iteration: L x (roll + cmp-mask + mul + add) on 1 row
        ops_per_iter = L * 4 * 8 * LANES
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
                     ("chkrow", {"rows": 8}), ("chkrow", {"rows": 64})):
        ops = run(kind if kind != "chkrow" else "chk", args.iters, **kw)
        print(json.dumps({"pattern": kind, **kw,
                          "lane_ops_per_s": round(ops / 1e9, 1),
                          "unit": "G/s",
                          "of_nominal_peak": round(ops / PEAK, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
