"""SCL tree-kernel throughput across N and L on the real chip, kernel-only
(decode of pre-generated channel LLRs) plus the full-MC-pipeline rate at the
north-star config, with the host-forced-scalar sync discipline (bench.py).

Usage: python scripts/bench_scl.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from bench import bench_step
from polardecoding_tpu.configs import preset
from polardecoding_tpu.analysis.construction import code_frozen_mask
from scl_parity_hw import channel_llrs


def bench_kernel(ncode, L, batch, snr=1.5, iters=8, warmup=3):
    p = preset(f"SCL_{ncode}_L8")
    frozen = jnp.asarray(code_frozen_mask(p.code))
    llr = channel_llrs(p, batch, snr)
    from polardecoding_tpu.models.scl import _scl_kernel

    # scalar-reduced output: fetching PM [B, L] per timed iteration is
    # tunnel-bound at these batches (ab_sclfast.py lesson — the r3 first
    # run of this script read kernel_fps BELOW full-MC fps); jnp.sum keeps
    # the compute alive with a 4-byte readback
    f = jax.jit(lambda x: jnp.sum(_scl_kernel(x, frozen, L)[1]))
    import numpy as np

    for _ in range(warmup):
        np.asarray(f(llr))
    t0 = time.perf_counter()
    outs = [f(llr) for _ in range(iters)]
    for o in outs:
        np.asarray(o)
    return (iters * batch) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    # batches sized for >=1 s timed windows: the round-2 run at B=256/128
    # was dispatch-latency-bound through the tunnel and reported ~15x-low
    # numbers (kernel 7.8k vs 126k for the same config at B=8192)
    grid = ([(128, 8, 8192), (1024, 8, 4096)] if args.quick else
            [(128, 8, 8192), (128, 16, 8192), (128, 32, 8192),
             (1024, 1, 8192), (1024, 8, 4096), (1024, 16, 2048),
             (1024, 32, 1024)])
    for ncode, L, batch in grid:
        fps = bench_kernel(ncode, L, batch)
        print(json.dumps({"N": ncode, "L": L, "batch": batch,
                          "kernel_fps": round(fps, 1)}), flush=True)

    full = bench_step("SCL_1024_L8", 4096, 2.0, iters=8, warmup=3)
    print(json.dumps({"N": 1024, "L": 8, "batch": 4096,
                      "full_mc_fps": round(full, 1)}), flush=True)
    if not args.quick:
        # the L=32 flagship preset through the full pipeline (lane kernel,
        # S=2 default — compile ~10 min first time, then cached)
        full32 = bench_step("CASCL_1024_L32", 512, 2.0, iters=4, warmup=2)
        print(json.dumps({"preset": "CASCL_1024_L32", "batch": 512,
                          "full_mc_fps": round(full32, 1)}), flush=True)


if __name__ == "__main__":
    main()
