"""Hardware parity check: subtree-hybrid SCL Pallas kernel vs the jnp
engine, at the list sizes the round-1 kernel could not serve in-kernel
(L=16/32) plus L=8 as a control, both N.

The jnp engine is oracle-tested against tests/reference_impl.py (and the
golden frames) on CPU; equality here extends that chain to the TPU kernel
at every shipped L.  Checks decoded bits AND per-path path metrics.

Usage: python scripts/scl_parity_hw.py [--frames 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.configs import preset
from polardecoding_tpu.models.scl import scl_decode
from polardecoding_tpu.ops.channel import awgn_llr
from polardecoding_tpu.ops.encode import polar_encode, scatter_info
from polardecoding_tpu.parallel.harness import payload_from_index
from polardecoding_tpu.utils.pn import pn_sequence
from polardecoding_tpu.analysis.construction import code_frozen_mask, code_info_set


def channel_llrs(p, frames, snr_db):
    code = p.code
    fidx = jnp.arange(frames, dtype=jnp.int32)
    payload = payload_from_index(fidx, jnp.asarray(pn_sequence()), code.K)
    u = scatter_info(payload, jnp.asarray(code_info_set(code)), code.N)
    x = polar_encode(u)
    key = jax.random.PRNGKey(p.sweep.seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(fidx)
    return awgn_llr(x, keys, jnp.float32(10.0 ** (-snr_db / 20.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    args = ap.parse_args()

    fails = 0
    for ncode, snr in ((128, 2.0), (1024, 1.5)):
        p = preset(f"SCL_{ncode}_L8")
        frozen = jnp.asarray(code_frozen_mask(p.code))
        llr = channel_llrs(p, args.frames, snr)
        for L in (8, 16, 32):
            from polardecoding_tpu.models.scl import _scl_kernel

            uk, pmk, _ = jax.jit(
                lambda x: _scl_kernel(x, frozen, L)
            )(llr)
            uj, pmj = jax.jit(
                lambda x: scl_decode(x, frozen, list_size=L, return_all=True)
            )(llr)
            bits_eq = bool(jnp.all(uk == uj))
            pm_eq = bool(jnp.all(jnp.abs(pmk - pmj) <= 1e-3 * jnp.abs(pmj)))
            ok = bits_eq and pm_eq
            fails += 0 if ok else 1
            print(json.dumps({
                "N": ncode, "L": L, "frames": args.frames, "snr_db": snr,
                "bits_equal": bits_eq, "pm_close": pm_eq,
                "max_pm_err": float(jnp.max(jnp.abs(pmk - pmj))),
            }), flush=True)
    print("PARITY " + ("PASS" if fails == 0 else f"FAIL ({fails})"), flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
