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


def flavor_parity(p, frozen, llr, frames):
    """HW parity for the two opt-in fast-kernel flavors (advisor r4):

    - stacked=True claims bit-identity with the non-stacked schedule; the
      CPU proof ran in interpret mode only, and the stacked rank's
      subtract-sign compares could in principle diverge under TPU
      subnormal flush-to-zero — so compare both kernels ON HARDWARE.
    - r1>0 (production FASTR1) claims bit-identity with the numpy twin
      (tests/scl_fast_ref.decode_batch) — verify the HW kernel against it.
    """
    from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from scl_fast_ref import decode_batch

    frt = tuple(bool(b) for b in np.asarray(frozen))
    fails = 0
    base = jax.jit(lambda x: scl_decode_fast(x, frt, list_size=8, wloop=2))
    stk = jax.jit(lambda x: scl_decode_fast(x, frt, list_size=8, wloop=2,
                                            stacked=True))
    ub, pmb, tb = base(llr)
    us, pms, ts = stk(llr)
    ok = (bool(jnp.all(ub == us)) and bool(jnp.all(pmb == pms))
          and bool(jnp.all(tb == ts)))
    fails += 0 if ok else 1
    print(json.dumps({"flavor": "stacked", "N": int(llr.shape[1]),
                      "frames": frames, "bit_identical": ok}), flush=True)

    r1j = jax.jit(lambda x: scl_decode_fast(x, frt, list_size=8, wloop=2,
                                            r1=4))
    uk, pmk, tk = r1j(llr)
    un, pmn, tn = decode_batch(np.asarray(llr), list(frt), 8, wloop=2,
                               r1min=4)
    ok = bool((un == np.asarray(uk)).all() and (pmn == np.asarray(pmk)).all()
              and (tn == np.asarray(tk)).all())
    fails += 0 if ok else 1
    print(json.dumps({"flavor": "r1=4", "N": int(llr.shape[1]),
                      "frames": frames, "bit_identical_vs_twin": ok}),
          flush=True)
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--flavors", action="store_true",
                    help="also check stacked=True and r1 flavor parity "
                         "(N=1024 production config)")
    ap.add_argument("--flavors-only", action="store_true")
    args = ap.parse_args()

    if args.flavors_only:
        p = preset("SCL_1024_L8")
        frozen = jnp.asarray(code_frozen_mask(p.code))
        nf = min(args.frames, 128)  # numpy twin at N=1024 is the wall
        llr = channel_llrs(p, nf, 1.5)
        fails = flavor_parity(p, frozen, llr, nf)
        print("PARITY " + ("PASS" if fails == 0 else f"FAIL ({fails})"),
              flush=True)
        sys.exit(1 if fails else 0)

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
        if args.flavors and ncode == 1024:
            nf = min(args.frames, 128)
            fails += flavor_parity(p, frozen, llr[:nf], nf)
    print("PARITY " + ("PASS" if fails == 0 else f"FAIL ({fails})"), flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
