"""Hardware sanity for the latched per-frame early-stop BP engines.

Two checks on the real chip (the CPU suite already proves both engines
bit-identical to each other and to the fixed-iteration decode on converged
frames — tests/test_bp.py):

1. parity — decoded bits of the Pallas latched-ES kernel equal the jnp
   latched-ES engine on the same channel LLRs (extends the CPU equality
   chain to the Mosaic lowering, same spirit as scl_parity_hw.py).
2. compile/health — the while_loop over [TB, N] carries inside the kernel
   compiles and runs at a sane rate (prints fps for the record; the
   authoritative ES number is bench.py's wave engine).

Usage: python scripts/es_sanity_hw.py [--frames 1024] [--snr 2.5]
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
import numpy as np

from polardecoding_tpu.configs import preset
from polardecoding_tpu.models.bp import bp_decode
from polardecoding_tpu.ops.pallas.bp_kernel import bp_decode_pallas
from scl_parity_hw import channel_llrs  # same frame-generation recipe
from polardecoding_tpu.analysis.construction import code_frozen_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--snr", type=float, default=2.5)
    args = ap.parse_args()

    fails = 0
    for name in ("BP_128", "BP_1024"):
        p = preset(name)
        frozen = jnp.asarray(code_frozen_mask(p.code))
        llr = channel_llrs(p, args.frames, args.snr)

        t0 = time.perf_counter()
        uk = jax.jit(
            lambda x: bp_decode_pallas(x, frozen, iters=100,
                                       early_stop_every=4)
        )(llr)
        uk = np.asarray(uk)
        t_pallas = time.perf_counter() - t0

        uj = np.asarray(jax.jit(
            lambda x: bp_decode(x, frozen, iters=100, early_stop_every=4)
        )(llr))
        eq = bool((uk == uj).all())
        fails += 0 if eq else 1
        print(json.dumps({
            "preset": name, "frames": args.frames, "snr_db": args.snr,
            "bits_equal": eq,
            "first_call_s": round(t_pallas, 2),
        }), flush=True)
    print("ES-SANITY " + ("PASS" if fails == 0 else f"FAIL ({fails})"),
          flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
