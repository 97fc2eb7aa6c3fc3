"""Phase-cost attribution of the frozen-specialized SCL kernel by ABLATION
(round-3 verdict item 1b): each variant stubs out one phase of the kernel
(scl_decode_fast(ablate=...) — WRONG results, identical shapes/dataflow) and
the fps delta vs the full kernel measures that phase's real cost, to be set
against scripts/op_model.py's per-category row counts.

Methodology: kernel-only, outputs reduced to one on-device scalar (PM fetch
saturates the tunnel — ab_sclfast.py note), >=1 s windows, interleaved
round-robin reps, best-of-reps.

Usage: python scripts/ablate_scl.py [N] [L] [B] [iters] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
# Default sweep is env-tunable: the first round (sigread/forkeager/
# forkrank/loopdescent) measured FLAT — those phases hide in the shadow of
# the rest — so the second round ablates the remaining candidates
# (forksel/descent/boundaryfg).  Each variant costs a ~2-6 min Mosaic
# compile at N=1024 (compile budget note in ROOFLINE).
# "+" joins multiple phases within ONE variant (translated to the kernel's
# comma-separated ablate string)
PHASES = tuple(p.replace("+", ",") for p in os.environ.get(
    "PD_PHASES", ",sigread,forkeager,forkrank,loopdescent").split(","))

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


from _scanwrap import SCANK, scan_jit  # noqa: E402  (PD_SCANK dispatch-floor fix)

variants = {}
for ph in PHASES:
    name = ph or "full"
    variants[name] = scan_jit(
        lambda x, ph=ph: _scalar(scl_decode_fast(x, frt, list_size=L,
                                                 wloop=2, ablate=ph)))

for name, f in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr))  # re-warm
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append(iters * SCANK * B / (time.perf_counter() - t0))

# the share column needs the un-ablated baseline; a PD_PHASES list without
# the empty entry still prints raw fps (don't lose the measurements)
full = max(results["full"]) if "full" in results else None
for name, fpss in results.items():
    best = max(fpss)
    # share of full-kernel time attributable to the ablated phase
    share = (0.0 if name == "full" else 1.0 - full / best) \
        if full is not None else None
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "scank": SCANK, "best_fps": round(best, 1),
                      "time_share_of_full":
                      None if share is None else round(share, 4),
                      "reps": [round(v) for v in fpss]}), flush=True)
