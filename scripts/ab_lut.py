"""A/B: balanced select-TREE lut_correction (depth 3) vs the original
serial select CHAIN (depth 7) inside the frozen-specialized SCL kernel —
bit-identical outputs (equality asserted on-device), pure latency probe
for the round-4 "the kernel is latency-bound on its chk/PHI chains"
attribution.  DVFS-resistant methodology of ab_scl.py.

Usage: python scripts/ab_lut.py [N] [L] [B] [iters] [reps]
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

import polardecoding_tpu.ops.chk as chk_mod
import polardecoding_tpu.ops.pallas.scl_fast_kernel as fk
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

frt = tuple(bool(b) for b in np.asarray(frozen_mask(N, N // 2)))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)


def lut_chain(x):
    """The pre-round-4 linear ladder (depth 7), literal values."""
    dt = x.dtype
    out = jnp.asarray(chk_mod.LUT_VALUES[-1], dt)
    for t, v in zip(reversed(chk_mod.LUT_THRESHOLDS),
                    reversed(chk_mod.LUT_VALUES[:-1])):
        out = jnp.where(x >= t, out, jnp.asarray(v, dt))
    return jnp.broadcast_to(out, x.shape)


def chk_with(lut):
    def chk(a, b):
        s = jnp.where((a >= 0) == (b >= 0), 1.0, -1.0).astype(a.dtype)
        m = jnp.minimum(jnp.abs(a), jnp.abs(b))
        delta = lut(jnp.abs(a + b)) - lut(jnp.abs(a - b))
        return s * m + delta
    return chk


def _scalar(out):
    return jnp.sum(out[1]) + jnp.sum(out[2])


# the module-level scl_decode_fast is itself jitted and would CACHE the
# first variant's trace (static args identical) — trace the RAW function
# so each closure retraces with its own rebound lut
_raw_decode = fk.scl_decode_fast.__wrapped__


def make(lut):
    # the kernel module binds chk/lut_correction at import; rebind per
    # variant (restored after tracing — jit retraces per new closure id)
    def f(x):
        old = (fk.lut_correction, fk.chk)
        fk.lut_correction, fk.chk = lut, chk_with(lut)
        try:
            out = _raw_decode(x, frt, list_size=L, wloop=2)
        finally:
            fk.lut_correction, fk.chk = old
        return _scalar(out), out

    def g(x):
        s, _ = f(x)
        return s

    return scan_jit(g), f


from _scanwrap import SCANK, scan_jit  # noqa: E402  (PD_SCANK dispatch-floor fix)

variants = {"tree": make(chk_mod.lut_correction), "chain": make(lut_chain)}

for name, (f, _) in variants.items():
    t0 = time.perf_counter()
    float(np.asarray(f(llr)))
    print(json.dumps({"variant": name, "N": N, "L": L,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)


@jax.jit
def _mismatch(x):
    (_, (ua, pma, ta)) = variants["tree"][1](x)
    (_, (ub, pmb, tb)) = variants["chain"][1](x)
    return (jnp.sum(jnp.abs(ua.astype(jnp.int32) - ub.astype(jnp.int32)))
            + jnp.sum(jnp.where(pma != pmb, 1, 0)) + jnp.sum(jnp.abs(ta - tb)))


mm = int(np.asarray(_mismatch(llr[: max(128, (128 // L) * 16)])))
print(json.dumps({"parity": "tree_vs_chain_on_hw", "mismatches": mm,
                  "bit_identical": mm == 0}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, (f, _) in variants.items():
        np.asarray(f(llr))
        t0 = time.perf_counter()
        window = [f(llr) for _ in range(iters)]
        for o in window:
            np.asarray(o)
        results[name].append(iters * SCANK * B / (time.perf_counter() - t0))

for name, fpss in results.items():
    print(json.dumps({"variant": name, "N": N, "L": L, "B": B,
                      "scank": SCANK, "best_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
