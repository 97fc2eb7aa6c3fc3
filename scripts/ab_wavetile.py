"""Kernel-only A/B: Pallas tile size (TB) of the fused BP wave kernel —
round-4 verdict item 2 ("T-tile ILP interleave in the BP sweep kernel").

Context for the expected result: the SCL fast kernel's tiles= interleave
paid (+10 % T2) because its ops are SINGLE-VREG [8, 128] dependent chains
— the VPU pipeline drains between dependent instructions.  The BP sweep's
ops are [TB, N] = TB*N/1024 vregs each (32-128 vregs at production tiles),
so every instruction already issues across many independent vregs and the
dependent chain BETWEEN stages is amortized; the analogous knob here is
the pallas tile size itself (smaller TB = fewer vregs per op = less
intra-op ILP, bigger TB = more VMEM pressure).  This script measures that
directly at true rates (kernel calls chained through lax.scan inside one
dispatch — the state carry is a real dependency, so nothing hoists).

Usage: python scripts/ab_wavetile.py [B] [dispatches] [reps] [K] [scank]
Env: PD_TILES (default "16,32,64,128"), PD_N (default 1024)
"""
from __future__ import annotations

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

from polardecoding_tpu.analysis.construction import code_frozen_mask
from polardecoding_tpu.configs import preset
from polardecoding_tpu.models.bp import wave_init_state
from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
dispatches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
K = int(sys.argv[4]) if len(sys.argv) > 4 else 8
scank = int(sys.argv[5]) if len(sys.argv) > 5 else 8
TILES = [int(t) for t in os.environ.get("PD_TILES", "16,32,64,128").split(",")]
N = int(os.environ.get("PD_N", "1024"))

p = preset("BP_1024_FASTCHK" if N == 1024 else "BP_128_FASTCHK")
frozen = jnp.asarray(code_frozen_mask(p.code))
key = jax.random.PRNGKey(0)
llr = 2.0 * jax.random.normal(key, (B, N), jnp.float32) + 4.0
state0 = wave_init_state(llr, frozen)
no_retire = jnp.zeros(B, bool)
zeros_llr = jnp.zeros((B, N), jnp.float32)


def build(tile):
    @jax.jit
    def run(state):
        def body(c, _):
            st, u, done = bp_wave_fused_pallas(
                c, zeros_llr, no_retire, iters=K,
                flavor="minsum_lut_fast", tile=tile)
            return st, jnp.sum(done.astype(jnp.int32))
        st, outs = lax.scan(body, state, None, length=scank)
        return st, jnp.sum(outs)
    return run


variants = {f"TB{t}": build(t) for t in TILES}
for name, run in variants.items():
    t0 = time.perf_counter()
    st, out = run(state0)
    int(out)
    print(json.dumps({"variant": name, "B": B, "N": N, "K": K,
                      "scank": scank, "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, run in variants.items():
        st, out = run(state0)
        int(out)  # warm
        t0 = time.perf_counter()
        outs = []
        for _ in range(dispatches):
            st, o = run(st)
            outs.append(o)
        int(sum(outs))
        dt = time.perf_counter() - t0
        slot_waves = B * scank * dispatches
        results[name].append(slot_waves / dt)

best = {name: max(v) for name, v in results.items()}
print(json.dumps({"B": B, "N": N, "K": K, "scank": scank,
                  "best_slot_waves_per_s": {k: round(v, 1)
                                            for k, v in best.items()},
                  "all": {k: [round(x, 1) for x in v]
                          for k, v in results.items()}}), flush=True)
