"""Wave-engine K retune with scan-batched steps: the round-4 dispatch-floor
discovery (scripts/probe_floor3.py, wall/call = max(~24 ms, compute))
means small wave_iters K was silently penalized — a K=4 step's compute is
~13 ms, clipped to 24.  Here each dispatch runs `spc` wave steps inside
one jit via lax.scan (counters summed on device), so the measured fps is
the device's true retirement rate at each K.

Usage: python scripts/ab_wavescan.py [B] [dispatches] [reps] [snr_db] [spc]
Env: PD_WAVE_PRESET (default BP_1024_FASTCHK), PD_KS (default 2,4,6,8)
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

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_wave_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
dispatches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
snr = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
spc = int(sys.argv[5]) if len(sys.argv) > 5 else 8  # steps per call
KS = tuple(int(v) for v in os.environ.get("PD_KS", "2,4,6,8").split(","))
PRESET = os.environ.get("PD_WAVE_PRESET", "BP_1024_FASTCHK")

p = preset(PRESET)
key = jax.random.PRNGKey(p.sweep.seed)
sigma = jnp.float32(10.0 ** (-snr / 20.0))

variants = {}
for K in KS:
    init, step, _ = make_wave_step(p, B, wave_iters=K)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def multi(key, sigma, carry, step=step):
        def body(c, _):
            c2, out = step(key, sigma, c)
            return c2, out

        carry, (eb, ebl, fr) = lax.scan(body, carry, None, length=spc)
        return carry, (jnp.sum(eb), jnp.sum(ebl), jnp.sum(fr))

    variants[f"K{K}"] = (init, multi)

for name, (init, multi) in variants.items():
    t0 = time.perf_counter()
    carry = init(key, jnp.int32(0), sigma)
    carry, out = multi(key, sigma, carry)
    int(out[2])
    print(json.dumps({"variant": name, "preset": PRESET, "B": B, "spc": spc,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
blers = {}
for r in range(reps):
    for name, (init, multi) in variants.items():
        carry = init(key, jnp.int32(0), sigma)
        last = None
        for _ in range(3):  # steady state + clock spin-up
            carry, last = multi(key, sigma, carry)
        int(last[2])
        t0 = time.perf_counter()
        ebs, ebls, frs = [], [], []
        for _ in range(dispatches):
            carry, (eb, ebl, fr) = multi(key, sigma, carry)
            ebs.append(eb)
            ebls.append(ebl)
            frs.append(fr)
        frames = int(sum(frs))
        dt = time.perf_counter() - t0
        results[name].append(frames / dt)
        blers[name] = int(sum(ebls)) / max(frames, 1)

for name, fpss in results.items():
    print(json.dumps({"variant": name, "preset": PRESET, "B": B, "spc": spc,
                      "snr_db": snr,
                      "best_retired_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss],
                      "window_bler": round(blers[name], 5)}), flush=True)
