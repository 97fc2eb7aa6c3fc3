"""A/B: in-wave G-check latch cadence (check_every) for the fused BP wave
engine, with the DVFS-resistant methodology of ab_scl.py (>=1 s timed
windows, interleaved round-robin reps, best-of-reps per variant).

check_every=0 is the incumbent (one G-check at the wave boundary);
check_every=c runs the check every c iterations inside the kernel with a
per-frame latch (round-3 verdict item 3: E[paid iterations] drops toward
E[first-pass] rounded up to the boundary, at ~4 %/iteration check cost at
cadence 1).

Each variant runs the REAL production step (make_wave_step: refill RNG +
MXU encode + count + fused kernel) from a fresh carry per rep; the timed
window is `steps` dependent steps synced by one summed-counter readback.
Also prints each variant's retired-BLER over its own frames as a coarse
sanity (statistical equality is validated separately at 1000 error blocks).

Usage: python scripts/ab_wavecheck.py [B] [steps] [reps] [snr_db] [K]
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

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_wave_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
snr = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
K = int(sys.argv[5]) if len(sys.argv) > 5 else 8
CES = (0, 1, 2, 4)
PRESET = os.environ.get("PD_WAVE_PRESET", "BP_1024_FASTCHK")

p = preset(PRESET)
key = jax.random.PRNGKey(p.sweep.seed)
sigma = jnp.float32(10.0 ** (-snr / 20.0))

variants = {}
for ce in CES:
    variants[f"ce{ce}"] = make_wave_step(p, B, wave_iters=K, check_every=ce)

# compile pass (timed) — fresh carry per variant
for name, (init, step, _) in variants.items():
    t0 = time.perf_counter()
    carry = init(key, jnp.int32(0), sigma)
    carry, out = step(key, sigma, carry)
    int(out[2])
    print(json.dumps({"variant": name, "preset": PRESET, "B": B, "K": K,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

results = {name: [] for name in variants}
blers = {}
for r in range(reps):
    for name, (init, step, _) in variants.items():
        carry = init(key, jnp.int32(0), sigma)
        last = None
        for _ in range(4):  # reach steady state + spin up clocks
            carry, last = step(key, sigma, carry)
        int(last[2])
        t0 = time.perf_counter()
        ebs, ebls, frs = [], [], []
        for _ in range(steps):
            carry, (eb, ebl, fr) = step(key, sigma, carry)
            ebs.append(eb)
            ebls.append(ebl)
            frs.append(fr)
        frames = int(sum(frs))
        dt = time.perf_counter() - t0
        results[name].append(frames / dt)
        blers[name] = int(sum(ebls)) / max(frames, 1)

for name, fpss in results.items():
    print(json.dumps({"variant": name, "preset": PRESET, "B": B, "K": K,
                      "snr_db": snr,
                      "best_retired_fps": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss],
                      "window_bler": round(blers[name], 5)}), flush=True)
