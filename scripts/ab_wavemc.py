"""A/B: in-kernel-MC wave engine (v3) vs the fused boundary-retirement
engine, at true rates (scan-chunked steps per dispatch — the round-4
dispatch-floor discipline).  Retired frames/s, steady state, interleaved
reps, best-of-reps per variant.

Variants: fused (production r4), mc (kernel PRNG bits), mc-tf (threefry
bits XLA-side — the statistically conservative fallback).

Usage: python scripts/ab_wavemc.py [B] [dispatches] [reps] [snr_db] [spc]
Env: PD_WAVE_PRESET (default BP_1024_FASTCHK), PD_VARIANTS, PD_K (default 8)
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
from polardecoding_tpu.parallel.harness import make_wave_step, make_wave_step_mc

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
dispatches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
snr = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
spc = int(sys.argv[5]) if len(sys.argv) > 5 else 8
K = int(os.environ.get("PD_K", "8"))
PRESET = os.environ.get("PD_WAVE_PRESET", "BP_1024_FASTCHK")
VARIANTS = os.environ.get("PD_VARIANTS", "fused,mc,mc-tf").split(",")

p = preset(PRESET)
key = jax.random.PRNGKey(p.sweep.seed)
sigma = jnp.float32(10.0 ** (-snr / 20.0))


def build(name):
    if name == "fused":
        init, step, _ = make_wave_step(p, B, wave_iters=K)
    elif name == "mc":
        init, step, _ = make_wave_step_mc(p, B, wave_iters=K, noise="kernel")
    elif name == "mc-tf":
        init, step, _ = make_wave_step_mc(p, B, wave_iters=K,
                                          noise="threefry")
    elif name.startswith("mc-c"):  # retire-check cadence variants
        init, step, _ = make_wave_step_mc(p, B, wave_iters=K, noise="kernel",
                                          cadence=int(name[4:]))
    elif name.startswith("mc-t"):  # pallas tile-size variants (cadence 1)
        init, step, _ = make_wave_step_mc(p, B, wave_iters=K, noise="kernel",
                                          tile=int(name[4:]))
    elif name.startswith("mc-w"):  # tileXcadence: mc-w<tile>x<cad>
        t, c = name[4:].split("x")
        init, step, _ = make_wave_step_mc(p, B, wave_iters=K, noise="kernel",
                                          tile=int(t), cadence=int(c))
    elif name.startswith("mc-k"):  # mc-k<K>s<spares>c<cadence>[i<iterMax>]
        import dataclasses
        import re
        m = re.fullmatch(r"mc-k(\d+)s(\d+)c(\d+)(?:i(\d+))?", name)
        pp = p
        if m.group(4):
            # reduced-iterMax flavor (verdict r4 item 4): frames at the cap
            # retire as failures in-kernel, cutting the ~w*iterMax slice of
            # the iteration budget the non-converged tail pays
            pp = dataclasses.replace(
                p, name=f"{p.name}_I{m.group(4)}",
                decoder=dataclasses.replace(p.decoder,
                                            bp_iters=int(m.group(4))))
        init, step, _ = make_wave_step_mc(pp, B, wave_iters=int(m.group(1)),
                                          noise="kernel",
                                          spares=int(m.group(2)),
                                          cadence=int(m.group(3)))
    else:
        raise SystemExit(f"unknown variant {name}")

    @functools.partial(jax.jit, donate_argnums=(2,))
    def multi(key, sigma, carry, step=step):
        def body(c, _):
            c2, out = step(key, sigma, c)
            return c2, out

        carry, (eb, ebl, fr) = lax.scan(body, carry, None, length=spc)
        return carry, (jnp.sum(eb), jnp.sum(ebl), jnp.sum(fr))

    return init, multi


variants = {name: build(name) for name in VARIANTS}

for name, (init, multi) in variants.items():
    t0 = time.perf_counter()
    carry = init(key, jnp.int32(0), sigma)
    carry, out = multi(key, sigma, carry)
    int(out[2])
    print(json.dumps({"variant": name, "preset": PRESET, "B": B, "K": K,
                      "spc": spc, "compile_plus_first_s":
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
        blers[name] = float(int(sum(ebls)) / max(frames, 1))

best = {name: max(v) for name, v in results.items()}
print(json.dumps({"preset": PRESET, "B": B, "K": K, "snr_db": snr,
                  "spc": spc, "dispatches": dispatches,
                  "best_fps": {k: round(v, 1) for k, v in best.items()},
                  "all_fps": {k: [round(x, 1) for x in v]
                              for k, v in results.items()},
                  "window_bler": {k: round(v, 5) for k, v in blers.items()}},
                 ), flush=True)
