"""SCL full-MC pipeline A/B (round-5 verdict item 3): XLA-side channel
pre-tile vs in-kernel path-lane replication (ch_rep), and the production
threefry channel vs the in-kernel MC channel kernel (channel="mc").

Full-MC steps at B=16384 compute ~40-50 ms each — far above the ~24 ms
dispatch floor — so plain enqueued steps measure true rates here (the
PD_SCANK discipline is for kernel-scale windows).

Usage: python scripts/ab_sclmc.py [B] [steps] [reps] [snr]
Env: PD_SCL_PRESET (default SCL_1024_L8_FASTR1), PD_VARIANTS
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

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_frame_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
snr = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
PRESET = os.environ.get("PD_SCL_PRESET", "SCL_1024_L8_FASTR1")
VARIANTS = os.environ.get("PD_VARIANTS", "base,chrep,chrep-mc").split(",")

p = preset(PRESET)
key = jax.random.PRNGKey(p.sweep.seed)
sigma = jnp.float32(10.0 ** (-snr / 20.0))


def build(name):
    # PD_SCL_CHREP is read at TRACE time inside _scl_kernel, so set it
    # before the first step() call of each variant
    if name == "base":
        os.environ["PD_SCL_CHREP"] = "0"
        fn = make_frame_step(p, B)
    elif name == "chrep":
        os.environ["PD_SCL_CHREP"] = "1"
        fn = make_frame_step(p, B)
    elif name == "chrep-mc":
        os.environ["PD_SCL_CHREP"] = "1"
        fn = make_frame_step(p, B, channel="mc")
    else:
        raise SystemExit(name)
    return fn


results = {}
for name in VARIANTS:
    step = build(name)
    t0 = time.perf_counter()
    int(step(key, jnp.int32(0), sigma)[0])
    print(json.dumps({"variant": name, "preset": PRESET, "B": B,
                      "compile_plus_first_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)
    results[name] = (step, [])

for r in range(reps):
    for name, (step, accs) in results.items():
        os.environ["PD_SCL_CHREP"] = "0" if name == "base" else "1"
        int(step(key, jnp.int32(0), sigma)[0])  # warm/steady
        t0 = time.perf_counter()
        outs = [step(key, jnp.int32((i + 1) * B), sigma)
                for i in range(steps)]
        int(sum(o[0] for o in outs))
        accs.append(steps * B / (time.perf_counter() - t0))

print(json.dumps({"preset": PRESET, "B": B, "snr_db": snr, "steps": steps,
                  "best_fps": {k: round(max(v), 1)
                               for k, (_, v) in results.items()},
                  "all_fps": {k: [round(x, 1) for x in v]
                              for k, (_, v) in results.items()}}),
      flush=True)
