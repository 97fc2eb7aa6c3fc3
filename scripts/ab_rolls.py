"""A/B: 3-roll directed-operand sweep vs the superseded 4-roll
partner-exchange sweep in the fused BP wave kernel (bp_kernel._sweep_update
`rolls` flag), with the DVFS-resistant methodology of ab_scl.py (>=1 s timed
windows, interleaved round-robin reps, best-of-reps).

The two formulations are bit-identical by construction (add-then-roll ==
roll-then-add bitwise; upper lanes only ever read partners from below and
lower lanes from above) — the script verifies state/u/done equality on the
benchmarked batch before timing.

State is threaded call-to-call (the kernel donates it via
input_output_aliases), so each timed window is `iters` dependent wave
advances; sync is one jitted scalar fetch at the window end.

Usage: python scripts/ab_rolls.py [B] [iters] [reps] [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np
import jax.numpy as jnp

from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas
from polardecoding_tpu.utils.sequences import frozen_mask

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
n = N.bit_length() - 1
K = 8

fr = np.asarray(frozen_mask(N, N // 2))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
retire = jnp.asarray((np.arange(B) % 3) == 0)  # exercise the merge path

state0 = np.zeros((2 * (n + 1), B, N), np.float32)
state0[n] = rng.normal(size=(B, N)).astype(np.float32) * 2
state0[n + 1] = np.where(fr, 999.0, 0.0)[None, :]

red = jax.jit(lambda u, d: jnp.sum(u.astype(jnp.int32)) + jnp.sum(d))

# llr/retire are explicit args (not closure constants: a captured 64 MB
# device array would be baked into the jaxpr as a literal)
variants = {}
for rolls in (3, 4):
    variants[f"rolls{rolls}"] = jax.jit(
        lambda s, x, rm, rolls=rolls: bp_wave_fused_pallas(
            s, x, rm, iters=K, flavor="minsum_lut_fast", rolls=rolls,
            # CPU smoke; "0"/"" are false (PD_INTERPRET=0 was truthy before)
            interpret=os.environ.get("PD_INTERPRET", "") not in ("", "0")))

# compile + parity: one advance from identical states must agree bit-for-bit
# (compared ON-DEVICE — fetching the 1.5 GB state over the ~10 MB/s tunnel
# would take minutes)
eq = jax.jit(lambda x, y: jnp.all(x == y))

# upload the ~1.4 GB initial state ONCE and clone it on-device thereafter
# (donation destroys the previous device copy; re-transferring from host
# through the ~10 MB/s tunnel costs minutes per use — advisor r3)
state0_dev = jnp.asarray(state0)
clone = jax.jit(lambda s: s + 0.0)

outs = {}
for name, f in variants.items():
    t0 = time.perf_counter()
    s, u, d = f(clone(state0_dev), llr, retire)
    outs[name] = (s, u, d)
    int(np.asarray(red(u, d)))
    print(json.dumps({"variant": name, "N": N, "B": B,
                      "compile_plus_first_s": round(time.perf_counter() - t0,
                                                    1)}), flush=True)
a, b = outs["rolls3"], outs["rolls4"]
print(json.dumps({"parity": "rolls3_vs_rolls4",
                  "state_equal": bool(np.asarray(eq(a[0], b[0]))),
                  "u_equal": bool(np.asarray(eq(a[1], b[1]))),
                  "done_equal": bool(np.asarray(eq(a[2], b[2])))}),
      flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        s, u, d = f(clone(state0_dev), llr, retire)
        int(np.asarray(red(u, d)))  # warm sync
        t0 = time.perf_counter()
        for _ in range(iters):
            s, u, d = f(s, llr, retire)
        int(np.asarray(red(u, d)))
        dt = time.perf_counter() - t0
        # slot-waves/s: B frames x K iterations per call
        results[name].append(iters * B / dt)

for name, fpss in results.items():
    print(json.dumps({"variant": name, "N": N, "B": B, "K": K,
                      "best_slotwaves_per_s": round(max(fpss), 1),
                      "reps": [round(v) for v in fpss]}), flush=True)
