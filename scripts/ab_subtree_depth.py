"""A/B: per-path-refs SCL kernel subtree depth S at N=1024 L=8 (the binding
bench headline).  Round-2 swept only S in {4, 5, 6} (54.0k / 29.5k / 33.8k
kernel-only — non-monotonic); S in {2, 3} was never measured.  The lane
kernel's L=32 sweep showed small windows winning once eager-copy cost
dominates, so probe downward here too.

ab_scl.py methodology: >=1 s windows, interleaved round-robin reps,
best-of-reps, pm-only fetches.

Usage: python scripts/ab_subtree_depth.py [N] [L] [B] [iters] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.ops.pallas.scl_subtree_kernel import scl_decode_subtree
from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

fr = jnp.asarray(frozen_mask(N, N // 2))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)

variants = {
    f"S={s}": jax.jit(
        lambda x, s=s: scl_decode_subtree(x, fr, list_size=L, subtree=s)[1:]
    )
    for s in (2, 3, 4)
}

ref = None
for name, f in variants.items():  # compile + clock spin-up + cross-parity
    pm = np.asarray(f(llr)[0])
    if ref is None:
        ref = pm
    else:
        assert np.array_equal(pm, ref), f"{name} PM mismatch vs S=2"
print("PM parity across S: OK", flush=True)

results = {name: [] for name in variants}
for r in range(reps):
    for name, f in variants.items():
        np.asarray(f(llr)[0])  # re-warm
        t0 = time.perf_counter()
        outs = [f(llr)[0] for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        results[name].append(iters * B / (time.perf_counter() - t0))

for name, fpss in results.items():
    print(f"{name}: best {max(fpss):8.1f} fps   reps "
          + " ".join(f"{v:.0f}" for v in fpss), flush=True)
