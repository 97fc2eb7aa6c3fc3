"""A/B: subtree-refs vs paths-in-lanes SCL kernel, with DVFS-resistant
methodology: long timed windows (>=1 s of device work), interleaved
round-robin repetitions, best-of-reps reported (clock ramp and tunnel
hiccups only ever make a rep SLOWER).

Usage: python scripts/ab_scl.py [N] [L] [B] [iters] [reps]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np
import jax.numpy as jnp

from polardecoding_tpu.utils.sequences import frozen_mask

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 24
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

fr = jnp.asarray(frozen_mask(N, N // 2))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)

from polardecoding_tpu.ops.pallas.scl_subtree_kernel import scl_decode_subtree
from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

# pm-only: XLA dead-code-eliminates the u_all output TRANSPOSE (8 MB int8 at
# N=1024 B=1024), which the harness never materializes either (it consumes
# u_all inside the same jit)
variants = {
    "subtree pm": jax.jit(lambda x: scl_decode_subtree(x, fr, list_size=L)[1:]),
    "lanes   pm": jax.jit(lambda x: scl_decode_tree(x, fr, list_size=L)[1:]),
    "subtree full": jax.jit(lambda x: scl_decode_subtree(x, fr, list_size=L)),
    "lanes   full": jax.jit(lambda x: scl_decode_tree(x, fr, list_size=L)),
}

for name, f in variants.items():  # compile + clock spin-up
    np.asarray(f(llr)[0])

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
