"""Quick single-config compile+run probe (tile arg ignored — kept for CLI compat) for the SCL tree kernel on the real
chip: catches Mosaic lowering rejections and measures kernel-only fps without
paying the full parity matrix.  Everything stays inside the one jitted call —
eager ops through the axon tunnel each pay a fresh remote compile (minutes!).

Usage: python scripts/compile_probe.py [N] [L] [tile] [S] [B] [iters]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from polardecoding_tpu.utils.sequences import frozen_mask
from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
tile = int(sys.argv[3]) if len(sys.argv) > 3 else 0
S = int(sys.argv[4]) if len(sys.argv) > 4 else 0
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
iters = int(sys.argv[6]) if len(sys.argv) > 6 else 8

fr = jnp.asarray(frozen_mask(N, N // 2))
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
t0 = time.perf_counter()
u, pm, ties = scl_decode_tree(llr, fr, list_size=L, subtree=S)
pm_h = np.asarray(pm)  # pure transfer — forces execution, no eager compile
print(f"compile+run {time.perf_counter() - t0:.1f}s pm0={pm_h[0, 0]:.3f}",
      flush=True)
t0 = time.perf_counter()
outs = [scl_decode_tree(llr, fr, list_size=L, subtree=S)[1]
        for _ in range(iters)]
for o in outs:
    np.asarray(o)
dt = time.perf_counter() - t0
print(f"kernel fps={iters * B / dt:.1f} ({dt / iters * 1e3:.1f} ms/call, "
      f"B={B})", flush=True)
