"""Analytic op model of the frozen-specialized SCL kernel (ROOFLINE §SCL).

Walks the SAME static schedule the kernel emits (scl_fast_kernel.decompose)
and counts vector-row operations (one row = an (8, 128) f32 vreg op) per
category, then converts to VPU lane-ops per frame.  No hardware needed; the
measured fps divided by the model bound gives the utilization figure the
round-2 verdict asked to track (item 4).

Usage: python scripts/op_model.py [N] [K] [L] [wloop]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU properly: the env exports JAX_PLATFORMS=axon, so setdefault is
# a no-op and any transitive jnp op would touch the TPU (CLAUDE.md)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from polardecoding_tpu.ops.pallas.scl_fast_kernel import decompose
from polardecoding_tpu.utils.sequences import frozen_mask

VPU_OPS = 3.85e12  # v5e vector lane-ops/s (8x128 f32 per issue)
LANES = 128

# per-row op weights (compare/select/add/mul all count 1; a lane roll
# counts 1; the 8-bin LUT = 7 cmp + 7 sel = 14)
LUT = 14
CHK = 2 * LUT + 9      # chk: 2 LUTs + sign/min/abs/add chain
PEN = LUT + 6          # one PHI penalty pair shares the LUT


def model(N, K, L, wloop, S=None, r1=0):
    n = N.bit_length() - 1
    s0 = wloop.bit_length() - 1
    S = S or s0
    fr = tuple(bool(b) for b in np.asarray(frozen_mask(N, K)))
    root = decompose(fr, n, 0, wloop, r1min=r1)

    ER = 2 * (1 << S) - 1
    LBITS = max(1, (L - 1).bit_length())
    PSR = (max(2 * (n - 1 - S), 1) + max(1, 24 // LBITS) - 1) \
        // max(1, 24 // LBITS)

    cat = {"fork_rank": 0.0, "fork_gather": 0.0, "fork_eager": 0.0,
           "fork_tie": 0.0, "loop_descent": 0.0, "loop_combine": 0.0,
           "node_descent": 0.0, "node_pm": 0.0, "boundary_fg": 0.0,
           "boundary_sigread": 0.0, "epilogue": 0.0, "r1_minima": 0.0,
           "r1_state": 0.0, "r1_materialize": 0.0}

    def fork():
        # rank: per d: 2 rolls + ~10 cmp/or/add rows
        cat["fork_rank"] += L * 12
        # candidate/parent/ub gather: per d: 4 rolls + ~10 mask/mul/add
        cat["fork_gather"] += L * 14
        cat["fork_tie"] += L * 4
        # eager copy: (2*ER + PSR) rows x (roll + mask-mul-add ~ 3)/d
        cat["fork_eager"] += L * (2 * ER + PSR) * 3

    def sig_read_cost(w):
        cat["boundary_sigread"] += 3 + L * (w * 3 + 1)

    def walk(nd):
        w = 1 << nd.stage
        if nd.kind == "r0":
            # descent: stage levels; level k emits w rows split chk/add —
            # approximate each level as w/2 chk-rows + w/2 add-rows
            cat["node_descent"] += nd.stage * w * (CHK + 1) / 2
            cat["node_pm"] += w * (PEN + 1)
            return
        if nd.kind == "rep":
            cat["node_descent"] += nd.stage * w * (CHK + 1) / 2
            cat["node_pm"] += (w - 1) * (PEN + 1)
            fork()
            return
        if nd.kind == "r1":
            # bounded-fork node-level processing (scl_fast_kernel.run_r1)
            t = min(L - 1, w)
            # successive minima: per round, tree-min (~w) + first-onehot
            # scan (~4w) on |alpha|
            cat["r1_minima"] += t * 5 * w + w  # + |alpha|
            # per round: m_k gather (L rolls*3) + sigp/flip-row gathers
            # through the fork's parent map (small packed rows)
            FPR = (t + 23) // 24
            wbits = max(1, nd.stage)
            PRp = (t + max(1, 24 // wbits) - 1) // max(1, 24 // wbits)
            cat["r1_state"] += t * (3 * L + (1 + FPR) * 3 * L + 6)
            for _ in range(t):
                fork()
            # final materialization: beta + packed-idx gathers + t one-hot
            # flip applications over w rows
            cat["r1_materialize"] += (w + PRp) * 3 * L + t * (3 * w + 6)
            return
        if nd.kind == "loop":
            # per bit: masked pass over stages < stage: rows = 2^i each with
            # chk+g+selects (~CHK + 8)
            per_bit = sum((1 << i) * (CHK + 8) for i in range(nd.stage))
            cat["loop_descent"] += w * per_bit
            for j in range(w):
                if not fr[nd.off + j]:
                    fork()
                else:
                    # frozen bits inside mixed loops still execute the fork
                    # predicated (Mosaic) — count them
                    fork()
            cat["loop_combine"] += w * sum(
                (1 << i) * 3 for i in range(nd.stage))
            return
        # branch: f then g at stage-1 over 2^(s-1) rows.  The entry read is
        # always CLEAN (the parent wrote slot s immediately before); the
        # g-read re-gathers through sigma only when the LEFT child emitted a
        # fork (R0 children preserve the clean flag — kernel read_llr)
        h = 1 << (nd.stage - 1)
        cat["boundary_fg"] += h * CHK          # f
        cat["boundary_fg"] += h * 3            # g
        left_forks = not all(fr[nd.left.off : nd.left.off + (1 << (nd.stage - 1))])
        if nd.stage > S + 1 and left_forks:
            sig_read_cost(2 * h)               # dirty re-gather of slot s
        walk(nd.left)
        walk(nd.right)

    walk(root)
    cat["epilogue"] = N * (n + 1) * 2  # u = encode(x) butterfly + store

    F = LANES // L
    frames_per_row = 8 * F  # FS sublane groups x F frames per lane block
    rows_total = sum(cat.values())
    lane_ops_per_frame = rows_total * 8 * LANES / frames_per_row
    bound_fps = VPU_OPS / lane_ops_per_frame
    return {
        "N": N, "K": K, "L": L, "wloop": wloop, "S": S,
        "rows_by_category": {k: round(v) for k, v in cat.items()},
        "lane_ops_per_frame": round(lane_ops_per_frame),
        "vpu_bound_fps": round(bound_fps),
    }


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else N // 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    wloop = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    r1 = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    print(json.dumps(model(N, K, L, wloop, r1=r1), indent=1))
