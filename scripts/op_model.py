"""Analytic op model of the frozen-specialized SCL kernel (ROOFLINE §SCL).

Walks the SAME static schedule the kernel emits (scl_fast_kernel.decompose)
and counts vector-row operations (one row = an (8, 128) f32 vreg op) per
category.  Two bounds are produced:

  * nominal: rows x 8 x 128 lanes against the 3.85 T lane-op/s VPU peak —
    the round-2/3 figure, which assumed every vreg op issues at peak;
  * latency-floor (round 4): each emission is weighted by the sustained
    fraction of peak Mosaic achieves for fully DEPENDENT chains of ops on a
    block of that HEIGHT (rows of (8,128) vregs), measured by
    scripts/microbench_rolls.py on the real chip:

        rows:        1      8      32     64     128
        of peak:   0.025-  0.125- 0.35   0.59   0.52
                   0.073   0.172

    Single-vreg dependent chains run at ~2.5-7 % of peak; throughput
    recovers with block height (independent rows = free ILP) and saturates
    near ~55-59 %.  The measured kernel sits BETWEEN the two bounds
    (N=1024 L=8 TRUE rate after the dispatch-floor fix: nominal 764k,
    latency-floor 90k, measured 361k = 47 % of nominal).

    SUPERSEDED NOTE (round 4): this model's earlier claim to "explain the
    54 % residual" was written against floor-clipped measurements.  The
    authoritative attribution is now the scan-batched HW phase ablation
    (results/hw_queue_r4/step14.log: sigma re-gathers 28.9 %, fork
    selection 16.0 %, all phases 84.1 %, skeleton ~16 %) — docs/ROOFLINE.md
    "round 4: the dispatch-floor discovery".  The bounds here remain
    useful as a sanity bracket and for relative schedule accounting.

Usage: python scripts/op_model.py [N] [K] [L] [wloop] [r1]
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

# measured sustained fraction of VPU peak vs block height (rows of (8,128)
# vregs) — scripts/microbench_rolls.py, v5e, 2026-08-20 (gather_rows / lut /
# rank / chkrow patterns; geometric interpolation between anchors)
_EFF_ANCHORS = [(1, 0.05), (2, 0.075), (4, 0.11), (8, 0.15), (16, 0.25),
                (32, 0.355), (64, 0.57), (128, 0.55), (1 << 20, 0.55)]


def eff(rows):
    rows = max(1, rows)
    for (r0, e0), (r1_, e1) in zip(_EFF_ANCHORS, _EFF_ANCHORS[1:]):
        if rows <= r1_:
            if rows <= r0:
                return e0
            t = (np.log2(rows) - np.log2(r0)) / (np.log2(r1_) - np.log2(r0))
            return e0 * (e1 / e0) ** t
    return _EFF_ANCHORS[-1][1]


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

    cats = {}

    def add(cat, rows, h):
        """rows vreg-row ops emitted on blocks of height h."""
        raw, wtd = cats.get(cat, (0.0, 0.0))
        cats[cat] = (raw + rows, wtd + rows / eff(h))

    def fork():
        # rank: per d: 2 rolls + ~10 cmp/or/add rows on single-vreg rows
        add("fork_rank", L * 12, 1)
        # candidate/parent/ub gather: per d: 4 rolls + ~10 mask/mul/add
        add("fork_gather", L * 14, 1)
        add("fork_tie", L * 4, 1)
        # eager copy: (2*ER + PSR) rows x (roll + mask-mul-add ~ 3)/d
        add("fork_eager", L * 2 * ER * 3, ER)
        add("fork_eager", L * PSR * 3, PSR)

    def sig_read_cost(w):
        add("boundary_sigread", 3 + L * (w * 3 + 1), w)

    def walk(nd):
        w = 1 << nd.stage
        if nd.kind == "r0":
            # descent: stage levels; level k emits w rows split chk/add —
            # approximate each level as w/2 chk-rows + w/2 add-rows
            add("node_descent", nd.stage * w * (CHK + 1) / 2, max(1, w // 2))
            add("node_pm", w * PEN, w)       # pen pair on the leaf block
            add("node_pm", w, 1)             # serial leaf-order accumulation
            return
        if nd.kind == "rep":
            add("node_descent", nd.stage * w * (CHK + 1) / 2, max(1, w // 2))
            add("node_pm", (w - 1) * PEN, w)
            add("node_pm", w - 1, 1)
            fork()
            return
        if nd.kind == "r1":
            t = min(L - 1, w)
            # successive minima: per round, tree-min (~w) + first-onehot
            # scan (~4w 1-row steps) on |alpha|
            add("r1_minima", w, w)  # |alpha|
            add("r1_minima", t * w, max(1, w // 2))  # tree-min levels
            add("r1_minima", t * 4 * w, 1)  # first-occurrence scan (serial)
            FPR = (t + 23) // 24
            wbits = max(1, nd.stage)
            PRp = (t + max(1, 24 // wbits) - 1) // max(1, 24 // wbits)
            add("r1_state", t * (3 * L + (1 + FPR) * 3 * L + 6), 1)
            for _ in range(t):
                fork()
            add("r1_materialize", (w + PRp) * 3 * L, w)
            add("r1_materialize", t * (3 * w + 6), w)
            return
        if nd.kind == "loop":
            # per bit: masked pass over stages < stage: rows = 2^i each with
            # chk+g+selects (~CHK + 8)
            for i in range(nd.stage):
                add("loop_descent", w * (1 << i) * (CHK + 8), 1 << i)
            for j in range(w):
                fork()
            for i in range(nd.stage):
                add("loop_combine", w * (1 << i) * 3, 1 << i)
            return
        # branch: f then g at stage-1 over 2^(s-1) rows.  The entry read is
        # always CLEAN (the parent wrote slot s immediately before); the
        # g-read re-gathers through sigma only when the LEFT child emitted a
        # fork (R0 children preserve the clean flag — kernel read_llr)
        h = 1 << (nd.stage - 1)
        add("boundary_fg", h * CHK, h)   # f
        add("boundary_fg", h * 3, h)     # g
        left_forks = not all(
            fr[nd.left.off : nd.left.off + (1 << (nd.stage - 1))])
        if nd.stage > S + 1 and left_forks:
            sig_read_cost(2 * h)         # dirty re-gather of slot s
        walk(nd.left)
        walk(nd.right)

    walk(root)
    add("epilogue", N * (n + 1) * 2, N)  # u = encode(x) butterfly + store

    F = LANES // L
    frames_per_row = 8 * F  # FS sublane groups x F frames per lane block
    rows_total = sum(v[0] for v in cats.values())
    rows_wtd = sum(v[1] for v in cats.values())
    lane_ops_per_frame = rows_total * 8 * LANES / frames_per_row
    eff_lane_ops = rows_wtd * 8 * LANES / frames_per_row
    return {
        "N": N, "K": K, "L": L, "wloop": wloop, "S": S, "r1": r1,
        "rows_by_category": {k: round(v[0]) for k, v in cats.items()},
        "time_share_by_category": {
            k: round(v[1] / rows_wtd, 3) for k, v in cats.items()},
        "lane_ops_per_frame": round(lane_ops_per_frame),
        "vpu_bound_fps_nominal": round(VPU_OPS * frames_per_row
                                       / (rows_total * 8 * LANES)),
        "vpu_bound_fps_latency_floor": round(VPU_OPS * frames_per_row
                                          / (rows_wtd * 8 * LANES)),
    }


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else N // 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    wloop = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    r1 = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    print(json.dumps(model(N, K, L, wloop, r1=r1), indent=1))
