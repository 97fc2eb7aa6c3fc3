"""Frozen-structure-specialized Pallas TPU kernel for whole-frame SCL decoding
— the FOURTH generation ("fast-SSC-list schedule, exact semantics").

The frozen mask is a COMPILE-TIME constant of every Monte-Carlo config, yet
the earlier kernel generations read it from SMEM at runtime and executed the
full per-bit machinery (masked LLR descent, 2L-candidate ranking, eager path
copy, sigma scramble) predicated on it — Mosaic predication executes both
sides, so frozen bits cost as much as info bits.  At rate 1/2 that is half
the leaves.  This kernel instead SPECIALIZES the traced program on the mask
(ref semantics unchanged: SCL_1024.c:546-680, :481-502 — the schedule is
re-derived, the arithmetic is identical):

  * The code tree is decomposed STATICALLY (Python recursion at trace time)
    into three node kinds, exactly the classic fast-SSC node taxonomy but
    with EXACT list semantics by default (the approximate rate-1 shortcut
    changes the survivor set — measured, not assumed: the r1 flag enables
    it as a separately-BLER-qualified flavor, see run_r1 and
    tests/test_scl_fast.py's falsification test):

      - R0 (all-frozen, any width w): no forks, no serialization.  All
        partial sums inside are zero, so every g-update degenerates to
        `dn + up` and the w leaf LLRs come from ONE vectorized butterfly
        descent (log w full-width stages) instead of w serial masked passes.
        The leaves' PHI(l, 0) penalties are accumulated into the path metric
        serially IN LEAF ORDER (f32 addition association matches the
        reference's per-leaf updates bit-for-bit; the leaf values themselves
        are the same f/g DAG nodes the serial schedule computes).
      - REP (all-frozen except the LAST leaf, w >= 2): same vectorized
        descent (every g above the last leaf still sees all-zero partial
        sums), frozen-leaf penalties in leaf order, then ONE standard
        2L-candidate fork on the last leaf.  Decision block = ub * ones(w)
        (encode of [0..0,1] is all-ones).
      - LOOP (width wloop, contains >= 1 info bit in general position):
        the proven masked inner fori_loop of the third-generation kernel
        (scl_tree_kernel.py), with the masked LLR pass covering only stages
        < log2(wloop).  Nodes that are statically all-info skip the frozen
        predication entirely (`has_frozen=False`).

    Everything between the nodes — f/g chains, bit combines — is straight-
    line code emitted by the recursion (this subsumes the third generation's
    per-subtree boundary chains).

  * Two static dataflow analyses shave the cross-path gathers:
      - ZERO propagation: an R0 node's decision block is all-zero in every
        physical lane, so its slot store, the parent's `(1-2 pb) up` factor,
        the climb XOR, and the sigma-row maintenance are all elided.
      - CLEAN (sigma-identity) tracking: a sigma-managed slot written in
        logical order stays identity until the next fork; reads in that
        window skip the L-term roll-mask gather and read the slot directly.

  * Sigma rows are PACKED base-L digits, DPF = floor(24 / log2 L) logical
    rows per physical f32 row (exact: packed values < 2^24).  The third
    generation gathered every per-stage sigma row through the parent map at
    every fork — SROWS = 2(n-1-S) rows, 16 of the ~22 gathered rows per
    fork at N=1024 S=1.  Packing cuts that to ceil(SROWS/DPF) physical rows
    (2 at L=8, 4 at L=32): the fork's roll-mask gather moves whole lane
    values, so it is digit-agnostic; digit extraction (floor-div by the
    power-of-two L^k, exact in f32) happens only at boundary reads and
    identity resets.  (A running-permutation composition scheme — one
    gathered row + per-stage snapshots — was tried first and is UNSOUND:
    SCL parent maps are many-to-one, so the required inverse does not
    exist; a 200-op random simulation falsifies it.)

Layout, selection semantics, tie counting, and the u = encode(x) epilogue
are inherited verbatim from scl_tree_kernel.py (paths in lanes: lane =
p*F + f, sublane group = frame group; see that module's docstring).  The
traced program is O(#info_bits/wloop * L + #nodes) — at N=1024 L=8 rate 1/2
about 2x the third generation's trace but with ~5x fewer executed VPU ops
(docs/ROOFLINE.md has the op model).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk, lut_correction
# shared paths-in-lanes machinery — same layout contract as the third
# generation, so these MUST stay one definition (dispatch gates on
# frames_per_tile from both modules)
from polardecoding_tpu.ops.pallas.scl_tree_kernel import (
    _encode_sub,
    _fxor,
    _ntz32,
    _slot,
    frames_per_tile,
)

BIG = 1e30
LANES = 128
FS = 8  # max sublane frame groups per tile


# --------------------------------------------------------------------------
# Static schedule
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Node:
    kind: str  # "r0" | "rep" | "loop" | "branch"
    stage: int
    off: int  # leaf offset
    has_frozen: bool = False  # loop only
    left: Optional["_Node"] = None
    right: Optional["_Node"] = None


def decompose(frozen: Tuple[bool, ...], stage: int, off: int,
              wloop: int, r1min: int = 0) -> _Node:
    """Static fast-SSC-style decomposition of the code tree on the frozen
    mask.  Collapses maximal ALIGNED all-frozen (R0) and repetition (REP)
    nodes; leaves every other fork-bearing region as width-`wloop` LOOP
    nodes (SPC and mixed patterns keep the runtime frozen predicate).

    r1min > 0 additionally collapses maximal aligned ALL-INFO blocks of
    width >= r1min into R1 nodes (bounded-fork node-level list processing —
    the fast-SSC-list rate-1 rule, APPROXIMATE: see the kernel's R1
    section).  r1min = 0 (default) keeps the exact schedule."""
    w = 1 << stage
    blk = frozen[off : off + w]
    if all(blk):
        return _Node("r0", stage, off)
    if w >= 2 and all(blk[:-1]) and not blk[-1]:
        return _Node("rep", stage, off)
    if r1min and w >= max(r1min, 2) and not any(blk):
        return _Node("r1", stage, off)
    if w <= wloop:
        return _Node("loop", stage, off, has_frozen=any(blk))
    h = w // 2
    return _Node(
        "branch", stage, off,
        left=decompose(frozen, stage - 1, off, wloop, r1min),
        right=decompose(frozen, stage - 1, off + h, wloop, r1min),
    )


def schedule_stats(frozen: Tuple[bool, ...], wloop: int = 4) -> dict:
    """Node-count summary of the static schedule (docs + tests)."""
    n = len(frozen).bit_length() - 1
    counts = {"r0": 0, "rep": 0, "loop": 0, "branch": 0, "loop_frozen": 0}

    def walk(nd):
        counts[nd.kind] += 1
        if nd.kind == "loop" and nd.has_frozen:
            counts["loop_frozen"] += 1
        if nd.kind == "branch":
            walk(nd.left)
            walk(nd.right)

    walk(decompose(frozen, n, 0, wloop))
    return counts


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _scl_fast_kernel(ch_ref, fr_ref, u_out_ref, pm_out_ref, tie_out_ref,
                     llr, bits, sig, gat, pm_ref, ub_ref, tie_ref,
                     *, n, N, L, S, FS, frozen, wloop, T, ablate=(), r1=0,
                     stacked=False, sig_chunk=0, ch_rep=False):
    """Refs as scl_tree_kernel._scl_tree_kernel with a leading TILE axis of
    size T (default 1): T independent frame tiles are decoded by ONE kernel
    body with their op streams INTERLEAVED phase by phase.  Rationale
    (ROOFLINE round-3 "utilization"): the fork/gather sections are chains of
    dependent single-vreg ops — a measured microbenchmark of the exact
    roll+mask+mul+add pattern runs at 3.8% of VPU peak for one dependent
    chain but scales ~linearly with independent interleaved chains
    (scripts/microbench_rolls.py: 1.92x at T=2, 3.4x at T=4) — i.e. the
    kernel is LATENCY-bound in its hot sections, and cross-tile ILP is free
    throughput.  The static schedule is identical for every tile, so all
    bookkeeping (clean flags, node recursion, fori trip counts) is shared;
    only the data streams are replicated.

    The frozen mask is a static tuple: fr_ref (SMEM) is consulted only
    inside mixed/SPC loop nodes."""
    F = LANES // L
    NS = n - 1 - S  # sigma-managed stages: S+1 .. n-1
    SROWS = max(2 * NS, 1)
    # digit packing: DPF logical sigma rows per physical f32 row (base-L
    # digits; power-of-two base makes every extract/update exact in f32)
    LBITS = max(1, (L - 1).bit_length())
    DPF = max(1, 24 // LBITS)
    PSR = (SROWS + DPF - 1) // DPF  # physical sigma rows
    ER = 2 * (1 << S) - 1  # eager region: rows of slots 0..S
    TR = range(T)

    def roll(x, d):
        return pltpu.roll(x, d * F, axis=x.ndim - 1) if d else x

    pidx = lax.broadcasted_iota(jnp.int32, (1, FS, LANES), 2) // F
    pmd = [((pidx - d) % L).astype(jnp.float32) for d in range(L)]
    pidxf = pmd[0]
    REP_CONST = float(sum(L ** k for k in range(DPF)))  # identity all digits

    if stacked:
        # across-d stacked fork constants (ROOFLINE round-4 "stacked fork"):
        # [2L, FS, LANES] blocks whose row pairs (2d, 2d+1) belong to roll
        # term d / candidate branch (0, 1).  Emitted once per kernel; every
        # fork's compare/mask work then runs at block height 2L instead of
        # L separate height-1 chains (the microbench-measured issue cliff).
        Z1 = jnp.zeros((1, FS, LANES), jnp.float32)
        O1 = jnp.ones((1, FS, LANES), jnp.float32)
        silts = [jnp.where(pmd[d] < pidxf, 1.0, 0.0) for d in range(L)]
        # rank0 eq-mask rows: (r0_d: silt_d, r1_d: 0); rank1: (r0_d: 1,
        # r1_d: silt_d) — the reference's stable-order tie rule
        SEL0 = jnp.concatenate(
            [x for d in range(L) for x in (silts[d], Z1)], axis=0)
        SEL1 = jnp.concatenate(
            [x for d in range(L) for x in (O1, silts[d])], axis=0)
        PIDX2L = jnp.concatenate([pidxf] * (2 * L), axis=0)
        ODD2L = jnp.concatenate([Z1, O1] * L, axis=0)
        PMD2L = jnp.concatenate(
            [x for d in range(L) for x in (pmd[d], pmd[d])], axis=0)

    def rowsum(x):
        """Pairwise-halving row reduction -> [1, FS, LANES].  Used only on
        one-hot-masked stacks (at most one nonzero per lane), so any
        association is exact — results are bit-identical to the serial
        += accumulation it replaces."""
        while x.shape[0] > 1:
            h = x.shape[0] // 2
            x = x[:h] + x[h:]
        return x

    for t in TR:
        llr[t] = jnp.zeros((N, FS, LANES), jnp.float32)
        bits[t] = jnp.zeros((N, FS, LANES), jnp.float32)
        sig[t] = jnp.broadcast_to(pidxf * REP_CONST, (PSR, FS, LANES))
        pm_ref[t] = jnp.where(pidx == 0, 0.0, BIG)
        ub_ref[t] = jnp.zeros((1, FS, LANES), jnp.float32)
        tie_ref[t] = jnp.zeros((1, FS, LANES), jnp.float32)

    # ---- static dataflow state (emission-time only; the schedule — and
    # hence every flag — is IDENTICAL across tiles) -------------------------
    clean_llr = {i: False for i in range(S + 1, n)}  # sigma digit == identity
    clean_bits = {i: False for i in range(S + 1, n)}

    def sigma_llr_row(i):
        return i - (S + 1)

    def sigma_bits_row(i):
        return NS + i - (S + 1)

    def sig_digit(t, r):
        """Extract logical sigma row r: digit r%DPF of physical row r//DPF.
        floor-div by the power-of-two L^k and the base-L mod are exact."""
        pr, k = divmod(r, DPF)
        x = sig[t, pr : pr + 1, :, :]
        hi = jnp.floor(x / float(L ** k))
        return hi - float(L) * jnp.floor(hi / float(L))

    def sig_digit_set_identity(r):
        pr, k = divmod(r, DPF)
        for t in TR:
            x = sig[t, pr : pr + 1, :, :]
            cur_hi = jnp.floor(x / float(L ** k))
            cur = cur_hi - float(L) * jnp.floor(cur_hi / float(L))
            sig[t, pr : pr + 1, :, :] = x + (pidxf - cur) * float(L ** k)

    def sig_read(arr, srow, i):
        """L-term roll-mask gather of slot(i) through sigma digit `srow` for
        every tile, interleaved per roll term.  Returns a T-list.

        sig_chunk == 0 (incumbent): accumulate through the gat scratch ref
        (scl_tree_kernel notes) — each += is a read+add+write round trip.
        sig_chunk > 0 (round 4): accumulate in VALUES over row chunks of at
        most sig_chunk rows — drops the per-d ref round trip (~5w -> 3w
        rows per d-term) while keeping peak temporaries bounded (the full-w
        value chain was the round-2 "stack oom"); bit-identical (same
        one-hot masked adds in the same d order per chunk)."""
        lo, hi = _slot(i)
        w = hi - lo
        if "sigread" in ablate:  # phase-cost probe: skip the gather (WRONG
            return [arr[t, lo:hi, :, :] for t in TR]  # results, same shapes)
        sels = [sig_digit(t, srow) for t in TR]
        srcs = [arr[t, lo:hi, :, :] for t in TR]
        if sig_chunk:
            masks = [[jnp.where(sels[t] == pmd[d], 1.0, 0.0)
                      for d in range(L)] for t in TR]
            outs = []
            for t in TR:
                chunks = []
                for lo2 in range(0, w, sig_chunk):
                    hi2 = min(lo2 + sig_chunk, w)
                    src_c = srcs[t][lo2:hi2]
                    acc = masks[t][0] * src_c  # d = 0: roll is identity
                    for d in range(1, L):
                        acc = acc + masks[t][d] * roll(src_c, d)
                    chunks.append(acc)
                outs.append(chunks[0] if len(chunks) == 1
                            else jnp.concatenate(chunks, axis=0))
            return outs
        for t in TR:
            gat[t, :w, :, :] = jnp.zeros((w, FS, LANES), jnp.float32)
        for d in range(L):
            for t in TR:
                mask = jnp.where(sels[t] == pmd[d], 1.0, 0.0)
                gat[t, :w, :, :] = gat[t, :w, :, :] + mask * roll(srcs[t], d)
        return [gat[t, :w, :, :] for t in TR]

    def read_ch(t):
        """Stage-n channel rows.  ch_rep: the input carries each frame's
        channel row ONCE (lane dim F, the full-array-dim block exception)
        and the p-lane replication happens here as one lane concat —
        removing the XLA-side jnp.tile's B*N*L HBM pass (xprof_scl1024_r4:
        ~5 % of the full-MC step)."""
        if ch_rep:
            return jnp.concatenate([ch_ref[t, :N]] * L, axis=2)
        return ch_ref[t, :N]

    def read_llr(i):
        """Logical-order llr of stage i (i == n -> channel), per tile."""
        if i == n:
            return [read_ch(t) for t in TR]
        lo, hi = _slot(i)
        if i <= S or clean_llr[i]:
            return [llr[t, lo:hi, :, :] for t in TR]
        return sig_read(llr, sigma_llr_row(i), i)

    def read_bits(i):
        lo, hi = _slot(i)
        if i <= S or clean_bits[i]:
            return [bits[t, lo:hi, :, :] for t in TR]
        return sig_read(bits, sigma_bits_row(i), i)

    def write_llr(i, vals):
        lo, hi = _slot(i)
        for t in TR:
            llr[t, lo:hi, :, :] = vals[t]
        if i > S:
            sig_digit_set_identity(sigma_llr_row(i))
            clean_llr[i] = True

    def write_bits(i, vals):
        lo, hi = _slot(i)
        for t in TR:
            bits[t, lo:hi, :, :] = vals[t]
        if i > S:
            sig_digit_set_identity(sigma_bits_row(i))
            clean_bits[i] = True

    def mark_forked():
        for i in clean_llr:
            clean_llr[i] = False
        for i in clean_bits:
            clean_bits[i] = False

    # ---- shared fork machinery (identical semantics to scl_tree_kernel) --
    def gather_rows(rows, sel):
        """Per-path value gather: out[.., lane p] = rows[.., lane sel[p]]
        within p's frame group.  rows [R, FS, LANES] VALUES (not refs), sel
        [1, FS, LANES] float path indices.  Same roll-mask scheme as
        sig_read, for node-local per-path state (the R1 machinery)."""
        out = jnp.zeros_like(rows)
        for d in range(L):
            mask = jnp.where(sel == pmd[d], 1.0, 0.0)
            out = out + mask * roll(rows, d)
        return out

    def fork(l0s, is_frozen):
        """One 2L-candidate selection + path copy per tile, phase-interleaved
        (each phase's T emissions are independent — the ILP the VPU needs).
        l0s: T-list of [1, FS, LANES]; is_frozen is None (statically info)
        or a traced bool shared by every tile's predicate source (loop
        nodes pass a per-bit SMEM read — same value for all tiles).
        Leaves the chosen bits in ub_ref.  Penalties are the reference PHI
        pair (SCL_1024.c:481-502): pen_u = lut(|l|) + |l| on sign mismatch."""
        pens = []
        for t in TR:
            if "forkpen" in ablate:  # phase probe: drop the PHI LUT from
                # the inter-fork PM recurrence (WRONG results, chain kept)
                pens.append((l0s[t], -l0s[t]))
                continue
            absl = jnp.abs(l0s[t])
            base = lut_correction(absl)
            pen0 = base + jnp.where(l0s[t] < 0, absl, 0.0)
            pen1 = base + jnp.where(l0s[t] > 0, absl, 0.0)
            pens.append((pen0, pen1))
        return fork_sel(pens, is_frozen)

    def fork_sel(pens, is_frozen, extra=None):
        """Selection + path copy on explicit candidate penalties.
        pens: T-list of (pen0, pen1) [1, FS, LANES] rows; extra: optional
        T-list of [R, FS, LANES] per-path VALUE rows to gather through the
        same parent map (returned gathered; R1 carries its within-node
        state this way).  extra requires is_frozen None."""
        assert extra is None or is_frozen is None
        pms = [pm_ref[t] for t in TR]
        if "pmbreak" in ablate:  # phase probe: sever the inter-fork PM
            # recurrence — candidates no longer read the accumulated PM, so
            # consecutive forks' selection work is data-independent (WRONG
            # results; isolates the serial-chain share of runtime)
            cand0 = [pens[t][0] for t in TR]
            cand1 = [pens[t][1] for t in TR]
        else:
            cand0 = [pms[t] + pens[t][0] for t in TR]
            cand1 = [pms[t] + pens[t][1] for t in TR]
        zeros = lambda: [jnp.zeros((1, FS, LANES), jnp.float32) for _ in TR]
        new_pm, new_ub, parent, vLm1, vL = (zeros(), zeros(), zeros(),
                                            zeros(), zeros())
        if stacked:
            # across-d stacked rank + selection (bit-identical — see rowsum
            # and the SEL/ODD/PMD constant docstrings; ROOFLINE round-4).
            # Rank: roll the [cand0; cand1] pair once per d into one [2L]
            # stack R; both candidates' ranks fall out of two height-2L
            # subtract/compare/mask passes (a - b sign tests replace the
            # direct broadcast-compare Mosaic cannot relayout).
            if "forkrank" in ablate:  # phase probe (WRONG results)
                rank0 = [pidxf for _ in TR]
                rank1 = [pidxf for _ in TR]
            else:
                rank0, rank1 = [], []
                for t in TR:
                    c01 = jnp.concatenate([cand0[t], cand1[t]], axis=0)
                    R = jnp.concatenate([roll(c01, d) for d in range(L)],
                                        axis=0)
                    d0 = R - cand0[t]
                    d1 = R - cand1[t]
                    cr0 = (jnp.where(d0 < 0, 1.0, 0.0)
                           + jnp.where(d0 == 0, 1.0, 0.0) * SEL0)
                    cr1 = (jnp.where(d1 < 0, 1.0, 0.0)
                           + jnp.where(d1 == 0, 1.0, 0.0) * SEL1)
                    rank0.append(rowsum(cr0))
                    rank1.append(rowsum(cr1))
            # Selection: roll the [rank; cand] pairs once per d; the winner
            # masks, survivor PMs, branch bits, parent map and the two
            # tie-probe values are height-2L mask-mul-reduce passes.
            if "forksel" in ablate:  # phase probe: trivial selection (WRONG)
                new_pm = [cand0[t] for t in TR]
                new_ub = [jnp.zeros((1, FS, LANES), jnp.float32) for _ in TR]
                parent = [pidxf for _ in TR]
            else:
                for t in TR:
                    K = jnp.concatenate([rank0[t], rank1[t]], axis=0)
                    V = jnp.concatenate([cand0[t], cand1[t]], axis=0)
                    RK = jnp.concatenate([roll(K, d) for d in range(L)],
                                         axis=0)
                    RV = jnp.concatenate([roll(V, d) for d in range(L)],
                                         axis=0)
                    m = jnp.where(RK == PIDX2L, 1.0, 0.0)
                    new_pm[t] = rowsum(m * RV)
                    new_ub[t] = rowsum(m * ODD2L)
                    parent[t] = rowsum(m * PMD2L)
                    if L > 1:
                        vLm1[t] = rowsum(jnp.where(RK == float(L - 1),
                                                   RV, 0.0))
                        vL[t] = rowsum(jnp.where(RK == float(L), RV, 0.0))
        else:
            rank0 = [jnp.zeros((1, FS, LANES), jnp.int32) for _ in TR]
            rank1 = [jnp.zeros((1, FS, LANES), jnp.int32) for _ in TR]
            if "forkrank" in ablate:  # phase probe: trivial ranks (WRONG)
                rank0 = [pidx for _ in TR]
                rank1 = [pidx for _ in TR]
            else:
                for d in range(L):
                    silt = pmd[d] < pidxf
                    for t in TR:
                        r0, r1 = roll(cand0[t], d), roll(cand1[t], d)
                        rank0[t] = (rank0[t]
                                    + ((r0 < cand0[t])
                                       | ((r0 == cand0[t]) & silt))
                                    + (r1 < cand0[t]))
                        rank1[t] = (rank1[t]
                                    + ((r0 < cand1[t]) | (r0 == cand1[t]))
                                    + ((r1 < cand1[t])
                                       | ((r1 == cand1[t]) & silt)))
            if "forksel" in ablate:  # phase probe: trivial selection (WRONG)
                new_pm = [cand0[t] for t in TR]
                parent = [pidxf for _ in TR]
            else:
                for d in range(L):
                    for t in TR:
                        rr0, rc0 = roll(rank0[t], d), roll(cand0[t], d)
                        rr1, rc1 = roll(rank1[t], d), roll(cand1[t], d)
                        m0 = jnp.where(rr0 == pidx, 1.0, 0.0)
                        m1 = jnp.where(rr1 == pidx, 1.0, 0.0)
                        new_pm[t] = new_pm[t] + m0 * rc0 + m1 * rc1
                        new_ub[t] = new_ub[t] + m1
                        parent[t] = parent[t] + (m0 + m1) * pmd[d]
                        if L > 1:
                            vLm1[t] = (vLm1[t]
                                       + jnp.where(rr0 == L - 1, rc0, 0.0)
                                       + jnp.where(rr1 == L - 1, rc1, 0.0))
                            vL[t] = (vL[t] + jnp.where(rr0 == L, rc0, 0.0)
                                     + jnp.where(rr1 == L, rc1, 0.0))

        if L > 1:
            for t in TR:
                tie = jnp.logical_and(vLm1[t] == vL[t], vL[t] < BIG / 2)
                if is_frozen is not None:
                    tie = jnp.logical_and(tie, jnp.logical_not(is_frozen))
                tie_ref[t] = tie_ref[t] + tie.astype(jnp.float32)

        if L > 1 and "forkeager" not in ablate:
            els = [llr[t, :ER, :, :] for t in TR]
            ebs = [bits[t, :ER, :, :] for t in TR]
            sgs = [sig[t] for t in TR]  # PSR packed rows — digit-agnostic
            gel = [jnp.zeros_like(els[t]) for t in TR]
            geb = [jnp.zeros_like(ebs[t]) for t in TR]
            gsg = [jnp.zeros_like(sgs[t]) for t in TR]
            if stacked:
                # one [2*ER + PSR]-row stack per tile: a single roll + one
                # broadcast mask-mul-add per d instead of three (same
                # one-hot parent map -> bit-identical)
                stks = [jnp.concatenate([els[t], ebs[t], sgs[t]], axis=0)
                        for t in TR]
                accs = [jnp.zeros_like(stks[t]) for t in TR]
                for d in range(L):
                    for t in TR:
                        mask = jnp.where(parent[t] == pmd[d], 1.0, 0.0)
                        accs[t] = accs[t] + mask * roll(stks[t], d)
                for t in TR:
                    gel[t] = accs[t][:ER]
                    geb[t] = accs[t][ER : 2 * ER]
                    gsg[t] = accs[t][2 * ER :]
            else:
                # gather through the parent map, T-interleaved per roll term
                for d in range(L):
                    for t in TR:
                        mask = jnp.where(parent[t] == pmd[d], 1.0, 0.0)
                        gel[t] = gel[t] + mask * roll(els[t], d)
                        geb[t] = geb[t] + mask * roll(ebs[t], d)
                        gsg[t] = gsg[t] + mask * roll(sgs[t], d)
            for t in TR:
                if is_frozen is None:
                    llr[t, :ER, :, :] = gel[t]
                    bits[t, :ER, :, :] = geb[t]
                    sig[t] = gsg[t]
                else:
                    llr[t, :ER, :, :] = jnp.where(is_frozen, els[t], gel[t])
                    bits[t, :ER, :, :] = jnp.where(is_frozen, ebs[t], geb[t])
                    sig[t] = jnp.where(is_frozen, sgs[t], gsg[t])

        gathered_extra = None
        if extra is not None and L > 1:
            gathered_extra = [gather_rows(extra[t], parent[t]) for t in TR]

        for t in TR:
            if is_frozen is None:
                pm_ref[t] = new_pm[t]
                ub_ref[t] = new_ub[t]
            else:
                pm_ref[t] = jnp.where(is_frozen, pms[t] + pens[t][0],
                                      new_pm[t])
                ub_ref[t] = jnp.where(is_frozen, jnp.zeros_like(new_ub[t]),
                                      new_ub[t])
        mark_forked()
        return gathered_extra

    # ---- collapsed-node helpers ------------------------------------------
    def descend(xs, s):
        """Vectorized all-zero-partial-sum descent per tile: stage-s llr
        block [2^s, FS, LANES] -> leaf LLRs in natural leaf order.  Each
        level emits [chk(up, dn); dn + up] per block — the exact f/g values
        the serial schedule computes when every partner bit is 0."""
        w = 1 << s
        xs = list(xs)
        if "descent" in ablate:  # phase probe (WRONG results, same shapes)
            return xs
        for k in range(s):
            c = 1 << k
            h = w >> (k + 1)
            for t in TR:
                v = xs[t].reshape(c, 2, h, FS, LANES)
                up, dn = v[:, 0], v[:, 1]
                xs[t] = jnp.stack([chk(up, dn), dn + up], axis=1).reshape(
                    w, FS, LANES)
        return xs

    def add_pen0_serial(leaves, count):
        """PM += PHI(l_j, 0) for leaves 0..count-1, accumulated IN LEAF ORDER
        (the reference's per-leaf f32 association, SCL_1024.c:663-666)."""
        pen0s = []
        for t in TR:
            absl = jnp.abs(leaves[t])
            pen0s.append(lut_correction(absl)
                         + jnp.where(leaves[t] < 0, absl, 0.0))
        if "pmbreak" in ablate:  # keep the serial adds, drop the PM read
            pms = [jnp.zeros((1, FS, LANES), jnp.float32) for _ in TR]
        else:
            pms = [pm_ref[t] for t in TR]
        for j in range(count):
            for t in TR:
                pms[t] = pms[t] + pen0s[t][j : j + 1, :, :]
        for t in TR:
            pm_ref[t] = pms[t]

    # ---- loop node (third-generation masked inner body) -------------------
    def run_loop(nd):
        w = 1 << nd.stage
        off = nd.off
        has_frozen = nd.has_frozen

        def inner_body(jj, carry):
            tz = _ntz32(jj | w)
            for i in range(nd.stage - 1, -1, -1):
                if "loopdescent" in ablate:  # phase probe (WRONG results)
                    break
                wi = 1 << i
                lo, hi = _slot(i)
                slo, shi = _slot(i + 1)
                use_g = tz == i
                use_f = tz > i
                for t in TR:
                    src = llr[t, slo:shi, :, :]
                    up, dn = src[:wi], src[wi:]
                    pb = bits[t, lo:hi, :, :]
                    old = llr[t, lo:hi, :, :]
                    g_new = dn + (1.0 - 2.0 * pb) * up
                    f_new = chk(up, dn)
                    llr[t, lo:hi, :, :] = jnp.where(
                        use_g, g_new, jnp.where(use_f, f_new, old))

            is_frozen = fr_ref[0, off + jj] == 1 if has_frozen else None
            fork([llr[t, 0:1, :, :] for t in TR], is_frozen)

            t1 = _ntz32(jj + 1)
            vs = [ub_ref[t] for t in TR]
            for i in range(nd.stage):
                lo, hi = _slot(i)
                for t in TR:
                    old = bits[t, lo:hi, :, :]
                    bits[t, lo:hi, :, :] = jnp.where(t1 == i, vs[t], old)
                    vs[t] = jnp.concatenate([_fxor(old, vs[t]), vs[t]],
                                            axis=0)
            return carry

        lax.fori_loop(0, w, inner_body, jnp.int32(0))
        mark_forked()  # the traced fork() calls above ran under trace once;
        # the loop executes them w times — flags must reflect the LAST one

        # climb: node decision block from slots 0..stage-1 + ub
        vs = [ub_ref[t] for t in TR]
        for i in range(nd.stage):
            lo, hi = _slot(i)
            for t in TR:
                old = bits[t, lo:hi, :, :]
                vs[t] = jnp.concatenate([_fxor(old, vs[t]), vs[t]], axis=0)
        return vs

    # ---- R1 node (bounded-fork node-level list processing) ---------------
    def run_r1(nd):
        """All-info node of width w via the fast-SSC-list rate-1 rule
        (Hashemi/Condo/Gross bounded-fork enumeration), APPROXIMATE vs the
        exact per-leaf schedule (the hard PM drops the lut(|l|) terms of
        the reference PHI and evaluates flip costs on the node-level alpha
        instead of the per-leaf LLRs) — opt-in via scl_decode_fast(r1=...),
        BLER-qualified like chk_fast (docs/ROOFLINE.md R1 section):

          * beta = hard(alpha) per path; flipping x_j costs |alpha_j|;
          * only the t = min(L-1, w) least-reliable positions can flip in a
            surviving path, processed in increasing-|alpha| order with the
            SAME 2L->L rank selection (and tie-breaks) as every other fork;
          * within-node per-path state (composed parent map sigp, packed
            flip bits, packed flip positions) rides through each fork as
            single gathered rows — the successive minima and their
            positions are precomputed ONCE on the pre-fork paths, so no
            w-row state is gathered per round; beta and the positions are
            materialized through the composed map once at the end.
        """
        w = 1 << nd.stage
        t = min(L - 1, w)
        alphas = read_llr(nd.stage)
        betas = [jnp.where(alphas[q] < 0.0, 1.0, 0.0) for q in TR]
        if t == 0:  # L == 1: pure hard decision, zero hard-PM penalty
            return betas, False

        wbits = max(1, nd.stage)
        DPW = max(1, 24 // wbits)       # packed flip positions per f32 row
        PR = (t + DPW - 1) // DPW
        FPR = (t + 23) // 24            # packed flip bits per f32 row
        riota = lax.broadcasted_iota(
            jnp.int32, (w, FS, LANES), 0).astype(jnp.float32)

        # successive minima of |alpha| + first-occurrence positions, on the
        # ORIGINAL (pre-fork) paths.  Lexicographic (value, index) tree-
        # argmin: log2(w) PARALLEL fold levels instead of a length-w serial
        # first-occurrence scan (the scan was a dependent 1-vreg chain —
        # exactly the issue-latency worst case the microbench quantifies).
        # Ties break toward the smaller index == first occurrence, so the
        # values are identical to the serial formulation (twin unchanged).
        def row_argmin(v, ix):
            while v.shape[0] > 1:
                h = v.shape[0] // 2
                av, bv = v[:h], v[h:]
                ai, bi = ix[:h], ix[h:]
                tb = jnp.logical_or(bv < av,
                                    jnp.logical_and(bv == av, bi < ai))
                v = jnp.where(tb, bv, av)
                ix = jnp.where(tb, bi, ai)
            return v, ix

        mins = [[] for _ in TR]
        idxs = [[] for _ in TR]
        xm = [jnp.abs(alphas[q]) for q in TR]
        for k in range(t):
            for q in TR:
                m, idx = row_argmin(xm[q], riota)
                xm[q] = xm[q] + jnp.where(riota == idx, BIG, 0.0)
                mins[q].append(m)
                idxs[q].append(idx)

        packed_idx = []
        for q in TR:
            rows = []
            for pr in range(PR):
                acc = jnp.zeros((1, FS, LANES), jnp.float32)
                for j, k in enumerate(range(pr * DPW,
                                            min(t, (pr + 1) * DPW))):
                    acc = acc + idxs[q][k] * float(w ** j)
                rows.append(acc)
            packed_idx.append(jnp.concatenate(rows, axis=0))

        sigp = [pidxf for _ in TR]  # composed within-node parent map
        flp = [jnp.zeros((FPR, FS, LANES), jnp.float32) for _ in TR]
        zero1 = jnp.zeros((1, FS, LANES), jnp.float32)
        for k in range(t):
            fr_row_k = k // 24
            pens = []
            for q in TR:
                mk = gather_rows(mins[q][k], sigp[q])
                pens.append((zero1, mk))
            extra = [jnp.concatenate([sigp[q], flp[q]], axis=0) for q in TR]
            gex = fork_sel(pens, None, extra=extra)
            for q in TR:
                sigp[q] = gex[q][0:1]
                g = gex[q][1:]
                # Mosaic rejects zero-row slices: only materialize the
                # non-empty neighbors of the shifted row
                parts = []
                if fr_row_k > 0:
                    parts.append(g[:fr_row_k])
                parts.append(g[fr_row_k : fr_row_k + 1] * 2.0 + ub_ref[q])
                if fr_row_k + 1 < FPR:
                    parts.append(g[fr_row_k + 1 :])
                flp[q] = (jnp.concatenate(parts, axis=0)
                          if len(parts) > 1 else parts[0])

        # materialize the decision block in logical path order
        out = []
        for q in TR:
            x = gather_rows(betas[q], sigp[q])
            idx_g = gather_rows(packed_idx[q], sigp[q])
            for k in range(t):
                pr, kk = divmod(k, DPW)
                hi = jnp.floor(idx_g[pr : pr + 1] / float(w ** kk))
                idxk = hi - float(w) * jnp.floor(hi / float(w))
                rk = k // 24
                c_end = min(t, (rk + 1) * 24) - 1  # last round in this row
                fh = jnp.floor(flp[q][rk : rk + 1] / float(2 ** (c_end - k)))
                flk = fh - 2.0 * jnp.floor(fh / 2.0)
                oh = jnp.where(riota == idxk, 1.0, 0.0)
                x = jnp.abs(x - oh * flk)
            out.append(x)
        return out, True

    # ---- recursion --------------------------------------------------------
    def process(nd):
        """Emit node nd.  Returns (vs, forked): vs = T-list of the node's
        decision block x = encode(u_node) as [2^stage, FS, LANES] VALUES in
        logical path order, or None if statically all-zero; forked = whether
        any path selection was emitted (sigma digits scrambled).  The
        None-ness and fork pattern are schedule properties — identical for
        every tile."""
        if nd.kind == "r0":
            leaves = descend(read_llr(nd.stage), nd.stage)
            add_pen0_serial(leaves, 1 << nd.stage)
            return None, False
        if nd.kind == "rep":
            w = 1 << nd.stage
            leaves = descend(read_llr(nd.stage), nd.stage)
            add_pen0_serial(leaves, w - 1)
            fork([leaves[t][w - 1 : w, :, :] for t in TR], None)
            return [jnp.broadcast_to(ub_ref[t], (w, FS, LANES))
                    for t in TR], True
        if nd.kind == "loop":
            return run_loop(nd), True
        if nd.kind == "r1":
            return run_r1(nd)

        # branch
        s = nd.stage
        h = 1 << (s - 1)
        srcs = read_llr(s)
        if "boundaryfg" in ablate:  # phase probe (WRONG results)
            write_llr(s - 1, [srcs[t][:h] for t in TR])
        else:
            write_llr(s - 1, [chk(srcs[t][:h], srcs[t][h:]) for t in TR])
        v_l, fk_l = process(nd.left)

        if v_l is None:
            # ZERO propagation: the R0 left child's decision block is
            # all-zero in every lane — skip the slot store; the stale slot
            # (and its sigma digit) is never read on this path
            if s - 1 > S:
                clean_bits[s - 1] = False
        else:
            write_bits(s - 1, v_l)

        srcs = read_llr(s)  # re-gather if the left half forked
        if "boundaryfg" in ablate:
            write_llr(s - 1, [srcs[t][h:] for t in TR])
        elif v_l is None:
            write_llr(s - 1, [srcs[t][h:] + srcs[t][:h] for t in TR])
        else:
            write_llr(s - 1, [srcs[t][h:] + (1.0 - 2.0 * v_l[t]) * srcs[t][:h]
                              for t in TR])
        v_r, fk_r = process(nd.right)

        if v_l is None and v_r is None:
            return None, False  # impossible by construction (parent is r0)
        if v_l is None:
            left_x = [jnp.zeros((h, FS, LANES), jnp.float32) for _ in TR]
        else:
            left_x = read_bits(s - 1)
        if v_r is None:
            v_r = [jnp.zeros((h, FS, LANES), jnp.float32) for _ in TR]
        return (
            [jnp.concatenate([_fxor(left_x[t], v_r[t]), v_r[t]], axis=0)
             for t in TR],
            fk_l or fk_r,
        )

    root = decompose(frozen, n, 0, wloop, r1min=r1)
    if root.kind in ("branch", "r1"):
        vs, _ = process(root)
    else:
        # degenerate tiny-N roots (tests): handled via the channel directly
        if root.kind == "r0":
            leaves = descend([read_ch(t) for t in TR], n)
            add_pen0_serial(leaves, N)
            vs = None
        elif root.kind == "rep":
            leaves = descend([read_ch(t) for t in TR], n)
            add_pen0_serial(leaves, N - 1)
            fork([leaves[t][N - 1 : N, :, :] for t in TR], None)
            vs = [jnp.broadcast_to(ub_ref[t], (N, FS, LANES)) for t in TR]
        else:
            raise NotImplementedError("N <= wloop roots are not supported")

    for t in TR:
        if vs is None:
            u_out_ref[t] = jnp.zeros((N, FS, LANES), jnp.int8)
        else:
            u_out_ref[t] = _encode_sub(vs[t], n, FS).astype(jnp.int8)
        pm_out_ref[t] = pm_ref[t]
        tie_out_ref[t] = tie_ref[t].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("frozen", "list_size", "subtree", "wloop", "interpret",
                     "fs_cap", "tiles", "ablate", "r1", "stacked",
                     "ch_rep",
                     "sig_chunk"),
)
def scl_decode_fast(
    ch_llr,
    frozen: Tuple[bool, ...],
    list_size: int = 8,
    subtree: int = 0,
    wloop: int = 4,
    interpret: bool = False,
    fs_cap: int = 0,
    tiles: int = 1,
    ablate: str = "",
    r1: int = 0,
    stacked: bool = False,
    sig_chunk: int = 0,
    ch_rep: bool = False,
):
    """Frozen-specialized Pallas SCL decode.  ch_llr [B, N] f32; frozen is a
    STATIC tuple of bools (the compile-time mask).  tiles = T independent
    frame tiles interleaved per kernel body (latency recovery — see the
    kernel docstring); B must divide by tiles * frames_per_tile.  Returns
    (u_all [B, L, N] int8, PM [B, L] f32, ties [B] int32) — identical
    contract to scl_decode_tree/scl_decode_subtree.

    ablate: comma-separated phase names to STUB OUT for cost attribution
    (docs/ROOFLINE.md "phase ablation"): sigread, forkrank, forksel,
    forkeager, loopdescent, descent, boundaryfg.  Ablated kernels produce
    WRONG decode results with identical shapes/dataflow — measurement-only.

    r1 > 0 enables the APPROXIMATE fast-SSC-list rate-1 shortcut on all-info
    blocks of width >= r1 (bounded forks, hard PM — see run_r1).  Opt-in
    flavor: NOT bit-parity with the exact schedule; qualified by the
    chk_fast 1000-error-block BLER protocol (docs/ROOFLINE.md).

    stacked=True emits the fork phases as across-d stacked blocks (height
    2L compare/mask/reduce passes instead of L height-1 chains) — BIT-
    IDENTICAL results (all cross-d accumulations are one-hot), different
    op schedule; see ROOFLINE round-4 "stacked fork"."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    L = list_size
    T = tiles
    frozen = tuple(bool(b) for b in frozen)
    assert len(frozen) == N, (len(frozen), N)
    assert L <= LANES and LANES % L == 0, L
    assert wloop >= 2 and (wloop & (wloop - 1)) == 0, wloop
    assert N > wloop, (N, wloop)
    assert T >= 1, T
    s0 = wloop.bit_length() - 1
    S = subtree or s0
    assert s0 <= S <= n - 1, (S, s0, n)
    F = LANES // L
    fpt = frames_per_tile(L, B // T)
    fs = fpt // F
    if fs_cap:  # diagnostic: shrink sublane groups per tile (latency-vs-
        fs = min(fs, fs_cap)  # throughput probe; production leaves this 0)
        fpt = fs * F
    assert B % (T * fpt) == 0, (B, T, fpt)
    NS = n - 1 - S
    SROWS = max(2 * NS, 1)
    LBITS = max(1, (L - 1).bit_length())
    PSR = (SROWS + max(1, 24 // LBITS) - 1) // max(1, 24 // LBITS)

    fr_row = jnp.asarray(frozen, jnp.int32)[None, :]
    C = B // (T * fpt)
    ch_c = ch_llr.reshape(C, T, fs, F, N).transpose(0, 1, 4, 2, 3)
    if not ch_rep:  # legacy XLA-side path-lane replication (the A/B base)
        ch_c = jnp.tile(ch_c, (1, 1, 1, 1, L))  # [C, T, N, fs, 128]
    CH_LANES = F if ch_rep else LANES

    kernel = functools.partial(
        _scl_fast_kernel, n=n, N=N, L=L, S=S, FS=fs, frozen=frozen,
        wloop=wloop, T=T,
        ablate=tuple(s for s in ablate.split(",") if s), r1=r1,
        stacked=stacked, sig_chunk=sig_chunk, ch_rep=ch_rep,
    )

    u_all_c, PM_c, ties_c = pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((None, T, N, fs, CH_LANES),
                         lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, T, N, fs, LANES), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, 1, fs, LANES), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, 1, fs, LANES), lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, T, N, fs, LANES), jnp.int8),
            jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.float32),
            jax.ShapeDtypeStruct((C, T, 1, fs, LANES), jnp.int32),
        ),
        scratch_shapes=(
            pltpu.VMEM((T, N, fs, LANES), jnp.float32),       # llr
            pltpu.VMEM((T, N, fs, LANES), jnp.float32),       # bits
            pltpu.VMEM((T, PSR, fs, LANES), jnp.float32),     # packed sigma
            pltpu.VMEM((T, N // 2, fs, LANES), jnp.float32),  # gather acc
            pltpu.VMEM((T, 1, fs, LANES), jnp.float32),       # pm
            pltpu.VMEM((T, 1, fs, LANES), jnp.float32),       # ub
            pltpu.VMEM((T, 1, fs, LANES), jnp.float32),       # ties
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ch_c, fr_row)

    u_all = u_all_c.reshape(C * T, N, fs, L, F).transpose(0, 2, 4, 3, 1)
    u_all = u_all.reshape(B, L, N)
    PM = PM_c.reshape(C * T, fs, L, F).transpose(0, 1, 3, 2).reshape(B, L)
    ties = ties_c.reshape(C * T, fs, L, F)[:, :, 0, :].reshape(B)
    return u_all, PM, ties
