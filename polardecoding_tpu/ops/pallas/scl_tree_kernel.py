"""Subtree-hybrid Pallas TPU kernel for whole-frame SCL decoding.

Replaces the first-generation whole-decode kernels (git history: masked
single-pass and pl.when-branchy variants).  Those hit a hard wall measured on
v5e: Mosaic lowers both masking and `pl.when` as predicated compute — nothing
is ever skipped — so every one of the N serial bit steps paid the FULL
O(N)-wide LLR chain and an O(L^2 N) select-sum path copy.  At N=1024, L=8
that is ~750M VPU ops/frame, a ~5k fps ceiling (3.1k measured).

Schedule — the SC tree, statically unrolled to depth S
(ref: SCL_1024.c:546-680 — semantics unchanged, schedule re-derived):

  * The tree is STATICALLY UNROLLED down to stage `s` (subtree width
    W = 2^s).  The inter-subtree work — the g-update at stage
    T = s + ntz(k) entering subtree k, the f-chain from T-1 down to s, and
    the bit-combine up to T' = s + ntz(k+1) leaving it — becomes straight-
    line code on full-width tiles: no masking, no waste.
  * Only the per-bit loop INSIDE a width-W subtree runs masked (one
    fori_loop per subtree); the masked LLR pass covers stages < s only, so
    the per-bit waste is O(W), not O(N).  Total LLR work drops from
    O(N^2 L) to O(N (W + n) L).
  * Path copies are split: slots of stages <= s (rows [0, 2W-1), the only
    state the inner loop touches) are copied EAGERLY at each selection;
    slots of stages > s are never copied — instead per-stage PERMUTATION
    maps sigma[stage] record which physical path slot holds each logical
    path's data (classical lazy-copy SCL).  sigma-applied reads happen only
    at subtree boundaries; a boundary that (re)writes a stage in logical
    order resets its sigma row to the identity.

Layout — PATHS IN LANES (third generation, the one that finally fits the
VPU).  A tile serves FS * F frames: lane = p*F + f (L path blocks of
F = 128/L lanes), sublane group fs in [0, FS=8), frame = fs*F + f.  Every
per-path array is ONE ref [rows, FS, 128] whose minor (FS, 128) block is a
full 8x128 vreg:

  * cross-path data movement (the SCL path copy, sigma reads, and the 2L-
    candidate ranking) = static lane ROTATIONS by d*F plus per-lane masks —
    the same `pltpu.roll` primitive the BP kernel is built on.  No sublane
    slicing, no relayouts, no L^2 anything.
  * the traced program is O(M*(S + L)) ops, which is what makes L=32
    COMPILABLE (per-path/per-pair loop formulations produced >1M-op traces
    at N=1024 L=32 that Mosaic chewed on for >40 min).
  * VMEM state is [N, FS, 128] f32 per array — ~4 MB at N=1024
    INDEPENDENT of L, so every list size runs the full 128-lane tile.

Earlier generations, measured at N=1024 L=8 (B=1024, kernel-only): per-path
2-D refs with [L*w, 128] sublane concats — 54k fps but O(M L^2) trace
(L=32 uncompilable); [L, w, 128] path-major 3-D — 31.5k (sub-8 middle dims
pad every low-stage tile); [w, L, 128] path-minor 3-D — 34.6k (parent
gather needs sublane slice-broadcasts).  This layout turns those gathers
into ~3L single-vreg rolls.

Compact slot layout: slot(i) = rows 2^i-1 .. 2^{i+1}-1 (models/_compact.py
transposed); channel LLRs arrive pre-tiled to [N, FS, 128] (each frame's
row replicated across its L path lanes); decisions are recovered by the
polar involution u = encode(x) as a full-width epilogue (Mosaic has no
dynamic-index stores); bits are f32 0/1 (xor = |a-b|).

Selection semantics match models/scl.py and the C reference exactly: 2L PM
candidates [PM + PHI(l,0) | PM + PHI(l,1)], keep the L smallest with ties by
candidate index (the reference's scan order), frozen bits pay PHI(l,0) on
every path with no fork (SCL_1024.c:663-666).  The kernel also counts
median ties — the reference's "Oops!" condition (SCL_1024.c:620-633) where
its strict-below-median repack would keep fewer than L paths — per frame,
so the documented keep-exactly-L divergence is observable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk, lut_correction

BIG = 1e30
LANES = 128
FS = 8  # max sublane frame groups per tile


def _ntz32(x):
    v = ((x & -x) - 1).astype(jnp.uint32)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24).astype(jnp.int32)


def _ntz_static(x: int) -> int:
    return (x & -x).bit_length() - 1


def _fxor(a, b):
    """xor of 0/1 floats."""
    return jnp.abs(a - b)


def _encode_sub(x, n, fs):
    """Lee butterfly (upper ^= lower) on [N, fs, 128] 0/1 floats along the
    LEADING axis — the tiled (fs, 128) minor pair is untouched, so Mosaic
    lowers the reshapes."""
    N = x.shape[0]
    for i in range(n):
        d = 1 << i
        v = x.reshape(N // (2 * d), 2, d, fs, LANES)
        up = _fxor(v[:, 0], v[:, 1])
        x = jnp.stack([up, v[:, 1]], axis=1).reshape(N, fs, LANES)
    return x


def _slot(i):
    return (1 << i) - 1, (2 << i) - 1


def _scl_tree_kernel(ch_ref, fr_ref, u_out_ref, pm_out_ref, tie_out_ref,
                     llr, bits, sig, gat, pm_ref, ub_ref, tie_ref,
                     *, n, N, L, S, FS):
    """Refs (paths in lanes, FS frame groups in sublanes):
      ch_ref    [N, FS, 128] f32   channel LLRs (pre-tiled across path lanes)
      fr_ref    [1, N] i32 SMEM    frozen mask
      u_out     [N, FS, 128] i8 / pm_out, tie_out [1, FS, 128] f32/i32
      llr/bits  [N, FS, 128] f32 scratch, compact slots
      sig       [SROWS, FS, 128] f32: rows [0, n-1-S) = sigma_llr for stages
                S+1..n-1, rows [n-1-S, 2(n-1-S)) = sigma_bits (value =
                physical path slot, exact in f32)
      gat       [N/2, FS, 128] f32 gather accumulator: the L-term roll-mask
                sums write through this ref so Mosaic keeps ONE roll
                temporary live instead of L (at L=32 the value-chain form
                held ~64 MB of [512, 8, 128] stack temps and blew scoped
                VMEM)
      pm_ref/ub_ref/tie_ref [1, FS, 128] f32
    """
    F = LANES // L
    W = 1 << S
    M = N // W
    NS = n - 1 - S  # sigma-managed stages: S+1 .. n-1
    SROWS = max(2 * NS, 1)
    ER = 2 * W - 1  # eager region: rows of slots 0..S

    def roll(x, d):
        """Lane value from path block (p - d) mod L, same frame lane."""
        return pltpu.roll(x, d * F, axis=x.ndim - 1) if d else x

    # static per-lane path index p and its shifted companions (p - d) mod L
    pidx = lax.broadcasted_iota(jnp.int32, (1, FS, LANES), 2) // F
    pmd = [((pidx - d) % L).astype(jnp.float32) for d in range(L)]
    pidxf = pmd[0]

    llr[:] = jnp.zeros((N, FS, LANES), jnp.float32)
    bits[:] = jnp.zeros((N, FS, LANES), jnp.float32)
    sig[:] = jnp.broadcast_to(pidxf, (SROWS, FS, LANES))
    pm_ref[:] = jnp.where(pidx == 0, 0.0, BIG)
    ub_ref[:] = jnp.zeros((1, FS, LANES), jnp.float32)
    tie_ref[:] = jnp.zeros((1, FS, LANES), jnp.float32)

    def sigma_llr_row(i):  # stage i in S+1..n-1
        return i - (S + 1)

    def sigma_bits_row(i):
        return NS + i - (S + 1)

    def sig_read(arr, srow, i):
        """Materialize every logical path's slot(i) of arr (llr or bits) via
        its sigma row: lane (p, f) takes the value at path block sigma[p],
        found d = (p - sigma[p]) mod L rolls away."""
        lo, hi = _slot(i)
        w = hi - lo
        sel = sig[srow : srow + 1, :, :]
        src = arr[lo:hi, :, :]
        gat[:w, :, :] = jnp.zeros((w, FS, LANES), jnp.float32)
        for d in range(L):
            mask = jnp.where(sel == pmd[d], 1.0, 0.0)
            gat[:w, :, :] = gat[:w, :, :] + mask * roll(src, d)
        return gat[:w, :, :]

    def boundary_llr(k):
        """Static entry chain for subtree k: g at T = S + ntz(k) (k > 0) or
        pure f from n-1 (k == 0), then f down to stage S."""
        if k == 0:
            top = n - 1  # f at stage n-1 reads ch
            up, dn = ch_ref[: 1 << top], ch_ref[1 << top : 2 << top]
            lo, hi = _slot(top)
            llr[lo:hi, :, :] = chk(up, dn)
            start = top - 1
        else:
            T = S + _ntz_static(k)
            w = 1 << T
            lo, hi = _slot(T)
            if T + 1 == n:
                src = ch_ref[: 2 * w]
            else:  # T + 1 in S+1..n-1: sigma-managed
                src = sig_read(llr, sigma_llr_row(T + 1), T + 1)
            up, dn = src[:w], src[w:]
            if T > S:
                pb = sig_read(bits, sigma_bits_row(T), T)
            else:  # T == S: slot S is in the eager region
                pb = bits[lo:hi, :, :]
            llr[lo:hi, :, :] = dn + (1.0 - 2.0 * pb) * up
            start = T - 1
            for i in range(T, S, -1):  # llr stages S+1..T now logical
                r = sigma_llr_row(i)
                sig[r : r + 1, :, :] = pidxf
        for i in range(start, S - 1, -1):
            w = 1 << i
            lo, hi = _slot(i)
            slo, shi = _slot(i + 1)
            src = llr[slo:shi, :, :]
            llr[lo:hi, :, :] = chk(src[:w], src[w:])

    def boundary_bits(k):
        """Static exit combine for subtree k: chain the last decision up to
        T' = S + ntz(k+1); at T' == n emit the codeword -> decisions."""
        Tp = min(S + _ntz_static(k + 1), n)
        v = ub_ref[:]  # [1, FS, LANES]
        for i in range(Tp):
            if i <= S:
                lo, hi = _slot(i)
                si = bits[lo:hi, :, :]
            else:
                si = sig_read(bits, sigma_bits_row(i), i)
            v = jnp.concatenate([_fxor(si, v), v], axis=0)
        if Tp == n:
            u_out_ref[:] = _encode_sub(v, n, FS).astype(jnp.int8)
        else:
            lo, hi = _slot(Tp)
            bits[lo:hi, :, :] = v
            if Tp > S:
                r = sigma_bits_row(Tp)
                sig[r : r + 1, :, :] = pidxf

    def inner_body(jj, k):
        j = jj + k * W
        t = _ntz32(j | N)
        # ---- masked LLR pass, stages S-1 .. 0 only
        for i in range(S - 1, -1, -1):
            w = 1 << i
            lo, hi = _slot(i)
            slo, shi = _slot(i + 1)
            use_g = t == i
            use_f = t > i
            src = llr[slo:shi, :, :]
            up, dn = src[:w], src[w:]
            pb = bits[lo:hi, :, :]
            old = llr[lo:hi, :, :]
            g_new = dn + (1.0 - 2.0 * pb) * up
            f_new = chk(up, dn)
            llr[lo:hi, :, :] = jnp.where(
                use_g, g_new, jnp.where(use_f, f_new, old))

        # ---- penalties
        l0 = llr[0:1, :, :]  # [1, FS, LANES]
        absl = jnp.abs(l0)
        base = lut_correction(absl)
        pen0 = base + jnp.where(l0 < 0, absl, 0.0)
        pen1 = base + jnp.where(l0 > 0, absl, 0.0)
        pm = pm_ref[:]
        is_frozen = fr_ref[0, j] == 1

        # ---- selection.  Candidate c = p is (path p, u=0) with PM cand0[p];
        # c = L + p is (path p, u=1) with cand1[p].  rank_r[p] = number of
        # candidates strictly smaller (ties broken by candidate index — the
        # reference's scan order, SCL_1024.c:606-620), computed pairwise
        # against the d-rolled rows.  Same-row index comparisons are the
        # static mask pmd[d] < p; cross-row ones are constant (row 0 index
        # always < row 1 index).
        cand0 = pm + pen0
        cand1 = pm + pen1
        rank0 = jnp.zeros((1, FS, LANES), jnp.int32)
        rank1 = jnp.zeros((1, FS, LANES), jnp.int32)
        for d in range(L):
            r0, r1 = roll(cand0, d), roll(cand1, d)
            silt = pmd[d] < pidxf  # static: (p - d) mod L < p
            rank0 = (rank0 + ((r0 < cand0) | ((r0 == cand0) & silt))
                     + (r1 < cand0))
            rank1 = (rank1 + ((r0 < cand1) | (r0 == cand1))
                     + ((r1 < cand1) | ((r1 == cand1) & silt)))

        # gather: child path block q takes the rank-q candidate; also collect
        # the rank L-1 / rank L values for the median-tie counter
        new_pm = jnp.zeros((1, FS, LANES), jnp.float32)
        new_ub = jnp.zeros((1, FS, LANES), jnp.float32)
        parent = jnp.zeros((1, FS, LANES), jnp.float32)
        vLm1 = jnp.zeros((1, FS, LANES), jnp.float32)
        vL = jnp.zeros((1, FS, LANES), jnp.float32)
        for d in range(L):
            rr0, rc0 = roll(rank0, d), roll(cand0, d)
            rr1, rc1 = roll(rank1, d), roll(cand1, d)
            m0 = jnp.where(rr0 == pidx, 1.0, 0.0)
            m1 = jnp.where(rr1 == pidx, 1.0, 0.0)
            new_pm = new_pm + m0 * rc0 + m1 * rc1
            new_ub = new_ub + m1
            parent = parent + (m0 + m1) * pmd[d]
            if L > 1:
                vLm1 = (vLm1 + jnp.where(rr0 == L - 1, rc0, 0.0)
                        + jnp.where(rr1 == L - 1, rc1, 0.0))
                vL = (vL + jnp.where(rr0 == L, rc0, 0.0)
                      + jnp.where(rr1 == L, rc1, 0.0))

        if L > 1:
            tie = jnp.logical_and(vLm1 == vL, vL < BIG / 2)
            tie = jnp.logical_and(tie, jnp.logical_not(is_frozen))
            tie_ref[:] = tie_ref[:] + tie.astype(jnp.float32)

        # ---- eager path copy of slots 0..S and the sigma maps: child q
        # reads parent[q]'s state, (q - parent[q]) mod L rolls away
        def gather_parent(x):
            # value-chain accumulation: per-term ref round-trips through
            # `gat` here cost 3x end-to-end (hot path, small [ER] tiles);
            # the live-temp VMEM pressure gat exists for is a boundary-time
            # (sig_read, [N/2] tiles) problem only
            acc = jnp.zeros(x.shape, jnp.float32)
            for d in range(L):
                mask = jnp.where(parent == pmd[d], 1.0, 0.0)
                acc = acc + mask * roll(x, d)
            return acc

        if L > 1:
            el = llr[:ER, :, :]
            eb = bits[:ER, :, :]
            sg = sig[:]
            llr[:ER, :, :] = jnp.where(is_frozen, el, gather_parent(el))
            bits[:ER, :, :] = jnp.where(is_frozen, eb, gather_parent(eb))
            sig[:] = jnp.where(is_frozen, sg, gather_parent(sg))

        pm_ref[:] = jnp.where(is_frozen, pm + pen0, new_pm)
        ub_ref[:] = jnp.where(is_frozen, jnp.zeros_like(new_ub), new_ub)

        # ---- masked combine, stages < S only (boundary handles jj == W-1)
        t1 = _ntz32(j + 1)
        v = ub_ref[:]
        for i in range(S):
            lo, hi = _slot(i)
            old = bits[lo:hi, :, :]
            bits[lo:hi, :, :] = jnp.where(t1 == i, v, old)
            v = jnp.concatenate([_fxor(old, v), v], axis=0)
        return k

    for k in range(M):
        boundary_llr(k)
        lax.fori_loop(0, W, inner_body, jnp.int32(k))
        boundary_bits(k)

    pm_out_ref[:] = pm_ref[:]
    tie_out_ref[:] = tie_ref[:].astype(jnp.int32)


def frames_per_tile(L: int, B: int = 1 << 30) -> int:
    """A full tile serves FS * (128/L) frames; small batches shrink the
    sublane group count."""
    F = LANES // L
    fs = FS
    while fs > 1 and (fs * F > B or B % (fs * F)):
        fs //= 2
    return fs * F


def default_subtree(n: int, L: int) -> int:
    """Tuned subtree depth S (window W = 2^S) per list size.

    Measured on v5e at N=1024, B=1024 kernel-only (paths-in-lanes layout):
    L=8: S=4 23.8k / S=5 32.6k / S=6 18.1k fps; L=16: S=4 8.6k / S=5 11.6k;
    L=32: S=2 10.5k / S=3 8.4k / S=4 6.0k / S=5 3.5k / S=6 1.8k — the
    eager-copy cost (O(L) roll-accumulates over 2W-1 rows per info bit)
    makes SMALL subtrees win at large L.  Compile time grows with the
    subtree count M (traced ops O(M L)): L=32 S=2 ~10 min — acceptable for
    the L=32 archive configs."""
    return min(5 if L <= 16 else 2, n - 2)


@functools.partial(
    jax.jit, static_argnames=("list_size", "subtree", "interpret")
)
def scl_decode_tree(
    ch_llr,
    frozen,
    list_size: int = 8,
    subtree: int = 0,
    interpret: bool = False,
):
    """Subtree-hybrid Pallas SCL decode.  ch_llr [B, N] f32, frozen [N] bool.
    Returns (u_all [B, L, N] int8, PM [B, L] f32, ties [B] int32) — u_all/PM
    as models/scl.scl_decode(return_all=True), plus the per-frame median-tie
    counter."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    L = list_size
    assert L <= LANES and LANES % L == 0, L
    S = subtree or default_subtree(n, L)
    assert 1 <= S <= n - 1, (S, n)
    F = LANES // L
    fpt = frames_per_tile(L, B)
    fs = fpt // F
    assert B % fpt == 0, (B, fpt)
    NS = n - 1 - S
    SROWS = max(2 * NS, 1)

    fr_row = jnp.asarray(frozen, jnp.int32)[None, :]
    # pre-tile channel LLRs: frame b = g*fpt + fs*F + f lives at sublane
    # group fs, lanes p*F + f for all paths p
    C = B // fpt
    ch_c = ch_llr.reshape(C, fs, F, N).transpose(0, 3, 1, 2)  # [C, N, fs, F]
    ch_c = jnp.tile(ch_c, (1, 1, 1, L))  # [C, N, fs, 128]

    kernel = functools.partial(
        _scl_tree_kernel, n=n, N=N, L=L, S=S, FS=fs,
    )

    u_all_c, PM_c, ties_c = pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((None, N, fs, LANES), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, N, fs, LANES), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, fs, LANES), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, fs, LANES), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((C, N, fs, LANES), jnp.int8),
                jax.ShapeDtypeStruct((C, 1, fs, LANES), jnp.float32),
                jax.ShapeDtypeStruct((C, 1, fs, LANES), jnp.int32),
            ),
            scratch_shapes=(
                pltpu.VMEM((N, fs, LANES), jnp.float32),       # llr
                pltpu.VMEM((N, fs, LANES), jnp.float32),       # bits
                pltpu.VMEM((SROWS, fs, LANES), jnp.float32),   # sigma
                pltpu.VMEM((N // 2, fs, LANES), jnp.float32),  # gather acc
                pltpu.VMEM((1, fs, LANES), jnp.float32),       # pm
                pltpu.VMEM((1, fs, LANES), jnp.float32),       # ub
                pltpu.VMEM((1, fs, LANES), jnp.float32),       # ties
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(ch_c, fr_row)

    # unpack: [C, N, fs, L, F] -> [C, fs, F, L, N] -> [B, L, N]
    u_all = u_all_c.reshape(C, N, fs, L, F).transpose(0, 2, 4, 3, 1)
    u_all = u_all.reshape(B, L, N)
    PM = PM_c.reshape(C, fs, L, F).transpose(0, 1, 3, 2).reshape(B, L)
    ties = ties_c.reshape(C, fs, L, F)[:, :, 0, :].reshape(B)
    return u_all, PM, ties
