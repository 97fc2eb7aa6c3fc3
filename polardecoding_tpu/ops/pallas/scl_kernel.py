"""Pallas TPU kernel for whole-frame SCL decoding — list state VMEM-resident.

Why a kernel: the jnp SCL engine (models/scl.py) runs the N-step serial bit
loop as a `lax.fori_loop` whose carry is the full per-path state; measured on
v5e, XLA copies the carried arrays through HBM every iteration (~43 us/iter
for even a trivial one-element update on a [1024, 8, 1023] carry), capping
the engine at ~1.5k frames/s at N=1024 regardless of gather tuning.  Here the
entire decode runs inside one kernel with every per-path array in mutable
VMEM scratch: the only HBM traffic is the channel-LLR read and the decoded
paths write.

Layout: FRAMES IN LANES.  Per-path compact state is [N-1 sublanes, TB lanes]
(slot for stage i = rows 2^i-1 .. 2^{i+1}-1, exactly models/_compact.py's
layout transposed).  SCL's per-bit ops touch slots of width 1..8 most of the
time; with frames in lanes each such op is one (8, 128) VPU tile serving 128
frames, instead of a lane-masked sliver.  Path metrics, penalties and
survivor math live as [L or 2L sublanes, TB lanes] tiles, and the per-frame
copy weights broadcast as [1, TB] rows.  The host-side wrapper transposes
channel LLRs in and decoded paths out (cheap one-time XLA transposes).

Semantics match models/scl.py (and therefore the C reference, SCL_1024.c —
see the golden-parity tests): LLR path metrics with the PHI table and
2L -> L survivor selection keeping the L smallest candidates, ties broken by
candidate index (cand layout [PM + PHI(l,0) | PM + PHI(l,1)], the
reference's scan order).

Mosaic-dictated notes:
  - predicated `pl.when` chains instead of lax.switch (branches mutate refs);
  - selection is gather-free: ranks from an all-pairs comparison, path copy
    as select-sum  new[k] = sum_p onehot[k][p] * old[p];
  - no dynamic-index stores exist: no decision history is kept — at the last
    bit the partial-sum combine yields each path's codeword x, and the polar
    transform's involution recovers u = encode(x) with sublane-axis
    reshapes (lane dim untouched, which Mosaic lowers happily);
  - bits are f32 0/1 (xor = |a - b|); frozen mask in SMEM for scalar reads.
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


def _ntz32(x):
    v = ((x & -x) - 1).astype(jnp.uint32)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24).astype(jnp.int32)


def _fxor(a, b):
    """xor of 0/1 floats."""
    return jnp.abs(a - b)


def _encode_sub(x, n, TB):
    """Lee butterfly transform (upper ^= lower) on a [N, TB] 0/1 array along
    the SUBLANE axis: reshape [G, 2, d, TB], combine, merge — the lane dim is
    never touched, so Mosaic lowers these reshapes."""
    N = x.shape[0]
    for i in range(n):
        d = 1 << i
        v = x.reshape(N // (2 * d), 2, d, TB)
        up = _fxor(v[:, 0], v[:, 1])
        x = jnp.stack([up, v[:, 1]], axis=1).reshape(N, TB)
    return x


def _scl_kernel(ch_ref, fr_ref, u_out_ref, pm_out_ref, llr, bits,
                tmp, pm_ref, ub_ref, *, n, N, TB, L, CH, BDT):
    """Refs (frames in lanes):
      ch_ref   [N, TB] f32 (input block, pre-transposed)
      fr_ref   [1, N] i32 in SMEM (frozen mask)
      u_out    [L, N, TB] i8 / pm_out [L, TB] f32 (output blocks)
      llr:     list of L scratch refs [N, TB] f32 (slot i = rows
                 2^i-1..2^{i+1}-1; top row is padding)
      bits:    list of L scratch refs [N, TB] BDT (same slot layout; BDT is
               f32 where it fits — faster, no relayouts — and int8 at
               N=1024 L=8 to stay inside the 16 MB scoped-vmem limit)
      tmp      2L scratch refs: L f32 [CH, TB] (llr chunks) then L int8
               [CH, TB] (bits chunks) — selection copies run in CH-sublane
               chunks so the double buffer is chunk-sized
      pm_ref   [L, TB] f32; ub_ref [L, TB] f32

    MASKED SINGLE-PASS DESIGN: Mosaic lowers pl.when by predicated
    compute-and-mask, not branch skipping (measured: runtime independent of
    how many branches are "taken"), so this kernel executes each per-bit
    phase exactly once with scalar masks instead of a chain of n+1 branch
    bodies that all run anyway:
      - one f- and one g-candidate per stage per bit, selected by
        (t == i) / (t > i) scalars;
      - the partial-sum combine chain always runs to the top, writing only
        the t1-th slot and capturing the full codeword into the output block
        at the last bit (t1 == n); decisions are recovered by one
        encode-involution epilogue per path AFTER the bit loop;
      - selection always runs; frozen bits keep their state via a final
        scalar select (preserving the jnp engine's slot order exactly).
    """
    tmp_l, tmp_b = tmp[:L], tmp[L:]
    for p in range(L):
        llr[p][:] = jnp.zeros((N, TB), jnp.float32)
        bits[p][:] = jnp.zeros((N, TB), BDT)
        u_out_ref[p, :, :] = jnp.zeros((N, TB), jnp.int8)

    def bxor(a, b):
        return (a ^ b) if BDT == jnp.int8 else _fxor(a, b)  # 0/1: |a-b| exact
    row = jax.lax.broadcasted_iota(jnp.int32, (L, TB), dimension=0)
    pm_ref[:] = jnp.where(row == 0, 0.0, BIG)

    def slot(i):
        return (1 << i) - 1, (2 << i) - 1

    def body(j, carry):
        t = _ntz32(j | N)
        # ---- masked LLR pass: stages n-1 .. 0, one f + one g candidate each
        for i in range(n - 1, -1, -1):
            w = 1 << i
            lo, hi = slot(i)
            use_g = t == i
            use_f = t > i
            for p in range(L):
                if i + 1 == n:
                    up, dn = ch_ref[:w, :], ch_ref[w : 2 * w, :]
                else:
                    slo, shi = slot(i + 1)
                    src = llr[p][slo:shi, :]
                    up, dn = src[:w, :], src[w:, :]
                pb = bits[p][lo:hi, :].astype(jnp.float32)
                g_new = dn + (1.0 - 2.0 * pb) * up
                f_new = chk(up, dn)
                old = llr[p][lo:hi, :]
                llr[p][lo:hi, :] = jnp.where(
                    use_g, g_new, jnp.where(use_f, f_new, old)
                )

        # ---- penalties + selection (always; frozen masked at the end)
        l0 = jnp.concatenate([llr[p][0:1, :] for p in range(L)], axis=0)
        absl = jnp.abs(l0)
        base = lut_correction(absl)
        pen0 = base + jnp.where(l0 < 0, absl, 0.0)
        pen1 = base + jnp.where(l0 > 0, absl, 0.0)
        pm = pm_ref[:]
        is_frozen = fr_ref[0, j] == 1

        cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)  # [2L, TB]
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * L, TB), 0)
        rank = jnp.zeros((2 * L, TB), jnp.int32)
        for i in range(2 * L):
            ci = cand[i : i + 1, :]
            less = (cand < ci) | ((cand == ci) & (rows < i))
            ri = jnp.sum(less.astype(jnp.int32), axis=0, keepdims=True)
            rank = jnp.where(rows == i, ri, rank)
        onehot = [(rank == k).astype(jnp.float32) for k in range(L)]
        W = [
            [onehot[k][p : p + 1, :] + onehot[k][L + p : L + p + 1, :]
             for p in range(L)]
            for k in range(L)
        ]
        # chunked path copy; frozen bits keep the old chunk.  llr uses a
        # select-sum MAC; int8 bits use a where-select chain (the parent is
        # unique per slot, so W[k][p] is 0/1)
        for c0 in range(0, N, CH):
            for p in range(L):
                tmp_l[p][:] = llr[p][c0 : c0 + CH, :]
                tmp_b[p][:] = bits[p][c0 : c0 + CH, :]
            for k in range(L):
                acc = jnp.zeros((CH, TB), jnp.float32)
                acc_b = jnp.zeros((CH, TB), BDT)
                for p in range(L):
                    acc = acc + W[k][p] * tmp_l[p][:]
                    acc_b = jnp.where(W[k][p] > 0.5, tmp_b[p][:], acc_b)
                llr[k][c0 : c0 + CH, :] = jnp.where(
                    is_frozen, tmp_l[k][:], acc
                )
                bits[k][c0 : c0 + CH, :] = jnp.where(
                    is_frozen, tmp_b[k][:], acc_b
                )
        new_pm = jnp.concatenate(
            [jnp.sum(onehot[k] * cand, axis=0, keepdims=True)
             for k in range(L)], axis=0)
        new_ub = jnp.concatenate(
            [jnp.sum(onehot[k][L:, :], axis=0, keepdims=True)
             for k in range(L)], axis=0)
        pm_ref[:] = jnp.where(is_frozen, pm + pen0, new_pm)
        ub_ref[:] = jnp.where(is_frozen, jnp.zeros((L, TB), jnp.float32),
                              new_ub)

        # ---- masked partial-sum combine: chain always runs to the top,
        # writing only the t1-th slot; the full-size chain value (the
        # codeword) lands in the output block at the last bit
        t1 = jnp.minimum(_ntz32(j + 1), n)
        for p in range(L):
            v = ub_ref[p : p + 1, :].astype(BDT)
            for i in range(n):
                lo, hi = slot(i)
                old = bits[p][lo:hi, :]
                bits[p][lo:hi, :] = jnp.where(t1 == i, v[: hi - lo, :], old)
                v = jnp.concatenate([bxor(old, v), v], axis=0)
            u_out_ref[p, :, :] = jnp.where(
                t1 == n, v.astype(jnp.int8), u_out_ref[p, :, :]
            )
        return carry

    lax.fori_loop(0, N, body, jnp.int32(0))

    # epilogue: decisions u = encode(x) once per path (polar involution)
    for p in range(L):
        x = u_out_ref[p, :, :].astype(jnp.float32)
        u_out_ref[p, :, :] = _encode_sub(x, n, TB).astype(jnp.int8)
    pm_out_ref[:] = pm_ref[:]


def _scl_kernel_branchy(ch_ref, fr_ref, u_out_ref, pm_out_ref, llr, bits,
                tmp, pm_ref, ub_ref, *, n, N, TB, L, CH):
    """Refs (frames in lanes):
      ch_ref   [N, TB] f32 (input block, pre-transposed)
      fr_ref   [1, N] i32 in SMEM (frozen mask)
      u_out    [L, N, TB] i8 / pm_out [L, TB] f32 (output blocks)
      llr, bits: lists of L scratch refs [N, TB] f32 (slot i = rows
                 2^i-1..2^{i+1}-1; top row is padding)
      tmp      list of L scratch refs [CH, TB] f32 — selection copies run in
               CH-sublane chunks so the double buffer is chunk-sized instead
               of a second full state (VMEM budget)
      pm_ref   [L, TB] f32; ub_ref [L, TB] f32
    """
    zero_col = jnp.zeros((N, TB), jnp.float32)
    for p in range(L):
        llr[p][:] = zero_col
        bits[p][:] = zero_col
    row = jax.lax.broadcasted_iota(jnp.int32, (L, TB), dimension=0)
    pm_ref[:] = jnp.where(row == 0, 0.0, BIG)

    def slot(i):
        return (1 << i) - 1, (2 << i) - 1

    def llr_phase(tt):
        """g at stage tt (if < n) then f chain down to 0, for every path."""
        if tt < n:
            w = 1 << tt
            lo, hi = slot(tt)
            slo, shi = slot(tt + 1)
            for p in range(L):
                if tt + 1 == n:
                    up, dn = ch_ref[:w, :], ch_ref[w : 2 * w, :]
                else:
                    src = llr[p][slo:shi, :]
                    up, dn = src[:w, :], src[w:, :]
                pb = bits[p][lo:hi, :]
                llr[p][lo:hi, :] = dn + (1.0 - 2.0 * pb) * up
        for i in range(tt - 1, -1, -1):
            w = 1 << i
            lo, hi = slot(i)
            slo, shi = slot(i + 1)
            for p in range(L):
                if i + 1 == n:
                    up, dn = ch_ref[:w, :], ch_ref[w : 2 * w, :]
                else:
                    src = llr[p][slo:shi, :]
                    up, dn = src[:w, :], src[w:, :]
                llr[p][lo:hi, :] = chk(up, dn)

    def bit_phase(tt1):
        """combine v' = [slot ^ v, v] upward tt1 stages, store at slot tt1.
        At tt1 == n (the last bit) the combined v IS the codeword x; recover
        the decisions u = encode(x) and emit them."""
        for p in range(L):
            v = ub_ref[p : p + 1, :]
            for i in range(min(tt1, n)):
                lo, hi = slot(i)
                s = bits[p][lo:hi, :]
                v = jnp.concatenate([_fxor(s, v), v], axis=0)
            if tt1 < n:
                lo, hi = slot(tt1)
                bits[p][lo:hi, :] = v
            else:
                u = _encode_sub(v, n, TB)
                u_out_ref[p, :, :] = u.astype(jnp.int8)

    def body(j, carry):
        t = _ntz32(j | N)
        for tt in range(n + 1):
            @pl.when(t == tt)
            def _(tt=tt):
                llr_phase(tt)

        # l0 [L, TB], penalties
        l0 = jnp.concatenate([llr[p][0:1, :] for p in range(L)], axis=0)
        absl = jnp.abs(l0)
        base = lut_correction(absl)
        pen0 = base + jnp.where(l0 < 0, absl, 0.0)
        pen1 = base + jnp.where(l0 > 0, absl, 0.0)
        pm = pm_ref[:]

        is_frozen = fr_ref[0, j] == 1

        @pl.when(is_frozen)
        def _():
            pm_ref[:] = pm + pen0
            ub_ref[:] = jnp.zeros((L, TB), jnp.float32)

        @pl.when(jnp.logical_not(is_frozen))
        def _():
            cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)  # [2L, TB]
            rows = jax.lax.broadcasted_iota(jnp.int32, (2 * L, TB), 0)
            rank = jnp.zeros((2 * L, TB), jnp.int32)
            for i in range(2 * L):
                ci = cand[i : i + 1, :]
                less = (cand < ci) | ((cand == ci) & (rows < i))
                ri = jnp.sum(less.astype(jnp.int32), axis=0, keepdims=True)
                rank = jnp.where(rows == i, ri, rank)
            onehot = [(rank == k).astype(jnp.float32) for k in range(L)]
            # per-(dest, src) copy weights [1, TB]
            W = [
                [onehot[k][p : p + 1, :] + onehot[k][L + p : L + p + 1, :]
                 for p in range(L)]
                for k in range(L)
            ]
            # chunked select-sum path copy (tmp holds one chunk of all paths)
            for arr in (llr, bits):
                for c0 in range(0, N, CH):
                    for p in range(L):
                        tmp[p][:] = arr[p][c0 : c0 + CH, :]
                    for k in range(L):
                        acc = jnp.zeros((CH, TB), jnp.float32)
                        for p in range(L):
                            acc = acc + W[k][p] * tmp[p][:]
                        arr[k][c0 : c0 + CH, :] = acc
            new_pm = [
                jnp.sum(onehot[k] * cand, axis=0, keepdims=True)
                for k in range(L)
            ]
            new_ub = [
                jnp.sum(onehot[k][L:, :], axis=0, keepdims=True)
                for k in range(L)
            ]
            pm_ref[:] = jnp.concatenate(new_pm, axis=0)
            ub_ref[:] = jnp.concatenate(new_ub, axis=0)

        t1 = jnp.minimum(_ntz32(j + 1), n)
        for tt1 in range(n + 1):
            @pl.when(t1 == tt1)
            def _(tt1=tt1):
                bit_phase(tt1)
        return carry

    lax.fori_loop(0, N, body, jnp.int32(0))
    pm_out_ref[:] = pm_ref[:]



@functools.partial(
    jax.jit, static_argnames=("list_size", "tile", "interpret")
)
def scl_decode_pallas(
    ch_llr,
    frozen,
    list_size: int = 8,
    tile: int = 0,
    interpret: bool = False,
):
    """Pallas SCL decode.  ch_llr [B, N] f32, frozen [N] bool.
    Returns (u_all [B, L, N] int8, PM [B, L] f32) — same contract as
    models/scl.scl_decode(return_all=True)."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    L = list_size
    if tile == 0:
        # lane-dim blocks must be 128-divisible (or the whole array)
        tile = B if B <= 128 else 128
    assert B % tile == 0, (B, tile)
    # selection-copy chunk (tmp = L x [CH, tile]): measured on v5e, CH=128
    # beats CH=512 (bigger chunks add VMEM pressure without shortening the
    # issue-bound critical path)
    CH = min(128, N)
    # kernel variant selection, measured on v5e at B=256:
    #   masked single-pass + f32 bits:  9062 fps at N=128 L=8 (best)
    #   branchy pl.when chains + f32:   3167 fps at N=1024 L=8 (fits; best)
    #   masked + int8 bits:             2873 fps at N=1024 L=8 (fits)
    # the masked variant with f32 bits exceeds the 16 MB scoped-vmem limit
    # above L*N = 4096, and narrow bits dtypes lose more to relayouts than
    # masking saves — so use masked+f32 when it fits, else branchy+f32
    use_masked = L * N <= 4096
    BDT = jnp.float32

    fr_row = jnp.asarray(frozen, jnp.int32)[None, :]
    ch_t = ch_llr.T  # [N, B]

    n_tmp = 2 * L if use_masked else L

    def wrapped(ch_ref, fr_ref, u_out_ref, pm_out_ref, *scr):
        llr_g = list(scr[:L])
        bits_g = list(scr[L : 2 * L])
        tmp_g = list(scr[2 * L : 2 * L + n_tmp])
        if use_masked:
            _scl_kernel(
                ch_ref, fr_ref, u_out_ref, pm_out_ref, llr_g, bits_g, tmp_g,
                scr[2 * L + n_tmp], scr[2 * L + n_tmp + 1],
                n=n, N=N, TB=tile, L=L, CH=CH, BDT=BDT,
            )
        else:
            _scl_kernel_branchy(
                ch_ref, fr_ref, u_out_ref, pm_out_ref, llr_g, bits_g, tmp_g,
                scr[2 * L + n_tmp], scr[2 * L + n_tmp + 1],
                n=n, N=N, TB=tile, L=L, CH=CH,
            )

    u_all_t, PM_t = pl.pallas_call(
        wrapped,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((N, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, N, tile), lambda g: (0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, N, B), jnp.int8),
            jax.ShapeDtypeStruct((L, B), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((N, tile), jnp.float32) for _ in range(L)]  # llr
            + [pltpu.VMEM((N, tile), BDT) for _ in range(L)]  # bits
            + [pltpu.VMEM((CH, tile), jnp.float32) for _ in range(n_tmp)]
            + [
                pltpu.VMEM((L, tile), jnp.float32),  # pm
                pltpu.VMEM((L, tile), jnp.float32),  # ub
            ]
        ),
        interpret=interpret,
    )(ch_t, fr_row)
    return jnp.transpose(u_all_t, (2, 0, 1)), PM_t.T
