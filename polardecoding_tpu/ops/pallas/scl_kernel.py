"""Pallas TPU kernel for whole-frame SCL decoding — list state VMEM-resident.

Why: the jnp SCL engine (models/scl.py) runs the N-step serial bit loop as a
`lax.fori_loop` whose carry is the full per-path state; measured on v5e, XLA
copies the carried arrays through HBM every iteration (~43 us/iter for even a
trivial one-element update on a [1024, 8, 1023] carry, 3x that with a switch
in the body), which caps the engine at ~1.5k frames/s regardless of gathers.
Here the entire decode runs inside one kernel with every per-path array in
mutable VMEM scratch: per-bit updates touch only the slots they name, and the
only HBM traffic is the channel-LLR read and the decoded-path write.

Semantics match models/scl.py (and therefore the C reference, SCL_1024.c —
see the golden-parity tests): compact O(N) slot schedule per path, LLR path
metrics with the PHI table, and 2L -> L survivor selection keeping the L
smallest candidates with ties broken by candidate index (cand layout
[PM + PHI(l,0) | PM + PHI(l,1)], the reference's scan order).

Mosaic-dictated design notes:
  - control flow is predicated: `pl.when(t == tt)` chains instead of
    lax.switch, so branches mutate scratch refs directly;
  - selection avoids per-sublane gathers: candidate ranks come from an
    all-pairs comparison (rank = #{smaller} + #{equal with lower index}),
    and the path copy is a select-sum  new[k] = sum_p onehot[k][p] * old[p]
    (L^2 fused multiply-adds over VMEM, cheaper than any gather here);
  - bits are stored as f32 0/1 (xor = |a - b|) to stay in native VPU tiles;
  - the frozen mask lives in SMEM for scalar dynamic indexing;
  - Mosaic rejects dynamic-index stores, so NO per-bit decision history is
    kept: at the last bit the partial-sum combine yields each path's full
    codeword x, and since the polar transform is an involution the decision
    vector is recovered as u = encode(x) (roll-based butterfly, like
    bp_kernel.py) — path copies of `bits` keep per-path x consistent.
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


def _upper_mask(i, TB, N):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N), dimension=1)
    return (lane & (1 << i)) == 0


def _pswap(x, i, up):
    d = 1 << i
    N = x.shape[1]
    fwd = pltpu.roll(x, N - d, axis=1)
    bwd = pltpu.roll(x, d, axis=1)
    return jnp.where(up, fwd, bwd)


def _encode_roll(x, n, TB, N):
    """Lee butterfly transform on 0/1 floats (upper ^= lower), reshape-free:
    partner exchange by lane rolls (see bp_kernel.py docstring)."""
    for i in range(n):
        up = _upper_mask(i, TB, N)
        x = jnp.where(up, _fxor(x, _pswap(x, i, up)), x)
    return x


def _scl_kernel(ch_ref, fr_ref, u_out_ref, pm_out_ref, llr, bits,
                tmp_l, tmp_b, pm_ref, ub_ref, *, n, N, TB, L):
    """Refs:
      ch_ref   [TB, N] f32 (input block)
      fr_ref   [1, N] i32 in SMEM (frozen mask)
      u_out    [TB, L, N] i8 / pm_out [TB, L] f32 (output blocks)
      llr, bits, tmp_l, tmp_b: lists of L scratch refs [TB, N] f32
      pm_ref   [TB, L] f32 scratch;  ub_ref [TB, L] f32 scratch
    """
    ch = ch_ref[:]
    zero_row = jnp.zeros((TB, N), jnp.float32)
    for p in range(L):
        llr[p][:] = zero_row
        bits[p][:] = zero_row
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L), dimension=1)
    pm_ref[:] = jnp.where(lane == 0, 0.0, BIG)

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
                    up, dn = ch[:, :w], ch[:, w : 2 * w]
                else:
                    src = llr[p][:, slo:shi]
                    up, dn = src[:, :w], src[:, w:]
                pb = bits[p][:, lo:hi]
                llr[p][:, lo:hi] = dn + (1.0 - 2.0 * pb) * up
        for i in range(tt - 1, -1, -1):
            w = 1 << i
            lo, hi = slot(i)
            slo, shi = slot(i + 1)
            for p in range(L):
                if i + 1 == n:
                    up, dn = ch[:, :w], ch[:, w : 2 * w]
                else:
                    src = llr[p][:, slo:shi]
                    up, dn = src[:, :w], src[:, w:]
                llr[p][:, lo:hi] = chk(up, dn)

    def bit_phase(tt1):
        """combine v' = [slot ^ v, v] upward tt1 stages, store at slot tt1.
        At tt1 == n (the last bit) the combined v IS the codeword x; recover
        the decision vector u = encode(x) and emit it."""
        for p in range(L):
            v = ub_ref[:, p : p + 1]
            for i in range(min(tt1, n)):
                lo, hi = slot(i)
                s = bits[p][:, lo:hi]
                v = jnp.concatenate([_fxor(s, v), v], axis=1)
            if tt1 < n:
                lo, hi = slot(tt1)
                bits[p][:, lo:hi] = v
            else:
                u = _encode_roll(v, n, TB, N)
                u_out_ref[:, p, :] = u.astype(jnp.int8)

    def body(j, carry):
        t = _ntz32(j | N)
        for tt in range(n + 1):
            @pl.when(t == tt)
            def _(tt=tt):
                llr_phase(tt)

        # l0 [TB, L], penalties
        l0 = jnp.concatenate([llr[p][:, 0:1] for p in range(L)], axis=1)
        absl = jnp.abs(l0)
        base = lut_correction(absl)
        pen0 = base + jnp.where(l0 < 0, absl, 0.0)
        pen1 = base + jnp.where(l0 > 0, absl, 0.0)
        pm = pm_ref[:]

        is_frozen = fr_ref[0, j] == 1

        @pl.when(is_frozen)
        def _():
            pm_ref[:] = pm + pen0
            ub_ref[:] = jnp.zeros((TB, L), jnp.float32)

        @pl.when(jnp.logical_not(is_frozen))
        def _():
            cand = jnp.concatenate([pm + pen0, pm + pen1], axis=1)  # [TB, 2L]
            # rank by (value, index): all-pairs comparison
            rank = jnp.zeros((TB, 2 * L), jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * L), 1)
            for i in range(2 * L):
                ci = cand[:, i : i + 1]
                less = (cand < ci) | ((cand == ci) & (cols < i))
                ri = jnp.sum(less.astype(jnp.int32), axis=1, keepdims=True)
                rank = jnp.where(cols == i, ri, rank)
            onehot = []  # onehot[k][TB, 2L]: candidate landing in slot k
            for k in range(L):
                onehot.append((rank == k).astype(jnp.float32))
            # stash pre-selection state
            for p in range(L):
                tmp_l[p][:] = llr[p][:]
                tmp_b[p][:] = bits[p][:]
            new_pm = []
            new_ub = []
            for k in range(L):
                oh = onehot[k]
                new_pm.append(jnp.sum(oh * cand, axis=1, keepdims=True))
                new_ub.append(jnp.sum(oh[:, L:], axis=1, keepdims=True))
                acc_l = jnp.zeros((TB, N), jnp.float32)
                acc_b = jnp.zeros((TB, N), jnp.float32)
                for p in range(L):
                    w = oh[:, p : p + 1] + oh[:, L + p : L + p + 1]  # [TB, 1]
                    acc_l = acc_l + w * tmp_l[p][:]
                    acc_b = acc_b + w * tmp_b[p][:]
                llr[k][:] = acc_l
                bits[k][:] = acc_b
            pm_ref[:] = jnp.concatenate(new_pm, axis=1)
            ub_ref[:] = jnp.concatenate(new_ub, axis=1)

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
        # 4 f32 scratch arrays of L x [TB, N]; leave ~2x headroom for Mosaic
        # temporaries inside the 16 MB scoped-vmem limit
        budget = 6 * 1024 * 1024
        cap = max(8, budget // (4 * L * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 128) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)

    fr_row = jnp.asarray(frozen, jnp.int32)[None, :]

    def wrapped(ch_ref, fr_ref, u_out_ref, pm_out_ref, *scr):
        groups = [list(scr[i * L : (i + 1) * L]) for i in range(4)]
        _scl_kernel(
            ch_ref, fr_ref, u_out_ref, pm_out_ref, *groups,
            scr[4 * L], scr[4 * L + 1], n=n, N=N, TB=tile, L=L,
        )

    u_all, PM = pl.pallas_call(
        wrapped,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, L, N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, N), jnp.int8),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((tile, N), jnp.float32) for _ in range(L)]  # llr
            + [pltpu.VMEM((tile, N), jnp.float32) for _ in range(L)]  # bits
            + [pltpu.VMEM((tile, N), jnp.float32) for _ in range(L)]  # tmp_l
            + [pltpu.VMEM((tile, N), jnp.float32) for _ in range(L)]  # tmp_b
            + [
                pltpu.VMEM((tile, L), jnp.float32),  # pm
                pltpu.VMEM((tile, L), jnp.float32),  # ub
            ]
        ),
        interpret=interpret,
    )(ch_llr, fr_row)
    return u_all, PM
