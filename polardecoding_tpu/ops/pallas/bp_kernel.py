"""Pallas TPU kernel for the BP decoder's flooding sweeps — the framework's
hottest loop (SURVEY §3.1: 100 iters x 2 sweeps x n stages x N lanes of CHK).

Why a kernel: the jnp BP engine (models/bp.py) is a chain of elementwise ops
on [B, n+1, N] arrays; XLA fuses within a stage but streams the message state
through HBM every stage of every iteration (~2 n x 100 array passes).  Here a
tile of TB frames keeps its entire message state [n+1, TB, N] in VMEM scratch
for all iterations: HBM traffic collapses to one [TB, N] read (channel LLRs)
plus one [TB, N] write (decisions) per frame — the speed-of-light minimum —
and every CHK runs on the VPU over [TB, N/2] register tiles.

Semantics identical to models/bp.bp_decode (ref: BP_128.c:334-389):
Gauss-Seidel R-sweep then L-sweep per iteration, table-corrected min-sum CHK
(or exact SPA), frozen R = 999, decision sign(L0 + R0).

Grid: one program per frame tile; batch must be a multiple of the tile.
Stage-i butterfly halves are reshape views at stride 2^i; for 2^i < 128 these
are intra-lane selects Mosaic lowers to register shuffles, for >= 128 they are
lane-slab moves.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk, chk_exact


def _halves(x, i):
    TB, N = x.shape
    d = 1 << i
    v = x.reshape(TB, N // (2 * d), 2, d)
    return v[:, :, 0, :].reshape(TB, N // 2), v[:, :, 1, :].reshape(TB, N // 2)


def _merge(up, lo, i, TB, N):
    d = 1 << i
    u = up.reshape(TB, N // (2 * d), 1, d)
    l = lo.reshape(TB, N // (2 * d), 1, d)
    return jnp.concatenate([u, l], axis=2).reshape(TB, N)


def _bp_kernel(ch_ref, fr_ref, out_ref, Ls, Rs, *, n, N, TB, iters, chk_fn):
    """Ls, Rs: VMEM scratch [n+1, TB, N].  fr_ref: [1, N] frozen R row."""
    ch = ch_ref[:]  # [TB, N]
    Ls[n][:] = ch
    Rs[0][:] = jnp.broadcast_to(fr_ref[:], (TB, N))
    for i in range(n):
        Ls[i][:] = jnp.zeros((TB, N), ch.dtype)
        Rs[i + 1][:] = jnp.zeros((TB, N), ch.dtype)

    def body(_, carry):
        for i in range(n):
            ru, rd = _halves(Rs[i][:], i)
            lu, ld = _halves(Ls[i + 1][:], i)
            new_u = chk_fn(ru, ld + rd)
            new_d = rd + chk_fn(ru, lu)
            Rs[i + 1][:] = _merge(new_u, new_d, i, TB, N)
        for i in range(n - 1, -1, -1):
            ru, rd = _halves(Rs[i][:], i)
            lu, ld = _halves(Ls[i + 1][:], i)
            new_u = chk_fn(lu, ld + rd)
            new_d = ld + chk_fn(ru, lu)
            Ls[i][:] = _merge(new_u, new_d, i, TB, N)
        return carry

    lax.fori_loop(0, iters, body, 0)
    soft = Ls[0][:] + Rs[0][:]
    frozen = fr_ref[:] > 0.0  # frozen rows carry R = 999
    u = jnp.where(jnp.broadcast_to(frozen, (TB, N)), jnp.int8(0),
                  (soft < 0).astype(jnp.int8))
    out_ref[:] = u


@functools.partial(
    jax.jit, static_argnames=("iters", "flavor", "tile", "interpret")
)
def bp_decode_pallas(
    ch_llr,
    frozen,
    iters: int = 100,
    flavor: str = "minsum_lut",
    tile: int = 0,
    interpret: bool = False,
):
    """Pallas BP decode.  ch_llr: [B, N] f32; frozen: [N] bool.
    Returns u_hat [B, N] int8.  B must be a multiple of the tile (default:
    auto-pick to fit ~2 x (n+1) x TB x N f32 of scratch in VMEM)."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    chk_fn = {"minsum_lut": chk, "spa": chk_exact}[flavor]
    if tile == 0:
        # 2 scratch arrays of (n+1) x TB x N f32 within ~8 MB; pick the
        # largest power-of-two divisor of B that fits (>= 8 sublanes)
        budget = 8 * 1024 * 1024
        cap = max(8, budget // (2 * (n + 1) * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 256) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)

    fr_row = jnp.where(frozen, jnp.asarray(999.0, ch_llr.dtype), 0.0)[None, :]

    kernel = functools.partial(
        _bp_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn
    )
    scratch = [pltpu.VMEM((tile, N), ch_llr.dtype) for _ in range(2 * (n + 1))]

    def wrapped(ch_ref, fr_ref, out_ref, *scratches):
        Ls = list(scratches[: n + 1])
        Rs = list(scratches[n + 1 :])
        kernel(ch_ref, fr_ref, out_ref, Ls, Rs)

    return pl.pallas_call(
        wrapped,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ch_llr, fr_row)
