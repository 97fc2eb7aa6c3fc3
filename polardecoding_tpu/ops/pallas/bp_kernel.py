"""Pallas TPU kernel for the BP decoder's flooding sweeps — the framework's
hottest loop (SURVEY §3.1: 100 iters x 2 sweeps x n stages x N lanes of CHK).

Why a kernel: the jnp BP engine (models/bp.py) is a chain of elementwise ops
on [B, n+1, N] arrays; XLA fuses within a stage but streams the message state
through HBM every stage of every iteration (~2 n x 100 array passes).  Here a
tile of TB frames keeps its entire message state [n+1, TB, N] in VMEM scratch
for all iterations: HBM traffic collapses to one [TB, N] read (channel LLRs)
plus one [TB, N] write (decisions) per frame — the speed-of-light minimum —
and every CHK runs on the VPU over [TB, N] register tiles.

Butterfly exchange without reshapes: Mosaic cannot lower the [TB, G, 2, d]
strided reshape views the jnp engine uses, so the stage-i partner exchange is
expressed elementwise with lane rotations:

    P(x) = where(upper_lane, roll(x, -d), roll(x, +d))      (partner swap)
    S    = L[i+1] + R[i]                                     (var-node sums)
    E    = CHK(R[i], L[i+1])                                 (shared check)
    R'[i+1] = where(upper, CHK(R[i],   P(S)), R[i]   + P(E))
    L'[i]   = where(upper, CHK(L[i+1], P(S)), L[i+1] + P(E))

which is algebraically identical to the reference's four butterfly equations
(BP_128.c:357-377): at an upper lane u, P(S)[u] = L[i+1][u+d] + R[i][u+d];
at a lower lane l, P(E)[l] = CHK(R[i][l-d], L[i+1][l-d]).  The cyclic roll
wrap-around only lands on lanes masked out by the select.

Semantics identical to models/bp.bp_decode: Gauss-Seidel R-sweep then L-sweep
per iteration, table-corrected min-sum CHK (or exact SPA), frozen R = 999,
decision sign(L0 + R0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk, chk_exact


def _upper_mask(i, TB, N):
    """[TB, N] bool: lane's stage-i butterfly role (bit i of lane == 0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N), dimension=1)
    return (lane & (1 << i)) == 0


def _pswap(x, i, up):
    """Partner exchange at distance d = 2^i along the lane axis."""
    d = 1 << i
    N = x.shape[1]
    fwd = pltpu.roll(x, N - d, axis=1)  # lane p reads p + d (cyclic)
    bwd = pltpu.roll(x, d, axis=1)  # lane p reads p - d
    return jnp.where(up, fwd, bwd)


def _bp_kernel(ch_ref, fr_ref, out_ref, Ls, Rs, *, n, N, TB, iters, chk_fn,
               early_stop):
    """Ls, Rs: VMEM scratch refs, n+1 each of [TB, N].  fr_ref: [1, N]."""
    ch = ch_ref[:]
    Ls[n][:] = ch
    Rs[0][:] = jnp.broadcast_to(fr_ref[:], (TB, N))
    zero = jnp.zeros((TB, N), ch.dtype)
    for i in range(n):
        Ls[i][:] = zero
        Rs[i + 1][:] = zero

    ups = [_upper_mask(i, TB, N) for i in range(n)]
    frozen = jnp.broadcast_to(fr_ref[:] > 0.0, (TB, N))

    def one_iteration():
        for i in range(n):
            R, L = Rs[i][:], Ls[i + 1][:]
            S = _pswap(L + R, i, ups[i])
            E = _pswap(chk_fn(R, L), i, ups[i])
            Rs[i + 1][:] = jnp.where(ups[i], chk_fn(R, S), R + E)
        for i in range(n - 1, -1, -1):
            R, L = Rs[i][:], Ls[i + 1][:]
            S = _pswap(L + R, i, ups[i])
            E = _pswap(chk_fn(R, L), i, ups[i])
            Ls[i][:] = jnp.where(ups[i], chk_fn(L, S), L + E)

    if early_stop:
        # G-matrix stopping rule (extension — the reference always runs
        # iterMax sweeps): exit once, for every frame in the tile, the
        # re-encoded decision word equals the POSTERIOR hard decision at the
        # channel stage, sign(L[n] + R[n]) — i.e. the decoder has settled on
        # a codeword consistent with its own channel-side beliefs.
        def wcond(c):
            it, done = c
            return jnp.logical_and(it < iters, jnp.logical_not(done))

        def wbody(c):
            it, _ = c
            one_iteration()
            u = jnp.where(frozen, 0.0,
                          (Ls[0][:] + Rs[0][:] < 0).astype(ch.dtype))
            x = u
            for i in range(n):
                x = jnp.where(ups[i], _fxor01(x, _pswap(x, i, ups[i])), x)
            post_hard = (ch + Rs[n][:]) < 0.0
            done = jnp.all((x > 0.5) == post_hard)
            return it + 1, done

        lax.while_loop(wcond, wbody, (jnp.int32(0), jnp.bool_(False)))
    else:
        lax.fori_loop(0, iters, lambda _, c: (one_iteration(), c)[1], 0)

    soft = Ls[0][:] + Rs[0][:]
    out_ref[:] = jnp.where(frozen, jnp.int8(0), (soft < 0).astype(jnp.int8))


def _fxor01(a, b):
    """xor of 0/1 floats."""
    return jnp.abs(a - b)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "flavor", "tile", "interpret", "early_stop"),
)
def bp_decode_pallas(
    ch_llr,
    frozen,
    iters: int = 100,
    flavor: str = "minsum_lut",
    tile: int = 0,
    interpret: bool = False,
    early_stop: bool = False,
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
        _bp_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn,
        early_stop=early_stop,
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
