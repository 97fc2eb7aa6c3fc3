"""In-kernel Monte-Carlo channel: (frame offsets, sigma) -> channel LLRs,
one small Pallas kernel — no XLA-side RNG, encode, or BPSK pass.

The refill work of a full-MC step (threefry bit generation + erfinv +
payload gather + GF(2) encode + BPSK/AWGN fusion) is the dominant non-decode
slice of both the SCL full-MC pipeline (~9 %, results/xprof_scl1024_r4) and
the fixed-iteration BP pipeline.  Payloads depend only on the PN window
offset m in {0..62} (SC_128.c:179-181), so a [128, N] table of PRE-ENCODED
codewords (models/bp.mc_tables) plus a one-hot(m) @ table MXU matmul
replaces payload+encode, and the noise comes from pltpu.prng_random_bits
through the shared erfinv construction (ops/noise.py) — the same design the
v3 BP wave kernel uses in-kernel (bp_kernel._bp_wave_mc_kernel), packaged
standalone so ANY decoder's pipeline can consume it.

Determinism: the PRNG is seeded per (seed, step, tile), so LLRs are a pure
function of (seed, step, B, tile); payload identity remains a pure function
of the frame index via m.  Like the v3 wave engine this is an opt-in
qualified flavor (the bit stream differs from the production threefry
channel; BLER qualification in results/hw_queue_r5).

bits=None draws bits in-kernel (TPU); passing bits [B, N] uint32 is the
CPU-testable mode (tests pin it against the jnp twin below).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.noise import gaussian_from_bits, threefry2x32


def _mc_channel_kernel(m_ref, xtab_ref, sig_ref, seed_ref, bits_ref,
                       llr_ref, *, N, TB, gen_bits, bit_gen):
    f32 = jnp.float32
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 1).astype(f32)
    oh = (m_ref[:, :] == lane128).astype(f32)
    x = jax.lax.dot_general(oh, xtab_ref[:, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    if gen_bits and bit_gen == "tf32":
        # counter-based threefry2x32 on (step, global element index) with
        # the run key words — production-generator statistics (the hw
        # stream measured tail-deficient, results/hw_queue_r5/step9)
        # vector-broadcast before unsigned conversion (Mosaic bitcasts
        # need vector operands)
        u32 = jnp.uint32
        zi = jnp.zeros((TB, N), jnp.int32)
        k0 = (zi + seed_ref[0, 0]).astype(u32)
        k1 = (zi + seed_ref[0, 1]).astype(u32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TB, N), 0)
                + pl.program_id(0) * TB)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)
        c_lo = (rows * N + lanes).astype(u32)
        c_hi = (zi + seed_ref[0, 3]).astype(u32)
        bits, _ = threefry2x32(k0, k1, c_hi, c_lo)
    elif gen_bits:
        pltpu.prng_seed(seed_ref[0, 2],
                        seed_ref[0, 3] * jnp.int32(8192) + pl.program_id(0))
        bits = pltpu.prng_random_bits((TB, N))
    else:
        bits = bits_ref[:]
    z = gaussian_from_bits(bits)
    sigma = sig_ref[0, 0]
    inv_s = 1.0 / sigma
    # contraction-proof form (see bp_kernel): LLR = (2/s) * ((1-2x)/s + z)
    sgn = jnp.where(x > 0.5, -inv_s, inv_s)
    llr_ref[:] = (2.0 * inv_s) * (sgn + z)


@functools.partial(jax.jit, static_argnames=("tile", "gen_bits", "interpret",
                                             "bit_gen"))
def mc_channel_pallas(m, x_table, sigma, seeds, bits=None, tile: int = 0,
                      gen_bits: bool = True, interpret: bool = False,
                      bit_gen: str = "tf32"):
    """m [B] int32 PN offsets (0..62); x_table [128, N] f32 pre-encoded
    codewords; sigma f32; seeds [4] i32 (k0, k1, hw_seed, step).  Returns
    llr [B, N] f32."""
    B = m.shape[0]
    N = x_table.shape[1]
    if tile == 0:
        tile = 256
        while B % tile != 0 and tile > 8:
            tile //= 2
    assert B % tile == 0, (B, tile)
    m128 = jnp.broadcast_to(m.astype(jnp.float32)[:, None], (B, 128))
    if not gen_bits:
        assert bits is not None and bits.shape == (B, N), bits
    else:
        bits = jnp.zeros((8, N), jnp.int32)  # placeholder (unread)
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)
    seed_arr = jnp.asarray(seeds, jnp.int32).reshape(1, 4)
    bits_spec = (pl.BlockSpec((8, N), lambda g: (0, 0),
                              memory_space=pltpu.VMEM) if gen_bits else
                 pl.BlockSpec((tile, N), lambda g: (g, 0),
                              memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_mc_channel_kernel, N=N, TB=tile,
                          gen_bits=gen_bits, bit_gen=bit_gen),
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, N), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            bits_spec,
        ],
        out_specs=pl.BlockSpec((tile, N), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(m128, x_table, sig, seed_arr, bits)


def mc_channel_jnp(m, x_table, sigma, bits):
    """jnp twin (bit-identical to the kernel in interpret mode)."""
    x = x_table[m]
    z = gaussian_from_bits(bits)
    inv_s = 1.0 / jnp.asarray(sigma, jnp.float32)
    sgn = jnp.where(x > 0.5, -inv_s, inv_s)
    return (2.0 * inv_s) * (sgn + z)
