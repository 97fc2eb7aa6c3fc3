"""Gaussian noise from raw PRNG bits — shared by the in-kernel Monte-Carlo
refill (ops/pallas/bp_kernel.py wave-MC kernel) and its jnp twin.

The production channel (ops/channel.awgn_llr) draws noise via
jax.random.normal = sqrt(2) * erfinv(uniform(-1, 1)) on threefry bits.  The
in-kernel MC engine generates bits inside the Mosaic kernel
(pltpu.prng_random_bits) or receives threefry bits as an input, and needs the
bits -> N(0,1) conversion expressed in ops Mosaic can lower (no erf_inv
primitive): the single-precision Giles polynomial below — the same
approximation family XLA's f32 erf_inv lowering uses — plus a strictly-open
uniform map.

Strict openness matters: u = 0 or |x| = 1 would give erfinv = +/-inf, and one
infinite LLR per ~2^23 samples poisons ~1e-4 of frames at N=1024 — exactly
the magnitude of the BLER being measured.  The "+ 0.5 then scale" map keeps
|x| <= 1 - 2^-23 (max |z| ~ 5.5 sigma, the same 23-bit granularity truncation
jax.random.normal has).

Every function here is pure jnp on values (no dynamic shapes, no gathers), so
the Pallas kernel and the jnp twin share these exact ops — bit-identical in
interpret mode, which is what tests/test_wave_mc.py pins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT2 = 1.4142135623730951


def uniform_pm1_from_bits(bits):
    """uint32/int32 random bits -> f32 uniform strictly inside (-1, 1).

    Uses bits 9..31 (23 bits).  uint32 inputs are bitcast to int32 first
    (Mosaic cannot lower uint32 -> float32 casts); the shift-then-mask form
    is arithmetic-shift safe, so both signednesses convert identically.
    """
    if bits.dtype != jnp.int32:
        bits = jax.lax.bitcast_convert_type(bits, jnp.int32)
    f = ((bits >> 9) & 0x7FFFFF).astype(jnp.float32)
    u = (f + 0.5) * jnp.float32(2.0 ** -23)  # (0, 1) strictly
    return 2.0 * u - 1.0


def erfinv_f32(x):
    """Single-precision inverse error function (Giles 2012 polynomial pair).

    |x| must be < 1.  Branchless: both polynomials evaluate, a select picks
    (Mosaic executes both sides of vector predicates anyway).
    """
    x = jnp.asarray(x, jnp.float32)
    w = -jnp.log((1.0 - x) * (1.0 + x))  # w >= 0 for |x| < 1
    wa = w - 2.5
    p = jnp.float32(2.81022636e-08)
    p = jnp.float32(3.43273939e-07) + p * wa
    p = jnp.float32(-3.5233877e-06) + p * wa
    p = jnp.float32(-4.39150654e-06) + p * wa
    p = jnp.float32(0.00021858087) + p * wa
    p = jnp.float32(-0.00125372503) + p * wa
    p = jnp.float32(-0.00417768164) + p * wa
    p = jnp.float32(0.246640727) + p * wa
    pa = jnp.float32(1.50140941) + p * wa
    wb = jnp.sqrt(w) - 3.0
    q = jnp.float32(-0.000200214257)
    q = jnp.float32(0.000100950558) + q * wb
    q = jnp.float32(0.00134934322) + q * wb
    q = jnp.float32(-0.00367342844) + q * wb
    q = jnp.float32(0.00573950773) + q * wb
    q = jnp.float32(-0.0076224613) + q * wb
    q = jnp.float32(0.00943887047) + q * wb
    q = jnp.float32(1.00167406) + q * wb
    pb = jnp.float32(2.83297682) + q * wb
    return jnp.where(w < 5.0, pa, pb) * x


def gaussian_from_bits(bits):
    """Random bits -> f32 standard normal (inverse-CDF, 23-bit granularity)."""
    return jnp.float32(_SQRT2) * erfinv_f32(uniform_pm1_from_bits(bits))


# ---------------------------------------------------------------------------
# Counter-based threefry2x32 — the production generator, expressed in ops
# Mosaic can lower (u32 add/xor/shift), so kernels can draw
# statistically-production-grade bits from explicit counters.
#
# Why not pltpu.prng_random_bits: its per-core generator seeded per
# (seed, step, tile) measured BLER-deficient at the 3.5 dB tail exactly like
# the rejected rbg experiment (results/hw_queue_r5/step8-9: wave-MC ratio
# 0.854, fixed-decoder channel ratio 0.893 vs threefry) — sequentially
# seeded hardware streams are not a substitute for a counter-based hash.
# Verified bit-exact against jax._src.prng.threefry_2x32
# (tests/test_wave_mc.py::test_threefry2x32_matches_jax).

_TF_ROT0 = (13, 15, 26, 6)
_TF_ROT1 = (17, 29, 16, 24)
_TF_PARITY = 0x1BD11BDA


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, x0, x1):
    """One threefry-2x32 block: keys (k0, k1), counter words (x0, x1) ->
    two output words.  All inputs uint32 (arrays broadcast elementwise)."""
    u32 = jnp.uint32
    k0 = jnp.asarray(k0, u32)
    k1 = jnp.asarray(k1, u32)
    x0 = jnp.asarray(x0, u32)
    x1 = jnp.asarray(x1, u32)
    ks2 = k0 ^ k1 ^ u32(_TF_PARITY)
    keys = (k0, k1, ks2)
    x0 = x0 + k0
    x1 = x1 + k1
    for r in range(5):
        rots = _TF_ROT0 if r % 2 == 0 else _TF_ROT1
        for rot in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, rot)
            x1 = x0 ^ x1
        x0 = x0 + keys[(r + 1) % 3]
        x1 = x1 + keys[(r + 2) % 3] + u32(r + 1)
    return x0, x1
