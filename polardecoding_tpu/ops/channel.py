"""BPSK modulation + AWGN channel + channel LLR, fused and batched.

Reference semantics (SC_128.c:164-167, 192-202, 416-420):
  - sigma = 10^(-EbN0_dB / 20)
  - BPSK maps bit 0 -> +1, bit 1 -> -1
  - y = s + n,  n ~ N(0, sigma^2)
  - channel LLR  L_ch = 2 y / sigma^2

Throughput mode derives per-frame noise from counter-based keys (a pure function
of (seed, frame index)), so results are independent of batch size and sharding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigma_from_ebn0_db(ebn0_db) -> jnp.ndarray:
    return 10.0 ** (jnp.asarray(ebn0_db) / -20.0)


def bpsk(x):
    """0 -> +1, 1 -> -1."""
    return 1.0 - 2.0 * x.astype(jnp.float32)


def awgn_llr(x, frame_keys, sigma, dtype=jnp.float32):
    """Modulate, add noise, return channel LLRs 2y/sigma^2.

    x: [B, N] bits; frame_keys: [B] jax PRNG keys (one per frame); sigma is a
    scalar or a per-frame [B] vector — the latter folds an SNR sweep into the
    batch dimension (SURVEY §2.5 "SNR-sweep parallelism").
    """
    noise = jax.vmap(lambda k, shape=x.shape[1:]: jax.random.normal(k, shape, dtype))(
        frame_keys
    )
    sigma = jnp.asarray(sigma, dtype)
    if sigma.ndim == 1:
        sigma = sigma[:, None]
    y = bpsk(x).astype(dtype) + sigma * noise
    return 2.0 * y / (sigma * sigma)


def frame_keys(seed_key, frame_index):
    """Per-frame keys: fold the global frame index into the sweep-point key."""
    return jax.vmap(lambda i: jax.random.fold_in(seed_key, i))(frame_index)


def llr_from_y(y, sigma):
    """Channel LLR for externally supplied received samples (golden mode)."""
    return 2.0 * y / (sigma * sigma)
