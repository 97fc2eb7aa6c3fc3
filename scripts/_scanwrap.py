"""Shared A/B helper: defeat the ~24 ms/dispatch axon tunnel floor.

wall/call = max(~24 ms, device compute) (scripts/probe_floor3.py), so any
variant whose compute is below ~30 ms reads AT the floor and A/B deltas
compress to zero.  scan_jit wraps the measured scalar function in a
lax.scan of PD_SCANK repeats inside ONE jit: k x compute per dispatch,
one compile.  The input is coupled to the carry via `x + 0.0 * c` — for
floats 0*c is not foldable (c could be NaN/Inf), so XLA's loop-invariant
code motion cannot hoist the body and fake the measurement.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

SCANK = int(os.environ.get("PD_SCANK", "1"))


def scan_jit(fn):
    """fn: [B, N] f32 -> scalar.  Returns a jitted callable running fn
    SCANK times per dispatch (summed carry)."""
    if SCANK == 1:
        return jax.jit(fn)

    def run(x):
        def step(c, _):
            return c + jnp.float32(fn(x + 0.0 * c)), None

        s, _ = lax.scan(step, jnp.float32(0), None, length=SCANK)
        return s

    return jax.jit(run)
