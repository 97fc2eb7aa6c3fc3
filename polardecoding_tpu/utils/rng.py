"""Random-number generation: throughput mode and exact-parity mode.

Throughput mode (default): counter-based `jax.random` (threefry).  Every frame
derives its own key from (base seed, frame index), so noise is a pure function of
the frame index — reproducible across batch sizes, shardings and hosts
(SURVEY §2.5 / §5).

Exact-parity ("golden") mode: a faithful port of the reference's RNG so decoded
frames can be compared bit-for-bit with the C programs at matched seeds:
  - Ranq1: 64-bit xorshift-multiply uniform PRNG, Numerical-Recipes constants
    (ref: SC_128.c:235-250);
  - normal(): Marsaglia polar method producing two N(0, sigma^2) samples per
    call, including the unit-circle rejection loop (ref: SC_128.c:252-267);
  - the channel consumes samples pairwise: one normal() call per two codeword
    positions (ref: SC_128.c:192-202).
The golden path runs on host (sequential by construction — a global RNG stream
with a rejection loop cannot be parallelized without changing its output).
"""
from __future__ import annotations

import math

import numpy as np

_RANQ1_XOR = 4101842887655102017
_RANQ1_MUL = 2685821657736338717
_RANQ1_SCALE = 5.42101086242752217e-20
_U64 = (1 << 64) - 1


class Ranq1:
    """Exact port of the reference's Ranq1 xorshift-multiply PRNG."""

    def __init__(self, seed: int):
        v = (seed ^ _RANQ1_XOR) & _U64
        v ^= v >> 21
        v = (v ^ (v << 35)) & _U64
        v ^= v >> 4
        self._v = (v * _RANQ1_MUL) & _U64

    def next_u64(self) -> int:
        v = self._v
        v ^= v >> 21
        v = (v ^ (v << 35)) & _U64
        v ^= v >> 4
        self._v = v
        return (v * _RANQ1_MUL) & _U64

    def uniform(self) -> float:
        """Uniform in [0, 1): u64 * 5.42101086242752217e-20.

        In the C code `RANV * 2685821657736338717LL * 5.42...E-20` the integer
        product wraps mod 2^64 as unsigned and is then converted (unsigned) to
        double before the final scale.
        """
        return self.next_u64() * _RANQ1_SCALE


class MarsagliaNormal:
    """Exact port of normal(): two sigma-scaled Gaussians per call via the polar
    method with rejection (ref: SC_128.c:252-267)."""

    def __init__(self, seed: int):
        self.rng = Ranq1(seed)

    def pair(self, sigma: float) -> tuple[float, float]:
        while True:
            x1 = 2.0 * self.rng.uniform() - 1.0
            x2 = 2.0 * self.rng.uniform() - 1.0
            s = x1 * x1 + x2 * x2
            if s < 1.0:
                break
        f = math.sqrt(-2.0 * math.log(s) / s)
        return sigma * x1 * f, sigma * x2 * f


def golden_noise(seed: int, num_frames: int, N: int, sigma: float) -> np.ndarray:
    """The exact noise array the C reference adds to `num_frames` consecutive
    frames: one normal() call per two positions, n1 then n2 (SC_128.c:192-202).

    Note: the golden stream is shared across frames (one global RNG), so noise
    for frame f depends on all earlier frames — this mode exists solely for
    frame-for-frame parity tests against the C programs.
    """
    gen = MarsagliaNormal(seed)
    out = np.empty((num_frames, N), dtype=np.float64)
    for f in range(num_frames):
        for i in range(0, N, 2):
            n1, n2 = gen.pair(sigma)
            out[f, i] = n1
            if i + 1 < N:
                out[f, i + 1] = n2
    return out
