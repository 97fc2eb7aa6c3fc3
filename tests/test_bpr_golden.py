"""BPr instrumentation vs the patched C reference (seed 1024, 300 frames,
2.0 dB): per-stage/per-checkpoint error table parity.

The fixture tests/golden/bpr_128_snr2.txt is BPr_128.c with SEED = 1024 and
exactly 300 frames at 2.0 dB.  Our engine consumes the identical Ranq1 noise
stream in float64; BP trajectories on non-converged frames are chaotic under
last-ulp FMA differences (see test_golden_parity), so the comparison allows a
small per-entry drift rather than demanding bit-exact counts.
"""
import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polardecoding_tpu.models.bp import bpr_decode
from polardecoding_tpu.utils.gf2 import dense_generator, encode_dense
from polardecoding_tpu.utils.pn import payload_bits_host
from polardecoding_tpu.utils.rng import golden_noise
from polardecoding_tpu.utils.sequences import frozen_mask, info_set

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bpr_128_snr2.txt")
N, K, FRAMES, SNR = 128, 64, 300, 2.0


def _parse():
    txt = open(GOLDEN).read()
    rows = re.findall(r"After\s+(\d+) iterations:\n([\d.\t]+)\n", txt)
    E = {int(it): np.array([float(v) for v in vals.split()]) for it, vals in rows}
    eb = int(re.search(r"error block = (\d+)", txt).group(1))
    return E, eb


def test_bpr_stage_errors_match_reference():
    E_ref, errblock_ref = _parse()
    sigma = 10.0 ** (-SNR / 20.0)
    I = info_set(N, K)
    frozen = frozen_mask(N, K)
    G = dense_generator(N)

    u = np.zeros((FRAMES, N), dtype=np.int8)
    for f in range(FRAMES):
        u[f, I] = payload_bits_host(f, K)
    x = encode_dense(u.reshape(-1, N), G).reshape(FRAMES, N)
    noise = golden_noise(1024, FRAMES, N, sigma)
    y = (1.0 - 2.0 * x.astype(np.float64)) + noise
    llr = 2.0 * y / sigma / sigma

    with jax.enable_x64(True):
        u_hat, E = bpr_decode(
            jnp.asarray(llr, jnp.float64), jnp.asarray(frozen),
            jnp.asarray(u), jnp.asarray(I), iters=90,
            checkpoints=(3, 6, 10, 20, 40, 80),
        )
    E = np.asarray(E, dtype=np.float64) / FRAMES
    u_hat = np.asarray(u_hat)

    for row, it in enumerate((3, 6, 10, 20, 40, 80)):
        np.testing.assert_allclose(
            E[row], E_ref[it], atol=0.2,
            err_msg=f"checkpoint {it}",
        )
    errblock = int((u_hat[:, I] != u[:, I]).any(axis=1).sum())
    assert abs(errblock - errblock_ref) <= 3
