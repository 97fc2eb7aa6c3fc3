"""Native exact-parity engine (native/golden_ref.c) vs Python port + fixtures."""
import os

import numpy as np
import pytest

from polardecoding_tpu.utils import rng as pyrng
from polardecoding_tpu.utils.sequences import info_set

try:
    from polardecoding_tpu.native import NativeUnavailable, golden_mc, golden_noise

    golden_noise(1, 1, 8, 1.0)
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - no compiler in env
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no C compiler")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sc128_frames.txt")


def test_native_noise_matches_python_port():
    sigma = 10 ** (-1.5 / 20.0)
    a = golden_noise(2024, 6, 128, sigma)
    b = pyrng.golden_noise(2024, 6, 128, sigma)
    assert np.array_equal(a, b)


def test_native_sc_matches_reference_fixture():
    I = info_set(128, 64)
    _, _, bits = golden_mc(128, 64, I, 1024, 1.0, 8, decoder="sc")
    frames = {}
    for line in open(GOLDEN):
        p = line.split()
        if p[0] == "FRAME":
            frames.setdefault(int(p[1]), {})[p[2]] = p[3:]
    for f in range(8):
        want = np.array([int(v) for v in frames[f]["H"]], dtype=np.int8)[I]
        assert (bits[f] == want).all(), f"frame {f}"


def test_native_bp_bler_statistical():
    """4000 frames at 2.0 dB: BLER within a loose CI of the reference's
    0.1127 (BASELINE.md BP_128 table)."""
    I = info_set(128, 64)
    _, ebl, _ = golden_mc(
        128, 64, I, 1024, 2.0, 4000, decoder="bp", iters=100, return_bits=False
    )
    assert 0.09 < ebl / 4000 < 0.14


def test_native_sc_bler_statistical():
    """5000 frames at 3.0 dB: SC BLER near the reference's 0.02098."""
    I = info_set(128, 64)
    _, ebl, _ = golden_mc(128, 64, I, 1024, 3.0, 5000, decoder="sc",
                          return_bits=False)
    assert 0.012 < ebl / 5000 < 0.032


def _fixture_bits(name):
    frames = {}
    path = os.path.join(os.path.dirname(__file__), "golden", name)
    for line in open(path):
        p = line.split()
        if p[0] == "FRAME" and p[2] == "H":
            frames[int(p[1])] = np.array([int(v) for v in p[3:]], dtype=np.int8)
    return frames


def test_native_scl_matches_reference_fixture():
    from polardecoding_tpu.native import golden_mc_list

    I = info_set(128, 64)
    _, _, bits = golden_mc_list(128, 64, I, 1024, 1.0, 8, list_size=8)
    fr = _fixture_bits("scl_128_frames.txt")
    for f in range(8):
        assert (bits[f] == fr[f][I]).all(), f"frame {f}"


def test_native_cascl_matches_reference_fixture():
    from polardecoding_tpu.native import golden_mc_list
    from polardecoding_tpu.ops.crc import CRC6_EXPONENTS

    I = info_set(128, 64 + max(CRC6_EXPONENTS))
    _, _, bits = golden_mc_list(
        128, 64, I, 1024, 1.0, 8, list_size=8, crc_exponents=CRC6_EXPONENTS
    )
    fr = _fixture_bits("cascl_128_frames.txt")
    for f in range(8):
        assert (bits[f] == fr[f][I]).all(), f"frame {f}"


def test_native_scl_bler_statistical():
    from polardecoding_tpu.native import golden_mc_list

    I = info_set(128, 64)
    _, ebl, _ = golden_mc_list(128, 64, I, 42, 2.0, 4000, list_size=8,
                               return_bits=False)
    assert 0.04 < ebl / 4000 < 0.075  # reference 3-seed avg 0.0552
