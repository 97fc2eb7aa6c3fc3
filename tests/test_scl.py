"""SCL / CA-SCL: vectorized engine vs the graph-faithful oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from polardecoding_tpu.models.sc import sc_decode
from polardecoding_tpu.models.scl import scl_decode, cascl_decode, cascl_select
from polardecoding_tpu.ops.crc import (
    CRC6_EXPONENTS,
    check_matrix,
    crc_encode_multiplicative,
)
from polardecoding_tpu.ops.encode import polar_encode, scatter_info
from polardecoding_tpu.utils.sequences import frozen_mask, info_set

import reference_impl as ref


def _random_llrs(N, B, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, N)) * 3.0


@pytest.mark.parametrize("L", [2, 4, 8])
@pytest.mark.parametrize("N,K", [(8, 4), (16, 8), (32, 20)])
def test_scl_matches_oracle(N, K, L):
    frozen = frozen_mask(N, K)
    g = ref.Graph(N, "lee")
    llrs = _random_llrs(N, 6, seed=N * 10 + L)
    u_all, PM = scl_decode(jnp.asarray(llrs), jnp.asarray(frozen), list_size=L,
                           return_all=True)
    u_all, PM = np.asarray(u_all), np.asarray(PM)
    for b in range(llrs.shape[0]):
        outs, pm_ref = ref.scl_decode(g, llrs[b], frozen, L, return_state=True)
        # the engine's slot order differs from the reference's repacking order,
        # but the surviving (PM, path) multiset must match
        ours = sorted(range(L), key=lambda k: PM[b, k])
        refs = sorted(range(L), key=lambda k: pm_ref[k])
        np.testing.assert_allclose(
            PM[b, ours], pm_ref[refs], rtol=1e-4, atol=1e-4,
            err_msg=f"frame {b} PM multiset",
        )
        for a, c in zip(ours, refs):
            assert (u_all[b, a] == outs[c]).all(), f"frame {b} path content"


def test_scl_L1_equals_sc():
    """L=1 SCL must reduce to plain SC (the PM rule picks the LLR sign)."""
    N, K = 32, 16
    frozen = frozen_mask(N, K)
    llrs = _random_llrs(N, 8, seed=3)
    a = np.asarray(sc_decode(jnp.asarray(llrs), jnp.asarray(frozen)))
    b = np.asarray(scl_decode(jnp.asarray(llrs), jnp.asarray(frozen), list_size=1))
    assert (a == b).all()


def test_scl_decodes_clean_frames():
    N, K, L = 128, 64, 8
    I = info_set(N, K)
    frozen = frozen_mask(N, K)
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 2, size=(4, K)).astype(np.int8)
    u = scatter_info(jnp.asarray(payload), jnp.asarray(I), N)
    x = polar_encode(u)
    llr = jnp.asarray(10.0 * (1.0 - 2.0 * np.asarray(x, np.float64)), jnp.float32)
    u_hat = np.asarray(scl_decode(llr, jnp.asarray(frozen), list_size=L))
    assert (u_hat[:, I] == payload).all()


def _cascl_oracle(g, llr, frozen, L, I, R):
    """Reference CA-SCL tail (CASCL_128.c:663-698) on top of the oracle SCL."""
    outs, pm = ref.scl_decode(g, llr, frozen, L, return_state=True)
    ok = [(np.asarray(outs[k][I]) @ R % 2 == 0).all() for k in range(L)]
    if any(ok):
        cands = [k for k in range(L) if ok[k]]
        best = min(cands, key=lambda k: pm[k])
    else:
        best = int(np.argmin(pm))
    return outs[best]


@pytest.mark.parametrize("L", [2, 4])
def test_cascl_matches_oracle(L):
    N, K = 32, 12
    r = max(CRC6_EXPONENTS)
    I = info_set(N, K + r)
    frozen = frozen_mask(N, K + r)
    R = check_matrix(CRC6_EXPONENTS, K + r)
    g = ref.Graph(N, "lee")
    llrs = _random_llrs(N, 6, seed=21 + L)
    got = np.asarray(
        cascl_decode(jnp.asarray(llrs), jnp.asarray(frozen), tuple(I), R, list_size=L)
    )
    for b in range(llrs.shape[0]):
        want = _cascl_oracle(g, llrs[b], frozen, L, I, R)
        assert (got[b] == want).all(), f"frame {b}"


def test_cascl_end_to_end_clean():
    """CRC-encode + polar-encode + decode round trip on near-clean LLRs."""
    N, K, L = 64, 24, 4
    r = max(CRC6_EXPONENTS)
    I = info_set(N, K + r)
    frozen = frozen_mask(N, K + r)
    R = check_matrix(CRC6_EXPONENTS, K + r)
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 2, size=(6, K)).astype(np.int8)
    w = crc_encode_multiplicative(jnp.asarray(payload), CRC6_EXPONENTS)
    u = scatter_info(w, jnp.asarray(I), N)
    x = polar_encode(u)
    llr = jnp.asarray(8.0 * (1.0 - 2.0 * np.asarray(x, np.float64)), jnp.float32)
    u_hat = np.asarray(cascl_decode(llr, jnp.asarray(frozen), tuple(I), R, list_size=L))
    got_w = u_hat[:, I]
    assert (got_w == np.asarray(w)).all()
    # syndrome of the decoded codeword is zero
    assert ((got_w @ R) % 2 == 0).all()


def test_pm_tie_counter():
    """The "Oops!" observability counter (VERDICT: SCL_1024.c:620-633): zero
    on generic continuous-noise frames, positive when the 2L PM candidates
    genuinely tie at the median (all-zero LLRs make every branch cost the
    same LUT penalty)."""
    N, K, L = 32, 20, 4
    frozen = jnp.asarray(frozen_mask(N, K))
    llrs = _random_llrs(N, 6, seed=7)
    _, ties = scl_decode(jnp.asarray(llrs), frozen, list_size=L,
                         return_ties=True)
    assert (np.asarray(ties) == 0).all(), "generic frames must be tie-free"

    degenerate = jnp.zeros((2, N))
    _, ties = scl_decode(degenerate, frozen, list_size=L, return_ties=True)
    assert (np.asarray(ties) > 0).all(), "all-zero LLRs must tie at the median"


def test_pm_tie_counter_golden_frames_tie_free():
    """The golden SCL fixture frames (seed 1024, the frame-parity oracle set)
    must be tie-free — otherwise the documented keep-exactly-L divergence from
    the reference's strict-median repack could be load-bearing in the parity
    tests."""
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "scl_128_frames.txt")
    ys = {}
    with open(golden) as f:
        for line in f:
            parts = line.split()
            if parts[:1] == ["FRAME"] and parts[2] == "Y":
                ys[int(parts[1])] = [float(v) for v in parts[3:]]
    assert ys, "no Y rows in fixture"
    sigma = 10.0 ** (-1.0 / 20.0)  # fixtures are seed 1024 @ 1.0 dB
    llr = 2.0 * jnp.asarray(np.stack([ys[r] for r in sorted(ys)])) / sigma**2
    frozen = jnp.asarray(frozen_mask(128, 64))
    _, ties = scl_decode(llr, frozen, list_size=8, return_ties=True)
    assert (np.asarray(ties) == 0).all()


def test_scl_strict_median():
    """Debug-only strict-median reference policy (SCL_1024.c:618-633): on a
    synthetic tie frame it kills tied-at-median candidates ("Oops!" — fewer
    than L live paths), while on generic tie-free frames it is bit-identical
    to the default keep-exactly-L policy.  This converts the documented
    measure-zero divergence from 'argued' to 'demonstrated': both policies'
    decoded bits are produced side by side on a genuinely tying frame."""
    from polardecoding_tpu.models.scl import BIG

    N, K, L = 32, 20, 4
    frozen = jnp.asarray(frozen_mask(N, K))

    # generic frames: identical decisions, PMs, and tie counters
    llrs = jnp.asarray(_random_llrs(N, 8, seed=3))
    ua, pma, ta = scl_decode(llrs, frozen, list_size=L, return_all=True,
                             return_ties=True)
    ub, pmb, tb = scl_decode(llrs, frozen, list_size=L, return_all=True,
                             return_ties=True, strict_median=True)
    assert (np.asarray(ta) == 0).all()
    assert (np.asarray(ua) == np.asarray(ub)).all()
    assert (np.asarray(pma) == np.asarray(pmb)).all()
    assert (np.asarray(tb) == 0).all()

    # synthetic tie frame: all-zero LLRs tie every candidate at the median
    degenerate = jnp.zeros((1, N))
    us, pms, ts = scl_decode(degenerate, frozen, list_size=L,
                             return_all=True, return_ties=True,
                             strict_median=True)
    ud, pmd, td = scl_decode(degenerate, frozen, list_size=L,
                             return_all=True, return_ties=True)
    assert int(np.asarray(ts)[0]) > 0 and int(np.asarray(td)[0]) > 0
    # strict mode ran with FEWER than L live paths (dead slots at PM=BIG) —
    # the reference's fewer-than-L repack — while the default kept all L live
    assert (np.asarray(pms)[0] >= BIG / 2).any()
    assert (np.asarray(pmd)[0] < BIG / 2).all()
    # both policies' min-PM decisions on the tie frame, side by side: the
    # all-zero frame decodes to all-zeros under either policy (>= 0 -> 0)
    best_s = np.asarray(us)[0, np.asarray(pms)[0].argmin()]
    best_d = np.asarray(ud)[0, np.asarray(pmd)[0].argmin()]
    assert (best_s == 0).all() and (best_d == 0).all()
