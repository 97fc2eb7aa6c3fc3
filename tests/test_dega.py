"""DE-GA analysis vs golden outputs of the compiled reference programs.

The golden files in tests/golden/ are the stdout of the reference's
deterministic analysis programs (BPDEGA_128.c, BPRGA_128.c,
BPRGA_128_allbit.c, BPRGA_1024.c) compiled with gcc -O2 — no RNG, no stdin,
so they are exact oracles for our float64 numpy ports.
"""
import os
import re

import numpy as np
import pytest

from polardecoding_tpu.analysis.dega import (
    bpdega,
    bprga,
    bprga_allbit,
    frozen_stage_masks,
)
from polardecoding_tpu.analysis.ga import derivative_phi, ga_chk, phi, phi_inv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _lines(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read().splitlines()


def test_phi_inverse_roundtrip():
    x = np.concatenate([np.linspace(0.01, 24.9, 200), np.linspace(25.5, 80, 40)])
    y = phi(x)
    back = phi_inv(y)
    # closed-form ranges are tight; the Newton tail has the reference's 1e-3 tol
    assert np.max(np.abs(back - x)) < 2e-2


def test_phi_monotone_decreasing():
    x = np.linspace(0.0, 60, 500)
    p = phi(x)
    assert np.all(np.diff(p) < 1e-12)
    assert np.all(derivative_phi(x[1:]) < 0)


def test_ga_chk_degrades():
    """Combining two means yields a smaller mean (check-node degrades)."""
    a = np.array([1.0, 3.0, 8.0, 20.0])
    c = ga_chk(a, a)
    assert np.all(c < a)


def test_bpdega_matches_reference_output():
    rows = [l for l in _lines("BPDEGA_128.txt") if l.startswith("bSNR")]
    for row in rows:
        m = re.match(r"bSNR = ([\d.]+)\s+BLER = ([\d.]+)", row)
        snr, bler = float(m.group(1)), float(m.group(2))
        got = bpdega(128, 64, snr).bler
        assert abs(got - bler) < 2e-6, f"snr {snr}: {got} vs {bler}"


def _parse_e_blocks(name, n_cols):
    """Parse per-iteration E rows; returns list of (iter, [E0..En]) in file
    order (multiple SNR blocks concatenate)."""
    out = []
    for l in _lines(name):
        parts = l.split()
        if len(parts) == n_cols + 1 and not l.startswith("iterMax"):
            try:
                it = int(parts[0])
            except ValueError:
                continue
            out.append((it, np.array([float(p) for p in parts[1:]])))
    return out


def test_bprga_matches_reference_output():
    rows = _parse_e_blocks("BPRGA_128.txt", 8)
    # reference sweeps 1.0..4.0 step 0.5, 14 reported iterations each
    per_point = 14
    snrs = [1.0 + 0.5 * i for i in range(7)]
    assert len(rows) == per_point * len(snrs)
    for p, snr in enumerate(snrs):
        got = bprga(128, 64, snr, 28)
        for it, want in rows[p * per_point : (p + 1) * per_point]:
            np.testing.assert_allclose(
                got[it], want, atol=2e-6, err_msg=f"snr {snr} iter {it}"
            )


def test_bprga_allbit_matches_reference_output():
    rows = _parse_e_blocks("BPRGA_128_allbit.txt", 8)
    got = bprga_allbit(128, 64, 3.0, 30)  # reference sweeps only 3.0
    assert len(rows) == len(got)
    for it, want in rows:
        np.testing.assert_allclose(got[it], want, atol=2e-6, err_msg=f"iter {it}")


def test_bprga_1024_matches_reference_output():
    rows = _parse_e_blocks("BPRGA_1024.txt", 11)
    got = bprga(1024, 512, 2.5, 30, report=lambda it: 5 <= it <= 9)
    for it, want in rows:
        np.testing.assert_allclose(
            got[it], want, rtol=1e-5, atol=2e-6, err_msg=f"iter {it}"
        )


def test_bprga_w_matches_reference_with_our_m_matrices():
    """Closed loop on the makeLambda replacement: tests/golden/bprga_128_W.txt
    is the compiled BPRGA_128_W.c driven by OUR generated M128 matrices
    (utils/gf2.write_m_dat, Kao convention).  bprga_w evaluates the CHK chain
    in Kao support order, so every column is exact to the golden's printed
    precision."""
    from polardecoding_tpu.analysis.dega import bprga_w

    blocks = {}
    cur = None
    for line in _lines("bprga_128_W.txt"):
        if line.startswith("bSNR"):
            cur = float(line.split()[2])
            blocks[cur] = {}
        else:
            parts = line.split()
            if len(parts) == 9:
                blocks[cur][int(parts[0])] = np.array(
                    [float(v) for v in parts[1:]]
                )
    assert set(blocks) == {2.0, 2.5, 3.0, 3.5, 4.0}
    for snr, rows in blocks.items():
        got = bprga_w(128, 64, snr, 32)
        for it, want in rows.items():
            np.testing.assert_allclose(
                got[it], want, atol=2e-6,
                err_msg=f"snr {snr} iter {it}",
            )


def test_bprga_m_matches_reference_output():
    """tests/golden/bprga_128_M.txt is the compiled BPRGA_128_M.c (prob<->LLR
    conversion path, BPRGA_128_M.c:395-425) driven by OUR M128 matrices
    (gcc -O2 /root/reference/BPRGA_128_M.c; stdin = write_m_dat(128, 'kao')).
    Sweeps bSNR 3.0..4.0 step 0.5, reports iterations 3..8.  The combining
    chain runs in Kao support order, so every column is exact to the golden's
    printed precision (%lf, 6 decimals)."""
    from polardecoding_tpu.analysis.dega import bprga_m

    blocks = {}
    cur = None
    for line in _lines("bprga_128_M.txt"):
        if line.startswith("bSNR"):
            cur = float(line.split()[2])
            blocks[cur] = {}
        else:
            parts = line.split()
            if len(parts) == 9:
                blocks[cur][int(parts[0])] = np.array(
                    [float(v) for v in parts[1:]]
                )
    assert set(blocks) == {3.0, 3.5, 4.0}
    for snr, rows in blocks.items():
        got = bprga_m(128, 64, snr, 32)
        assert set(got) == set(rows), (snr, sorted(got), sorted(rows))
        for it, want in rows.items():
            np.testing.assert_allclose(
                got[it], want, atol=2e-6,
                err_msg=f"snr {snr} iter {it}",
            )


def test_bprga_1024_w_matches_reference_output():
    """tests/golden/bprga_1024_W.txt is the compiled BPRGA_1024_W.c driven by
    OUR M1024 matrices (stdin = write_m_dat(1024, 'kao')).  Exercises the
    SNR-adaptive window iterMax/snr (BPRGA_1024_W.c:414-415) and the frozen-
    factor skip at N=1024.  The reference prints `-nan` where a combined LLR
    goes negative (sqrt of a negative, BPRGA_1024_W.c:475) — those entries are
    undefined upstream and skipped here; our bprga_w clamps at 0 instead."""
    from polardecoding_tpu.analysis.dega import bprga_w

    blocks = {}
    cur = None
    for line in _lines("bprga_1024_W.txt"):
        if line.startswith("bSNR"):
            cur = float(line.split()[2])
            blocks[cur] = {}
        else:
            parts = line.split()
            if len(parts) == 12:
                blocks[cur][int(parts[0])] = np.array(
                    [float(v) for v in parts[1:]]
                )
    assert set(blocks) == {2.0, 2.5, 3.0, 3.5, 4.0}
    for snr, rows in blocks.items():
        got = bprga_w(1024, 512, snr, 40, num_iters=int(40 / snr))
        # reference reports iter > 3 (1-based 5..window); ours reports > 1
        assert set(rows) <= set(got), (snr, sorted(got), sorted(rows))
        for it, want in rows.items():
            finite = np.isfinite(want)
            assert finite[0], f"snr {snr} iter {it}: stage-0 nan in golden"
            np.testing.assert_allclose(
                got[it][finite], want[finite], rtol=2e-5, atol=1e-7,
                err_msg=f"snr {snr} iter {it}",
            )


def test_frozen_stage_masks_counts():
    """Stage-0 mask = frozen set; rightmost stage has no frozen node (any
    info bit in the support unfreezes); counts shrink monotonically."""
    m = frozen_stage_masks(128, 64)
    counts = m.sum(axis=1)
    assert counts[0] == 64
    assert counts[-1] == 0 or counts[-1] < counts[0]
    assert all(counts[i + 1] <= counts[i] for i in range(len(counts) - 1))
