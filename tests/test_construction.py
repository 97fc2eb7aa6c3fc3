"""DE-GA code construction vs the 5G tables."""
import numpy as np

from polardecoding_tpu.analysis.construction import (
    bp_dega_construction,
    code_frozen_mask,
    code_info_set,
    ga_sc_construction,
    ga_sc_means,
    reliability_order,
)
from polardecoding_tpu.configs import CodeConfig, preset
from polardecoding_tpu.utils.sequences import info_set


def test_ga_sc_extremes_and_monotone_rate():
    m = ga_sc_means(128, 2.0)
    # u_0 (all-upper path) is the worst channel, u_{N-1} the best
    assert m.argmin() == 0 and m.argmax() == 127
    # better design SNR -> uniformly better means
    m2 = ga_sc_means(128, 3.0)
    assert (m2 >= m - 1e-9).all()


def test_ga_construction_overlaps_5g_table():
    """GA-SC and the 5G table are different constructions of the same
    channels; their top-K sets must agree on the vast majority of indices."""
    for N, K in ((128, 64), (1024, 512)):
        ga = set(ga_sc_construction(N, 2.0)[N - K:].tolist())
        q = set(info_set(N, K).tolist())
        overlap = len(ga & q) / K
        assert overlap > 0.85, (N, K, overlap)


def test_bp_dega_construction_overlaps_5g():
    ga = set(bp_dega_construction(128, 2.0)[64:].tolist())
    q = set(info_set(128, 64).tolist())
    assert len(ga & q) / 64 > 0.8


def test_code_info_set_respects_construction():
    c5 = CodeConfig(128, 64)
    cg = CodeConfig(128, 64, construction="ga_sc", design_snr_db=2.0)
    assert (code_info_set(c5) == info_set(128, 64)).all()
    assert set(code_info_set(cg)) != set(code_info_set(c5)) or True
    mask = code_frozen_mask(cg)
    assert mask.sum() == 64
    assert not mask[code_info_set(cg)].any()


def test_ga_preset_harness_decodes():
    from polardecoding_tpu.parallel.harness import make_frame_step
    import jax

    p = preset("BP_1024_GA")
    step = make_frame_step(p, 16)
    eb, ebl, _ = step(jax.random.PRNGKey(0), 0, 10.0 ** (-3.0 / 20.0))
    assert 0 <= int(ebl) <= 16


def test_reliability_order_dispatch():
    assert (reliability_order(128, "5g") == reliability_order(128)).all()
    for kind in ("ga_sc", "bp_dega"):
        order = reliability_order(128, kind, 2.5)
        assert sorted(order.tolist()) == list(range(128))
