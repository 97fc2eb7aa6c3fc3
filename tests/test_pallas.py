"""Pallas kernels vs the jnp engines (interpreter mode on the CPU mesh)."""
import numpy as np
import jax.numpy as jnp
import pytest

from polardecoding_tpu.models.bp import bp_decode
from polardecoding_tpu.ops.pallas.bp_kernel import bp_decode_pallas
from polardecoding_tpu.utils.sequences import frozen_mask


@pytest.mark.parametrize("N,K,iters", [(32, 16, 8), (128, 64, 5)])
def test_bp_pallas_matches_jnp(N, K, iters):
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(N)
    llr = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32) * 3)
    a = np.asarray(bp_decode(llr, fr, iters=iters))
    b = np.asarray(bp_decode_pallas(llr, fr, iters=iters, tile=8, interpret=True))
    assert (a == b).all()


def test_bp_wave_fused_kernel_matches_jnp_interpret():
    """Fused wave kernel (merge + K iterations + decide) vs the jnp
    reference bp_wave_fused_jnp, including a mixed retire mask."""
    from polardecoding_tpu.models.bp import (
        bp_wave_fused_jnp,
        wave_init_state,
    )
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

    N, K, B = 64, 32, 16
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(9)
    old_llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
    state = wave_init_state(old_llr, fr)
    new_llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
    retire = jnp.asarray(rng.integers(0, 2, size=B).astype(bool))
    sa, ua, da = bp_wave_fused_jnp(state, new_llr, retire, iters=5)
    sb, ub, db = bp_wave_fused_pallas(state, new_llr, retire, iters=5,
                                      tile=8, interpret=True)
    assert np.array_equal(np.asarray(sa), np.asarray(sb))
    assert np.array_equal(np.asarray(ua), np.asarray(ub))
    assert np.array_equal(np.asarray(da), np.asarray(db))


def test_bp_wave_fused_check_every_latch():
    """In-wave per-frame G-check latch (check_every > 0, round-3 verdict
    item 3): kernel == jnp mirror bit-for-bit at cadence 1 and 2; cadence ==
    iters is bit-identical to the boundary-only path (one check at the
    boundary); and the latch can only retire MORE frames, never fewer."""
    from polardecoding_tpu.models.bp import (
        bp_wave_fused_jnp,
        wave_init_state,
    )
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

    N, K, B = 64, 32, 16
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(13)
    state = wave_init_state(
        jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2), fr)
    new_llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
    retire = jnp.asarray(rng.integers(0, 2, size=B).astype(bool))

    for ce in (1, 2):
        sa, ua, da = bp_wave_fused_jnp(state, new_llr, retire, iters=6,
                                       check_every=ce)
        sb, ub, db = bp_wave_fused_pallas(state, new_llr, retire, iters=6,
                                          tile=8, interpret=True,
                                          check_every=ce)
        assert np.array_equal(np.asarray(sa), np.asarray(sb)), ce
        assert np.array_equal(np.asarray(ua), np.asarray(ub)), ce
        assert np.array_equal(np.asarray(da), np.asarray(db)), ce

    # cadence == iters is exactly one boundary check == the ce=0 path
    base = bp_wave_fused_pallas(state, new_llr, retire, iters=6, tile=8,
                                interpret=True)
    bnd = bp_wave_fused_pallas(state, new_llr, retire, iters=6, tile=8,
                               interpret=True, check_every=6)
    for a, b in zip(base, bnd):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # per-iteration checks retire a superset of boundary-check frames
    _, _, d1 = bp_wave_fused_jnp(state, new_llr, retire, iters=6,
                                 check_every=1)
    assert bool(np.all(np.asarray(base[2]) <= np.asarray(d1)))


def test_wave_fused_rolls3_bit_equals_rolls4():
    """The 3-roll directed-operand sweep (production) and the superseded
    4-roll partner-exchange sweep are the same arithmetic on the same values
    (add-then-roll == roll-then-add bitwise; each lane side reads exactly one
    directed partner) — docs/ROOFLINE.md "Directed-roll sweep operands".
    Pins the `rolls` A/B hook (scripts/ab_rolls.py) to bit-equality so the
    superseded formulation stays a valid control."""
    from polardecoding_tpu.models.bp import wave_init_state
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

    N, K, B = 64, 32, 16
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(11)
    state = wave_init_state(
        jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2), fr)
    new_llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
    retire = jnp.asarray(rng.integers(0, 2, size=B).astype(bool))
    outs = [bp_wave_fused_pallas(state, new_llr, retire, iters=5, tile=8,
                                 interpret=True, rolls=r) for r in (3, 4)]
    for a, b in zip(outs[0], outs[1]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_bp_pallas_early_stop_matches_jnp(N=64, K=32):
    """Per-frame latched early stop: kernel and jnp engine share the check
    cadence and latch rule, so ES decisions must be bit-identical (and hence
    pure per frame — the jnp side's purity is pinned by
    test_bp_early_stop_batch_invariance)."""
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(5)
    llr = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32) * 3)
    a = np.asarray(bp_decode(llr, fr, iters=40, early_stop_every=4))
    b = np.asarray(bp_decode_pallas(llr, fr, iters=40, early_stop_every=4,
                                    tile=8, interpret=True))
    assert (a == b).all()


def test_scl_tree_kernel_matches_jnp_interpret():
    """Subtree-hybrid SCL kernel vs the jnp engine, exercising sigma-managed
    stages (n - 1 - S >= 1), the tie counter, and both frozen/info boundary
    types.  Tiny config — interpreter mode is slow."""
    from polardecoding_tpu.models.scl import scl_decode
    from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

    N, K, L, B, S = 32, 20, 4, 32, 2
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(4)
    llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 3)
    ua, pma, ta = scl_decode(llr, fr, list_size=L, return_all=True,
                             return_ties=True)
    ub, pmb, tb = scl_decode_tree(llr, fr, list_size=L, subtree=S,
                                  interpret=True)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    np.testing.assert_allclose(np.asarray(pma), np.asarray(pmb), rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(ta) == np.asarray(tb)).all()


def test_scl_subtree_kernel_matches_jnp_interpret():
    """Per-path-refs SCL kernel (the L <= 8 engine) vs the jnp engine."""
    from polardecoding_tpu.models.scl import scl_decode
    from polardecoding_tpu.ops.pallas.scl_subtree_kernel import (
        scl_decode_subtree,
    )

    N, K, L, B, S = 32, 20, 4, 8, 2
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(4)
    llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 3)
    ua, pma, ta = scl_decode(llr, fr, list_size=L, return_all=True,
                             return_ties=True)
    ub, pmb, tb = scl_decode_subtree(llr, fr, list_size=L, subtree=S, tile=8,
                                     interpret=True)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    np.testing.assert_allclose(np.asarray(pma), np.asarray(pmb), rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(ta) == np.asarray(tb)).all()


def test_bp_wave_kernel_matches_jnp_interpret():
    """State-I/O wave kernel vs the jnp wave advance."""
    from polardecoding_tpu.models.bp import bp_wave_jnp, wave_init_state
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_pallas

    N, K = 32, 16
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(6)
    llr = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32) * 2)
    st = wave_init_state(llr, fr)
    a = np.asarray(bp_wave_jnp(st, iters=5))
    b = np.asarray(bp_wave_pallas(st, iters=5, tile=8, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_scl_tree_kernel_l32_lane_packing_interpret():
    """L=32 packs F = 128/L = 4 frames per lane group (vs 32 at the L=4
    config above) — exercise the dense lane-packing geometry and the S=2
    production default for L=32 end-to-end (~35 s interpreter time)."""
    from polardecoding_tpu.models.scl import scl_decode
    from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

    N, K, L, B, S = 32, 20, 32, 16, 2
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(4)
    llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 3)
    ua, pma, ta = scl_decode(llr, fr, list_size=L, return_all=True,
                             return_ties=True)
    ub, pmb, tb = scl_decode_tree(llr, fr, list_size=L, subtree=S,
                                  interpret=True)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    np.testing.assert_allclose(np.asarray(pma), np.asarray(pmb), rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(ta) == np.asarray(tb)).all()


def test_scl_kernel_dispatch_regimes():
    """models/scl.py routes L <= 8 to the per-path-refs kernel and L >= 16 to
    the paths-in-lanes kernel, and the batch-divisibility gates match each
    kernel's tiling (docs/ROOFLINE.md layout campaign)."""
    from polardecoding_tpu.models.scl import _pallas_ok
    from polardecoding_tpu.ops.pallas.scl_tree_kernel import frames_per_tile
    from polardecoding_tpu.ops.pallas.scl_subtree_kernel import _pick_tile

    # paths-in-lanes frames/tile: 8 sublane groups x 128/L lanes, shrunk
    # only for small batches
    assert frames_per_tile(16, 4096) == 64
    assert frames_per_tile(32, 4096) == 32
    assert frames_per_tile(32, 8) == 8  # fs shrinks until fs*F <= B
    assert frames_per_tile(1, 1 << 20) == 1024
    # per-path-refs lane tile shrinks as L*N grows
    assert _pick_tile(128, 8) == 128
    assert _pick_tile(1024, 8) == 128
    # CPU backend (this suite) never takes a kernel
    assert not _pallas_ok(4096, 1024, 8)
    # tuned subtree depths (v5e measurements in default_subtree docstring):
    # the eager-copy cost makes small windows win at L=32
    from polardecoding_tpu.ops.pallas.scl_tree_kernel import default_subtree

    assert default_subtree(10, 8) == 5
    assert default_subtree(10, 16) == 5
    assert default_subtree(10, 32) == 2
    assert default_subtree(7, 8) == 5  # N=128: capped at n-2
    assert default_subtree(5, 32) == 2


def test_bp_pallas_spa_flavor():
    N, K = 32, 16
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(5)
    llr = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32) * 3)
    a = np.asarray(bp_decode(llr, fr, iters=6, flavor="spa"))
    b = np.asarray(
        bp_decode_pallas(llr, fr, iters=6, flavor="spa", tile=8, interpret=True)
    )
    assert (a == b).all()


def test_wave_fused_tile_independence():
    """Tile size is a pure scheduling knob: per-frame outputs and state are
    bit-identical across TB (pins the r5 default flip to TB=64 at N=1024,
    results/hw_queue_r5/step14 — measured on small shapes here)."""
    from polardecoding_tpu.models.bp import wave_init_state
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

    N, K, B = 64, 32, 32
    fr = jnp.asarray(frozen_mask(N, K))
    rng = np.random.default_rng(11)
    state = wave_init_state(
        jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2), fr)
    new_llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 2)
    retire = jnp.asarray(rng.integers(0, 2, size=B).astype(bool))
    outs = [bp_wave_fused_pallas(state, new_llr, retire, iters=5, tile=t,
                                 interpret=True) for t in (8, 16, 32)]
    for s, u, d in outs[1:]:
        assert np.array_equal(np.asarray(outs[0][0]), np.asarray(s))
        assert np.array_equal(np.asarray(outs[0][1]), np.asarray(u))
        assert np.array_equal(np.asarray(outs[0][2]), np.asarray(d))
