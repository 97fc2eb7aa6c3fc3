"""Frozen-specialized (fourth-generation) SCL Pallas kernel vs the jnp
engine — interpreter mode on the CPU mesh.

The fast kernel SPECIALIZES the traced program on the static frozen mask
(ops/pallas/scl_fast_kernel.py): all-frozen (R0) and repetition (REP) nodes
collapse to vectorized descents, info bits in mixed regions keep the proven
masked inner loop.  Reference semantics are unchanged (SCL_1024.c:546-680,
:481-502), so every test here asserts BIT equality of decoded paths, exact
PM equality, and tie-counter equality against models/scl.scl_decode — the
float64-validated jnp engine.

The parametrization walks the node taxonomy: masks with R0 nodes, REP nodes
of widths 2..8, mixed/SPC loop nodes, statically-all-info loop nodes, every
list-size lane packing (L=1 F=128 .. L=32 F=4), wloop in {2, 4, 8}, and
eager regions larger than the loop width (S > log2 wloop).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from polardecoding_tpu.models.scl import scl_decode
from polardecoding_tpu.ops.pallas.scl_fast_kernel import (
    decompose,
    schedule_stats,
    scl_decode_fast,
)
from polardecoding_tpu.utils.sequences import frozen_mask

# mask with an aligned all-frozen quad (R0), REP blocks, SPC and mixed
# patterns, an info tail — every decompose() node kind at wloop=4
MIXED32 = np.array(
    [1, 1, 1, 1, 0, 1, 1, 0, 1, 1, 0, 0, 0, 1, 0, 0,
     1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0], bool)


def _parity(fr, L, B=32, wloop=4, S=0, llr=None, seed=7):
    N = len(fr)
    frt = tuple(bool(b) for b in fr)
    if llr is None:
        rng = np.random.default_rng(seed)
        llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 3)
    ua, pma, ta = scl_decode(llr, jnp.asarray(np.asarray(fr, bool)),
                             list_size=L, return_all=True, return_ties=True)
    kw = dict(list_size=L, wloop=wloop, interpret=True)
    if S:
        kw["subtree"] = S
    ub, pmb, tb = scl_decode_fast(llr, frt, **kw)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    assert (np.asarray(pma) == np.asarray(pmb)).all()  # exact: same op DAG
    assert (np.asarray(ta) == np.asarray(tb)).all()


@pytest.mark.parametrize("L,B", [(1, 128), (2, 64), (4, 32), (8, 32)])
def test_scl_fast_mixed_mask_all_list_sizes(L, B):
    _parity(MIXED32, L, B=B)


@pytest.mark.parametrize("wloop", [2, 4, 8])
def test_scl_fast_wloop_sweep(wloop):
    _parity(MIXED32, 4, wloop=wloop)


def test_scl_fast_eager_region_larger_than_loop():
    """S > log2(wloop): sigma-managed stages shrink, loop nodes sit strictly
    inside the eager region."""
    _parity(MIXED32, 4, wloop=4, S=3)
    _parity(MIXED32, 8, wloop=2, S=3)


def test_scl_fast_5g_masks():
    """Real constructions: low rate (big R0/REP regions), reference rate 1/2,
    high rate (statically-all-info loop nodes)."""
    _parity(np.asarray(frozen_mask(32, 8)), 4)
    _parity(np.asarray(frozen_mask(32, 20)), 4)
    _parity(np.asarray(frozen_mask(32, 28)), 4)


def test_scl_fast_all_info():
    """Rate-1 code: no frozen structure at all — pure loop/branch schedule."""
    _parity(np.zeros(32, bool), 4)


def test_scl_fast_forced_ties():
    """Symmetric ±1 LLRs force exact PM ties at the median — the tie counter
    (the reference's "Oops!" condition, SCL_1024.c:620-633) must match the
    jnp engine event-for-event, not just bit decisions."""
    fr = np.asarray(frozen_mask(32, 20))
    llr = jnp.asarray(np.tile(np.array([1.0, -1.0] * 16, np.float32),
                              (32, 1)))
    frt = tuple(bool(b) for b in fr)
    _, _, ta = scl_decode(llr, jnp.asarray(fr), list_size=4,
                          return_all=True, return_ties=True)
    assert int(np.asarray(ta).sum()) > 0  # the scenario actually ties
    _parity(fr, 4, llr=llr)


def test_scl_fast_l32_lane_packing():
    """L=32 packs F = 4 frames per lane group — the densest packing."""
    _parity(np.asarray(frozen_mask(32, 20)), 32, B=16)


def test_scl_fast_n128():
    """N=128 K=64 (the reference's small-code config): 4 R0 + 5 REP +
    17 loop nodes at wloop=4 — a realistic production schedule."""
    _parity(np.asarray(frozen_mask(128, 64)), 8, B=16)


def test_twin_exact_mode_matches_oracle():
    """The numpy float32 twin (tests/scl_fast_ref.py) in exact mode is
    bit-identical to models/scl.scl_decode — proving the twin before it is
    used as the R1 flavor's oracle."""
    from scl_fast_ref import decode_batch

    rng = np.random.default_rng(7)
    for fr, L, wloop in [(MIXED32, 4, 2), (MIXED32, 8, 4),
                         (np.asarray(frozen_mask(32, 20)), 4, 2),
                         (np.asarray(frozen_mask(32, 20)), 1, 2)]:
        N = len(fr)
        llr = (rng.normal(size=(12, N)) * 3).astype(np.float32)
        ua, pma, ta = scl_decode(jnp.asarray(llr), jnp.asarray(fr),
                                 list_size=L, return_all=True,
                                 return_ties=True)
        ub, pmb, tb = decode_batch(llr, fr, L, wloop=wloop, r1min=0)
        assert (np.asarray(ua) == ub).all()
        assert (np.asarray(pma) == pmb).all()
        assert (np.asarray(ta) == tb).all()


@pytest.mark.parametrize("fr,L,r1,B", [
    (np.zeros(32, bool), 4, 2, 32),   # root R1 (w=32, t=3)
    (np.zeros(16, bool), 8, 2, 16),   # root R1 w=16, t=7
    (np.asarray(frozen_mask(32, 20)), 4, 2, 32),
    (np.asarray(frozen_mask(32, 20)), 8, 4, 32),
    (np.asarray(frozen_mask(64, 32)), 2, 2, 64),
])
def test_scl_fast_r1_matches_twin(fr, L, r1, B):
    """The kernel's R1 nodes (bounded-fork rate-1 rule, run_r1) must equal
    the numpy twin bit-for-bit: decoded paths, PMs, tie counters — across
    root-R1 codes and R1 blocks composed inside real 5G trees."""
    from scl_fast_ref import decode_batch

    N = len(fr)
    rng = np.random.default_rng(3)
    llr = (rng.normal(size=(B, N)) * 3).astype(np.float32)
    ua, pma, ta = decode_batch(llr, fr, L, wloop=2, r1min=r1)
    frt = tuple(bool(b) for b in fr)
    ub, pmb, tb = scl_decode_fast(jnp.asarray(llr), frt, list_size=L,
                                  wloop=2, r1=r1, interpret=True)
    assert (ua == np.asarray(ub)).all()
    assert (pma == np.asarray(pmb)).all()
    assert (ta == np.asarray(tb)).all()


def test_scl_fast_r1_diverges_from_exact():
    """Falsification witness (round-3 verdict item 2): the R1 shortcut is
    NOT survivor-set-preserving under the reference PHI — the hard PM drops
    the path-dependent lut(|l|) terms, so cross-path rankings change.  With
    seed 1024 at N=32 K=20 L=4 (channel-like LLRs, mean 2.0, sigma 2.5),
    frame 3 of the first chunk already decodes differently; ~16 % of frames
    diverge at this config.  This is WHY r1 ships as an opt-in flavor
    qualified by the 1000-error-block BLER protocol, never as bit-parity."""
    from scl_fast_ref import decode_batch

    fr = np.asarray(frozen_mask(32, 20))
    rng = np.random.default_rng(1024)
    llr = (rng.normal(size=(64, 32)) * 2.5 + 2.0).astype(np.float32)
    ua, pma = scl_decode(jnp.asarray(llr), jnp.asarray(fr), list_size=4,
                         return_all=True)
    ub, pmb, _ = decode_batch(llr, fr, 4, wloop=2, r1min=2)
    ba = np.take_along_axis(
        np.asarray(ua),
        np.asarray(jnp.argmin(pma, axis=-1))[:, None, None], axis=1)[:, 0]
    bb = np.take_along_axis(
        ub, np.argmin(pmb, axis=-1)[:, None, None], axis=1)[:, 0]
    d = (ba != bb).any(axis=1)
    assert d.any(), "expected divergence did not occur"
    assert d[3], "the documented counterexample frame must diverge"


def test_decompose_covers_and_stats():
    """The static decomposition tiles the leaf range exactly once, and
    schedule_stats counts what decompose emits."""
    frt = tuple(bool(b) for b in MIXED32)
    root = decompose(frt, 5, 0, 4)
    seen = []

    def walk(nd):
        if nd.kind == "branch":
            walk(nd.left)
            walk(nd.right)
        else:
            seen.append((nd.off, 1 << nd.stage, nd.kind))

    walk(root)
    cover = sorted((o, o + w) for o, w, _ in seen)
    assert cover[0][0] == 0 and cover[-1][1] == 32
    assert all(a[1] == b[0] for a, b in zip(cover, cover[1:]))
    st = schedule_stats(frt, 4)
    assert st["r0"] == sum(k == "r0" for *_, k in seen)
    assert st["rep"] == sum(k == "rep" for *_, k in seen)
    # an R0 never contains an info bit; a REP's only info bit is its last leaf
    for off, w, k in seen:
        blk = MIXED32[off:off + w]
        if k == "r0":
            assert blk.all()
        if k == "rep":
            assert blk[:-1].all() and not blk[-1]


def test_static_frozen_detection():
    """Dispatch helper: concrete masks (arrays, tuples) become static
    tuples; traced masks return None (-> legacy kernel fallback)."""
    import jax

    from polardecoding_tpu.models.scl import _static_frozen, default_wloop

    assert _static_frozen((True, False)) == (True, False)
    assert _static_frozen(np.array([1, 0], bool)) == (True, False)
    assert _static_frozen(jnp.asarray([True, False])) == (True, False)
    seen = []

    def f(m):
        seen.append(_static_frozen(m))
        return m

    jax.jit(f)(jnp.asarray([True, False]))
    assert seen[0] is None
    # production wloop default (measured: w2 wins at L in {8,16,32}, N=1024)
    assert default_wloop(10, 8) == 2


@pytest.mark.parametrize("fr,L,wloop", [
    (MIXED32, 4, 4),
    (MIXED32, 8, 2),
    (np.asarray(frozen_mask(64, 32)), 2, 2),
    (np.asarray(frozen_mask(128, 64)), 16, 2),
])
def test_scl_fast_stacked_fork_parity(fr, L, wloop):
    """stacked=True re-emits the fork phases as across-d height-2L blocks
    (rolled [cand0;cand1] / [rank;cand] stacks + one-hot mask-mul-reduce)
    instead of L height-1 chains.  Every cross-d accumulation it
    re-associates is one-hot (candidate ranks are a permutation per lane),
    so the result must be BIT-identical to the jnp oracle — same assertion
    strength as the default path's parity tests."""
    N = len(fr)
    frt = tuple(bool(b) for b in fr)
    rng = np.random.default_rng(11)
    B = max(32, 128 // L)  # >= one full lane tile of frames
    llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 3)
    ua, pma, ta = scl_decode(llr, jnp.asarray(np.asarray(fr, bool)),
                             list_size=L, return_all=True, return_ties=True)
    ub, pmb, tb = scl_decode_fast(llr, frt, list_size=L, wloop=wloop,
                                  interpret=True, stacked=True)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    assert (np.asarray(pma) == np.asarray(pmb)).all()
    assert (np.asarray(ta) == np.asarray(tb)).all()


def test_scl_fast_stacked_r1_matches_twin():
    """stacked composes with the bounded-fork R1 flavor: the fork_sel extra
    (per-path within-node state) gathers through the same parent map."""
    from scl_fast_ref import decode_batch

    fr = np.asarray(frozen_mask(32, 20))
    rng = np.random.default_rng(3)
    llr = (rng.normal(size=(32, 32)) * 3).astype(np.float32)
    ua, pma, ta = decode_batch(llr, fr, 8, wloop=2, r1min=4)
    frt = tuple(bool(b) for b in fr)
    ub, pmb, tb = scl_decode_fast(jnp.asarray(llr), frt, list_size=8,
                                  wloop=2, r1=4, interpret=True,
                                  stacked=True)
    assert (ua == np.asarray(ub)).all()
    assert (pma == np.asarray(pmb)).all()
    assert (ta == np.asarray(tb)).all()


def test_default_tiles():
    """T-tile dispatch table: measured T=2 at (n=10, L=8); demoted to 1
    whenever the batch cannot split into T whole lane-tiles."""
    from polardecoding_tpu.models.scl import default_tiles

    assert default_tiles(10, 8, 8192) == 2
    assert default_tiles(10, 8, 16384) == 2
    assert default_tiles(10, 8, 100) == 1   # 50 not a lane-tile multiple
    assert default_tiles(10, 4, 8192) == 1  # unmeasured config
    assert default_tiles(7, 8, 16384) == 2  # N=128 measured (r4 step26)
    assert default_tiles(7, 8, 16) == 1     # sub-tile batch cannot split


def test_scl_fast_ch_rep_modes_identical():
    """In-kernel path-lane channel replication (ch_rep=True, the default)
    must be bit-identical to the legacy XLA-side jnp.tile path — the lane
    concat places exactly the same values in every p-lane segment."""
    fr = frozen_mask(32, 16)
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 3)
    frt = tuple(bool(b) for b in fr)
    ua, pma, ta = scl_decode_fast(llr, frt, list_size=4, wloop=4,
                                  interpret=True, ch_rep=True)
    ub, pmb, tb = scl_decode_fast(llr, frt, list_size=4, wloop=4,
                                  interpret=True, ch_rep=False)
    assert (np.asarray(ua) == np.asarray(ub)).all()
    assert (np.asarray(pma) == np.asarray(pmb)).all()
    assert (np.asarray(ta) == np.asarray(tb)).all()
