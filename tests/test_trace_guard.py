"""Traced-program-size regression guard for the SCL Pallas kernels.

Mosaic compile time is gated by traced-program size (CLAUDE.md): an innocent
edit reintroducing an O(M*L^2) term turns a ~7 s compile into a >40-minute
hang discovered only on hardware.  These tests pin the traces in SECONDS of
CPU time instead: absolute equation-count caps at representative configs
(~1.5x headroom over measured), plus L-scaling ratios that are RED for a
quadratic-in-L trace — demonstrated on the per-path-refs kernel, whose trace
is known quadratic (which is exactly why models/scl.py caps its dispatch at
L <= 8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polardecoding_tpu.utils.sequences import frozen_mask


def count_eqns(jaxpr) -> int:
    """Total equations, recursing into sub-jaxprs (pallas_call bodies,
    fori_loop/scan/cond branches)."""
    n = 0
    for eq in jaxpr.eqns:
        n += 1
        for v in eq.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for w in vals:
                if hasattr(w, "eqns"):
                    n += count_eqns(w)
                elif hasattr(w, "jaxpr"):
                    n += count_eqns(w.jaxpr)
    return n


N, K, B = 256, 128, 128
FR = np.asarray(frozen_mask(N, K))


def _trace(fn, **kw):
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    return count_eqns(jax.make_jaxpr(lambda x: fn(x, **kw))(llr).jaxpr)


def test_fast_kernel_trace_linear_in_L():
    """Frozen-specialized kernel at the PRODUCTION wloop=2 (models/scl.py
    default_wloop): absolute cap + linear L-scaling.  Measured at commit
    time (packed sigma): L=8 95,779 / L=16 164,155 eqns (ratio 1.71)."""
    from polardecoding_tpu.ops.pallas.scl_fast_kernel import scl_decode_fast

    frt = tuple(bool(b) for b in FR)
    c8 = _trace(scl_decode_fast, frozen=frt, list_size=8, wloop=2)
    c16 = _trace(scl_decode_fast, frozen=frt, list_size=16, wloop=2)
    assert c8 < 145_000, c8
    assert c16 / c8 < 2.2, (c8, c16)  # quadratic would be ~4x


def test_tree_kernel_trace_linear_in_L():
    """Paths-in-lanes kernel (the L >= 16 production engine): the O(M*L)
    trace property that makes L=32 compilable.  Same S isolates L-scaling.
    Measured: L=16 S=2 vs L=32 S=2 ratio ~2."""
    from polardecoding_tpu.ops.pallas.scl_tree_kernel import scl_decode_tree

    frj = jnp.asarray(FR)
    c16 = _trace(scl_decode_tree, frozen=frj, list_size=16, subtree=2)
    c32 = _trace(scl_decode_tree, frozen=frj, list_size=32, subtree=2)
    assert c32 < 420_000, c32
    assert c32 / c16 < 2.4, (c16, c32)


def test_subtree_kernel_trace_is_quadratic_hence_capped():
    """The per-path-refs kernel's trace IS quadratic in L — the guard ratio
    above would be red for it (this is the 'forced to L=32' regression the
    round-2 verdict asked the guard to catch), which is why its dispatch is
    capped at L <= 8 (models/scl.py).  Pin both facts.
    Measured: L=4 28,962 / L=8 63,398 / L=16 174,894."""
    from polardecoding_tpu.ops.pallas.scl_subtree_kernel import (
        scl_decode_subtree,
    )

    frj = jnp.asarray(FR)
    c8 = _trace(scl_decode_subtree, frozen=frj, list_size=8)
    c16 = _trace(scl_decode_subtree, frozen=frj, list_size=16)
    assert c8 < 100_000, c8  # the shipped regime stays bounded
    # the linear-scaling guard is RED for this kernel at L beyond its cap
    # (dispatch routing L<=8 here / L>=16 to the tree kernel is pinned by
    # test_pallas.test_scl_kernel_dispatch_regimes):
    assert c16 / c8 > 2.4, (c8, c16)
