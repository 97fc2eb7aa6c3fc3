"""SC decoder: vectorized engine vs the direct graph-faithful oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from polardecoding_tpu.models.sc import sc_decode
from polardecoding_tpu.utils.sequences import frozen_mask, info_set
from polardecoding_tpu.ops.encode import polar_encode, scatter_info

import reference_impl as ref


def _random_llrs(N, B, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, N)) * 3.0


@pytest.mark.parametrize("N,K", [(8, 4), (16, 12), (32, 16), (64, 40)])
def test_sc_matches_oracle(N, K):
    frozen = frozen_mask(N, K)
    g = ref.Graph(N, "lee")
    llrs = _random_llrs(N, 8, seed=N)
    got = np.asarray(sc_decode(jnp.asarray(llrs), jnp.asarray(frozen)))
    for b in range(llrs.shape[0]):
        want = ref.sc_decode(g, llrs[b], frozen)
        assert (got[b] == want).all(), f"frame {b}"


def test_sc_kao_equals_lee():
    """The Kao (_fag) wiring with bRev decode order is the Lee engine under
    relabeling: both oracles must agree, so one engine serves both."""
    N, K = 32, 16
    frozen = frozen_mask(N, K)
    glee = ref.Graph(N, "lee")
    gkao = ref.Graph(N, "kao")
    llrs = _random_llrs(N, 6, seed=7)
    for b in range(6):
        a = ref.sc_decode(glee, llrs[b], frozen)
        c = ref.sc_decode(gkao, llrs[b], frozen)
        assert (a == c).all()


def test_sc_decodes_clean_frames():
    N, K = 128, 64
    I = info_set(N, K)
    frozen = frozen_mask(N, K)
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, size=(8, K)).astype(np.int8)
    u = scatter_info(jnp.asarray(payload), jnp.asarray(I), N)
    x = polar_encode(u)
    llr = jnp.asarray(10.0 * (1.0 - 2.0 * np.asarray(x, np.float64)), jnp.float32)
    u_hat = np.asarray(sc_decode(llr, jnp.asarray(frozen)))
    assert (u_hat[:, I] == payload).all()
