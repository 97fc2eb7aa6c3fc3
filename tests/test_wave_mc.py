"""Tests for the in-kernel-MC wave engine (v3): jnp twin vs Pallas kernel
bit-parity (interpret mode), payload-table correctness, census/drain
accounting, determinism, and a statistical BLER sanity check against the
fused wave engine.

The engine's contract (models/bp.py MC section): payloads are pure functions
of the (slot-strided) frame index; noise is the spare of the wave a frame
entered — deterministic in (seed, B, tile, K, step).  Counters must censor
nothing: every issued frame is counted exactly once across steps + drain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polardecoding_tpu.configs import preset
from polardecoding_tpu.models.bp import (
    bp_wave_mc_jnp,
    mc_delta,
    mc_meta_init,
    mc_tables,
    mc_u_table,
    wave_init_state,
)
from polardecoding_tpu.ops.encode import scatter_info
from polardecoding_tpu.parallel.harness import (
    make_wave_step_mc,
    payload_from_index,
    run_point_waves,
)
from polardecoding_tpu.utils.pn import pn_sequence
from polardecoding_tpu.analysis.construction import code_frozen_mask, code_info_set


def _mk(preset_name="BP_128_FASTCHK", B=32):
    p = preset(preset_name)
    code = p.code
    N, K = code.N, code.K
    I = jnp.asarray(code_info_set(code))
    frozen = jnp.asarray(code_frozen_mask(code))
    utab = mc_u_table(code_info_set(code), K, N)
    return p, code, N, K, I, frozen, utab


def test_mc_u_table_matches_payload_from_index():
    _, code, N, K, I, _, utab = _mk()
    pn = jnp.asarray(pn_sequence())
    fidx = jnp.arange(200, dtype=jnp.int32)
    pay = payload_from_index(fidx, pn, K)
    u_full = scatter_info(pay, I, N)
    m = (fidx * (K % 63)) % 63
    np.testing.assert_array_equal(np.asarray(utab[m]), np.asarray(u_full))


@pytest.mark.parametrize("cadence", [1, 2, 4])
def test_mc_twin_matches_interpret_kernel(cadence):
    from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_mc_pallas

    p, code, N, K, I, frozen, utab = _mk(B=16)
    _, xtab = mc_tables(code_info_set(code), K, N)
    B, iters, iter_max = 16, 4, 12
    delta = mc_delta(B, K)
    sigma = jnp.float32(10.0 ** (-2.0 / 20.0))
    key = jax.random.PRNGKey(7)
    state_j = wave_init_state(jnp.zeros((B, N), jnp.float32), frozen)
    meta_j = mc_meta_init(B, N, K)
    state_p, meta_p = state_j, meta_j
    for step in range(5):
        drain = step == 4
        bits = jax.random.bits(jax.random.fold_in(key, step), (2, B, N),
                               jnp.uint32)
        state_j, meta_j, stats_j = bp_wave_mc_jnp(
            state_j, meta_j, utab, sigma, bits, iters=iters,
            flavor="minsum_lut_fast", iter_max=iter_max, delta=delta,
            drain=drain, cadence=cadence)
        state_p, meta_p, stats_p = bp_wave_mc_pallas(
            state_p, meta_p, utab, xtab, sigma, jnp.zeros(4, jnp.int32),
            bits, iters=iters, flavor="minsum_lut_fast", iter_max=iter_max,
            delta=delta, gen_bits=False, drain=drain, tile=8,
            interpret=True, cadence=cadence)
        # message state: ulp-level tolerance — the twin and the interpret
        # kernel are DIFFERENT XLA programs and CPU FMA contraction can
        # differ between fusions (the same reason golden f64 parity pins
        # the numpy oracle, CLAUDE.md); engine SEMANTICS (meta planes,
        # counters) must still be exactly equal
        np.testing.assert_allclose(np.asarray(state_j),
                                   np.asarray(state_p), rtol=2e-5,
                                   atol=1e-5, err_msg=f"step {step}")
        np.testing.assert_array_equal(np.asarray(meta_j[0]),
                                      np.asarray(meta_p[0]),
                                      err_msg=f"step {step} m")
        np.testing.assert_array_equal(np.asarray(meta_j[2:]),
                                      np.asarray(meta_p[2:]),
                                      err_msg=f"step {step} it/pend")
        np.testing.assert_array_equal(np.asarray(stats_j),
                                      np.asarray(stats_p[:, :3]),
                                      err_msg=f"step {step}")


def test_mc_census_and_drain():
    p, code, N, K, I, frozen, utab = _mk()
    B = 32
    init, step, drain = make_wave_step_mc(p, B, wave_iters=4)
    key = jax.random.PRNGKey(3)
    sigma = jnp.float32(10.0 ** (-3.0 / 20.0))
    carry = init(key, jnp.int32(0), sigma)
    tot_fr = tot_eb = tot_ebl = 0
    for _ in range(6):
        carry, (eb, ebl, fr) = step(key, sigma, carry)
        tot_fr += int(fr)
        tot_eb += int(eb)
        tot_ebl += int(ebl)
        assert int(ebl) <= int(fr)
    # drain to completion: every remaining in-flight frame retires once
    remaining = B
    rounds = 0
    while remaining > 0:
        carry, (eb, ebl, fr, rem) = drain(sigma, carry)
        tot_fr += int(fr)
        tot_eb += int(eb)
        tot_ebl += int(ebl)
        remaining = int(rem)
        rounds += 1
        assert rounds < 100, "drain did not terminate"
    # after 6 steps of K=4 plus drain, every slot issued >= 1 frame and
    # every issued frame was counted exactly once: in-flight at the end is 0
    # and the meta pending plane marks every slot dead
    state, meta, stepc, ckey = carry
    assert int(jnp.sum(meta[3, :, 0])) == B
    assert tot_fr >= B  # at least the initial fill retired
    assert tot_ebl <= tot_fr
    assert tot_eb <= tot_fr * code.num_info


def test_mc_determinism():
    p, code, N, K, I, frozen, utab = _mk()
    B = 32
    sigma = jnp.float32(10.0 ** (-2.0 / 20.0))

    def run():
        init, step, drain = make_wave_step_mc(p, B, wave_iters=4)
        key = jax.random.PRNGKey(11)
        carry = init(key, jnp.int32(0), sigma)
        out = []
        for _ in range(5):
            carry, o = step(key, sigma, carry)
            out.append(tuple(int(v) for v in o))
        return out

    assert run() == run()


def test_mc_retirement_beats_boundary_granularity():
    """A frame that converges mid-wave with the spare available must retire
    at that iteration, not the wave boundary: at high SNR nearly every frame
    converges in a few iterations, so with K=8 the MC engine's per-slot
    retire counts should exceed 1 per wave on average (the boundary engine
    can never exceed 1)."""
    p, code, N, K, I, frozen, utab = _mk()
    B = 64
    init, step, drain = make_wave_step_mc(p, B, wave_iters=8)
    key = jax.random.PRNGKey(5)
    sigma = jnp.float32(10.0 ** (-5.0 / 20.0))  # very clean channel
    carry = init(key, jnp.int32(0), sigma)
    carry, _ = step(key, sigma, carry)  # initial fill wave
    carry, (eb, ebl, fr) = step(key, sigma, carry)
    assert int(fr) > B  # > one retirement per slot in a single wave


def test_mc_bler_statistically_matches_fused_engine():
    """Loose 2-sided binomial check: the MC engine's BLER at a fixed frame
    budget must be consistent with the fused wave engine's (same preset,
    same SNR).  Catches gross semantics bugs (noise scaling, payload table,
    double counting), not ulp-level differences."""
    p = preset("BP_128_FASTCHK")
    snr = 2.5
    res_f = run_point_waves(p, snr, batch=256, wave_iters=8,
                            error_blocks=10 ** 9, max_frames=4096, seed=5)
    res_m = run_point_waves(p, snr, batch=256, wave_iters=8,
                            error_blocks=10 ** 9, max_frames=4096, seed=5,
                            engine="mc")
    assert res_m.frames >= 4096
    bler_f, bler_m = res_f.bler, res_m.bler
    # ~4 sigma window on ~4k frames at BLER ~5e-2
    sd = np.sqrt(bler_f * (1 - bler_f) / res_m.frames)
    assert abs(bler_m - bler_f) < 4 * sd + 2.0 / res_m.frames, (
        bler_f, bler_m, res_f.frames, res_m.frames)


def test_mc_channel_twin_matches_interpret_kernel():
    from polardecoding_tpu.ops.pallas.channel_kernel import (
        mc_channel_jnp,
        mc_channel_pallas,
    )
    from polardecoding_tpu.parallel.harness import _mc_mode_tables

    p, code, N, K, I, frozen, utab = _mk()
    _, xtab = _mc_mode_tables(code)
    B = 32
    m = (jnp.arange(B, dtype=jnp.int32) * (K % 63)) % 63
    bits = jax.random.bits(jax.random.PRNGKey(9), (B, N), jnp.uint32)
    sigma = jnp.float32(0.7)
    a = mc_channel_jnp(m, xtab, sigma, bits)
    b = mc_channel_pallas(m, xtab, sigma, jnp.zeros(4, jnp.int32), bits,
                          gen_bits=False, tile=8, interpret=True)
    # ulp-level tolerance: twin and interpret kernel are different XLA
    # programs and the erfinv Horner chain contracts to FMA differently
    # between fusions (same caveat as the wave-MC state parity test)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_mc_channel_step_statistically_matches_threefry():
    """make_frame_step(channel="mc") must produce counters consistent with
    the production threefry channel at a fixed frame budget (gross-bug
    check: table rows, sigma scaling, all-N counting convention)."""
    from polardecoding_tpu.parallel.harness import make_frame_step

    p = preset("BP_128_FASTCHK")
    B = 512
    key = jax.random.PRNGKey(4)
    sigma = jnp.float32(10.0 ** (-2.0 / 20.0))
    s_tf = make_frame_step(p, B)
    s_mc = make_frame_step(p, B, channel="mc")
    eb_t = ebl_t = eb_m = ebl_m = 0
    for i in range(8):
        a = s_tf(key, jnp.int32(i * B), sigma)
        b = s_mc(key, jnp.int32(i * B), sigma)
        eb_t += int(a[0]); ebl_t += int(a[1])
        eb_m += int(b[0]); ebl_m += int(b[1])
    frames = 8 * B
    p_t = ebl_t / frames
    sd = np.sqrt(max(p_t * (1 - p_t) / frames, 1e-12))
    assert abs(ebl_m / frames - p_t) < 4 * sd + 2.0 / frames, (
        ebl_t, ebl_m, frames)


def test_threefry2x32_matches_jax():
    from jax._src import prng as jprng

    from polardecoding_tpu.ops.noise import threefry2x32

    k = jnp.array([0x13198A2E, 0x03707344], dtype=jnp.uint32)
    ct = jnp.arange(64, dtype=jnp.uint32)
    oracle = np.asarray(jprng.threefry_2x32(k, ct))
    y0, y1 = threefry2x32(k[0], k[1], ct[:32], ct[32:])
    mine = np.concatenate([np.asarray(y0), np.asarray(y1)])
    np.testing.assert_array_equal(oracle, mine)
