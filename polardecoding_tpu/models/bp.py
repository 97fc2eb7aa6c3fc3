"""Belief-propagation decoder: vectorized flooding sweeps over the butterfly graph.

Reference semantics (BP_128.c:334-389, BP_1024.c, BP_128_fag.c:349-403):
  - messages: left-going L[i, p] and right-going R[i, p] on an (n+1) x N lattice;
    L[n] = channel LLR (fixed), R[0] = 999 on frozen / 0 on info (fixed);
  - one iteration = R-sweep over stages 0..n-1 (Gauss-Seidel: stage i+1 reads the
    stage-i R just written) then L-sweep over stages n-1..0;
  - per-butterfly updates with the table-corrected min-sum CHK:
        R'[i+1, u] = CHK(R[i, u], L[i+1, d] + R[i, d])
        R'[i+1, d] = R[i, d] + CHK(R[i, u], L[i+1, u])
        L'[i, u]   = CHK(L[i+1, u], L[i+1, d] + R[i, d])
        L'[i, d]   = L[i+1, d] + CHK(R[i, u], L[i+1, u])
  - decision after iterMax iterations: u_hat = sign(L[0] + R[0]) on info bits.

TPU design: no pointer graph — stage i's butterflies are a reshape of the N axis
into [N/2d, 2, d] (d = 2^i) and a batched elementwise CHK over the halves; the
whole iteration runs under `lax.fori_loop` (or `lax.while_loop` with the
early-stop extension).  Batched over frames on the leading axis.

Graph conventions: the Kao ("_fag") wiring is the Lee wiring under per-stage
bit-reversal relabeling, with channel/frozen/output maps that also become the
identity — so this single engine implements both (equivalence is verified in
tests against a direct simulator of each wiring).

Extension beyond the reference: optional early stopping.  The reference always
runs iterMax=100 fixed sweeps; with `early_stop_every > 0` we periodically
re-encode the current hard decision and compare against the POSTERIOR hard
decision at the channel stage, sign(L[n] + R[n]) (a G-matrix stopping rule) —
sanctioned by BASELINE.json ("BP ... with R/L message arrays and
early-stopping").  Each frame's decision is LATCHED at its own first check
boundary where its rule holds, so the output is a pure function of
(channel LLRs, early_stop_every) — independent of batch size, sharding, and
of when the surrounding while_loop exits.  The loop itself exits once every
frame in the batch has latched (or at iterMax); that timing affects only
throughput, never decisions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from polardecoding_tpu.ops.chk import chk, chk_exact, chk_fast
from polardecoding_tpu.ops.encode import polar_encode

FROZEN_R = 999.0  # the reference's frozen-bit "infinity" (BP_128.c:351)


def _halves(x, i):
    """Split the last axis (length N) into stage-i butterfly halves.

    Returns (upper, lower) of shape [..., N/2]; `_merge` is the inverse.
    """
    N = x.shape[-1]
    d = 1 << i
    v = x.reshape(x.shape[:-1] + (N // (2 * d), 2, d))
    return v[..., 0, :], v[..., 1, :]


def _merge(up, lo, i, N):
    out = jnp.stack((up, lo), axis=-2)
    return out.reshape(out.shape[:-3] + (N,))


def bp_iteration(Ls, Rs, chk_fn):
    """One flooding iteration over per-stage message lists.

    Ls, Rs: lists of n+1 arrays [..., N].  Ls[n] and Rs[0] are fixed by the
    caller.  Returns updated lists (Gauss-Seidel across stages, parallel within
    a stage, exactly like the reference's sweep order).
    """
    n = len(Ls) - 1
    N = Ls[0].shape[-1]
    Rs = list(Rs)
    Ls = list(Ls)
    for i in range(n):
        ru, rd = _halves(Rs[i], i)
        lu, ld = _halves(Ls[i + 1], i)
        new_u = chk_fn(ru, ld + rd)
        new_d = rd + chk_fn(ru, lu)
        Rs[i + 1] = _merge(new_u, new_d, i, N)
    for i in range(n - 1, -1, -1):
        ru, rd = _halves(Rs[i], i)
        lu, ld = _halves(Ls[i + 1], i)
        new_u = chk_fn(lu, ld + rd)
        new_d = ld + chk_fn(ru, lu)
        Ls[i] = _merge(new_u, new_d, i, N)
    return Ls, Rs


def _stack(stages):
    return jnp.stack(stages, axis=-2)  # [..., n+1, N]


def _unstack(arr):
    return [arr[..., i, :] for i in range(arr.shape[-2])]


@functools.partial(
    jax.jit, static_argnames=("iters", "flavor", "early_stop_every")
)
def bp_decode(
    ch_llr,
    frozen,
    iters: int = 100,
    flavor: str = "minsum_lut",
    early_stop_every: int = 0,
):
    """Decode a batch of frames.

    ch_llr: [B, N] channel LLRs (2y/sigma^2); frozen: [N] bool.
    Returns u_hat [B, N] int8 (frozen positions forced 0).
    """
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    dt = ch_llr.dtype

    r0 = jnp.where(frozen, jnp.asarray(FROZEN_R, dt), jnp.asarray(0, dt))
    r0 = jnp.broadcast_to(r0, (B, N))
    Ls0 = _stack([jnp.zeros((B, N), dt)] * n + [ch_llr])
    Rs0 = _stack([r0] + [jnp.zeros((B, N), dt)] * n)

    def decision(Larr, Rarr):
        soft = Larr[..., 0, :] + Rarr[..., 0, :]
        return jnp.where(frozen, 0, (soft < 0)).astype(jnp.int8)

    if early_stop_every:
        # Per-frame latch: a frame's decision freezes at its own first check
        # boundary where the G-matrix rule holds; the loop keeps running for
        # the laggards and exits once every frame has latched.  `done` and
        # `u_lat` make decisions batch-independent (advisor round-1 medium).
        def body(carry):
            it, Larr, Rarr, done, u_lat = carry
            Ls, Rs = _unstack(Larr), _unstack(Rarr)
            Ls, Rs = bp_iteration(Ls, Rs, chk_fn)
            Larr, Rarr = _stack(Ls), _stack(Rs)
            check_now = (it + 1) % early_stop_every == 0
            u_hat = decision(Larr, Rarr)
            x_hat = polar_encode(u_hat)
            # posterior channel-stage hard decision sign(L[n] + R[n]) — NOT
            # the raw channel sign, which carries the channel's own bit errors
            ch_hard = (Larr[..., n, :] + Rarr[..., n, :] < 0).astype(jnp.int8)
            ok = jnp.all(x_hat == ch_hard, axis=-1)
            newly = check_now & ok & ~done
            u_lat = jnp.where(newly[:, None], u_hat, u_lat)
            done = done | newly
            return it + 1, Larr, Rarr, done, u_lat

        def cond(carry):
            it, _, _, done, _ = carry
            return (it < iters) & ~jnp.all(done)

        init = (jnp.asarray(0), Ls0, Rs0, jnp.zeros((B,), bool),
                jnp.zeros((B, N), jnp.int8))
        _, Larr, Rarr, done, u_lat = lax.while_loop(cond, body, init)
        return jnp.where(done[:, None], u_lat, decision(Larr, Rarr))

    def body(carry):
        Larr, Rarr = carry
        Ls, Rs = _unstack(Larr), _unstack(Rarr)
        Ls, Rs = bp_iteration(Ls, Rs, chk_fn)
        return _stack(Ls), _stack(Rs)

    Larr, Rarr = lax.fori_loop(0, iters, lambda _, c: body(c), (Ls0, Rs0))
    return decision(Larr, Rarr)


def bp_decode_auto(ch_llr, frozen, iters=100, flavor="minsum_lut",
                   early_stop_every=0, engine="auto"):
    """Dispatch to the Pallas VMEM-resident kernel on TPU backends (2-3x the
    fused-jnp path at N=1024; see ops/pallas/bp_kernel.py), falling back to
    the jnp engine elsewhere.  engine="jnp" forces the fused-jnp path (e.g.
    for non-f32 message dtypes: Mosaic cannot lower dynamic_rotate on
    sub-32-bit data, so the Pallas kernel is f32-only)."""
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu", "gpu")
    B = ch_llr.shape[0]
    if engine == "jnp":
        on_tpu = False
    if on_tpu and ch_llr.dtype != jnp.float32:
        raise ValueError(
            "Pallas BP kernel is f32-only (Mosaic dynamic_rotate); "
            "pass engine='jnp' for other message dtypes")
    if on_tpu and B % 8 == 0:
        from polardecoding_tpu.ops.pallas.bp_kernel import bp_decode_pallas

        return bp_decode_pallas(ch_llr, frozen, iters=iters, flavor=flavor,
                                early_stop_every=early_stop_every)
    return bp_decode(ch_llr, frozen, iters=iters, flavor=flavor,
                     early_stop_every=early_stop_every)


# ---------------------------------------------------------------------------
# Wave decoding: persistent message state advanced K iterations at a time.
#
# The continuous-batching BP engine (parallel/harness.run_point_waves) keeps a
# full batch of in-flight frames, advances ALL of them by a wave of K
# iterations, retires the frames whose G-matrix check passes (or that hit
# iterMax), and refills the freed slots with fresh frames in place.  Unlike
# the whole-decode early stop (jnp.all over the batch), a frame's decision is
# taken at ITS OWN first wave boundary where the per-frame check passes —
# a pure function of (channel LLRs, K), independent of batch size, sharding,
# and what other frames share the batch.  K is part of the decode semantics
# and is recorded in the preset (decoder.wave_iters).


def wave_init_state(ch_llr, frozen):
    """Pack fresh BP message state [2(n+1), B, N] (stage-major — each stage
    is a contiguous [B, N] plane, which is what the Pallas wave kernel can
    tile): planes 0..n = L (L[n] = the channel LLRs), planes n+1..2n+1 = R
    (R[0] = frozen 999/0)."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    dt = ch_llr.dtype
    r0 = jnp.where(frozen, jnp.asarray(FROZEN_R, dt), jnp.asarray(0, dt))
    Ls = [jnp.zeros((B, N), dt)] * n + [ch_llr]
    Rs = [jnp.broadcast_to(r0, (B, N))] + [jnp.zeros((B, N), dt)] * n
    return jnp.stack(Ls + Rs, axis=0)


@functools.partial(jax.jit, static_argnames=("iters", "flavor"))
def bp_wave_jnp(state, iters: int = 8, flavor: str = "minsum_lut"):
    """Advance packed state by `iters` BP iterations (jnp fallback)."""
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    S2 = state.shape[0]
    n = S2 // 2 - 1

    def body(_, st):
        Ls = [st[i] for i in range(n + 1)]
        Rs = [st[n + 1 + i] for i in range(n + 1)]
        Ls, Rs = bp_iteration(Ls, Rs, chk_fn)
        return jnp.stack(Ls + Rs, axis=0)

    return lax.fori_loop(0, iters, body, state)


def bp_wave(state, iters: int = 8, flavor: str = "minsum_lut"):
    """Backend dispatch for the wave advance."""
    if jax.default_backend() not in ("cpu", "gpu") and state.shape[1] % 8 == 0:
        from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_pallas

        return bp_wave_pallas(state, iters=iters, flavor=flavor)
    return bp_wave_jnp(state, iters=iters, flavor=flavor)


def wave_decide(state, frozen):
    """(u_hat [B, N] int8, done [B] bool) from packed state: decision
    sign(L0 + R0) on info bits; done = G-matrix check, x(u_hat) equal to the
    posterior channel-stage hard decision sign(L[n] + R[n])."""
    S2 = state.shape[0]
    n = S2 // 2 - 1
    soft = state[0] + state[n + 1]
    u_hat = jnp.where(frozen, 0, (soft < 0)).astype(jnp.int8)
    x_hat = polar_encode(u_hat)
    post = (state[n] + state[2 * n + 1] < 0).astype(jnp.int8)
    return u_hat, jnp.all(x_hat == post, axis=-1)


def wave_merge(state, ch_llr, retire):
    """Re-initialize retired slots' planes from fresh channel LLRs in place:
    L[n] <- llr, every other L/R plane <- 0 for slots where retire is True.
    R[0] (the frozen 999/0 row) is identical for every frame and untouched.
    Same merge the fused Pallas kernel performs at its head."""
    S2, B, N = state.shape
    n = S2 // 2 - 1
    r0 = state[n + 1]
    keep = ~retire[None, :, None]
    state = jnp.where(keep, state, 0)
    state = state.at[n].set(jnp.where(retire[:, None], ch_llr, state[n]))
    return state.at[n + 1].set(r0)


@functools.partial(jax.jit, static_argnames=("iters", "flavor",
                                              "check_every"))
def bp_wave_fused_jnp(state, ch_llr, retire, iters: int = 8,
                      flavor: str = "minsum_lut", check_every: int = 0):
    """jnp reference for the fused wave step: merge -> advance -> decide.
    Bit-identical to the fused Pallas kernel (ops/pallas/bp_kernel.py::
    bp_wave_fused_pallas), including the check_every > 0 in-wave per-frame
    latch (a frame's (u, done) freeze at its own first passing check)."""
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    n = state.shape[0] // 2 - 1
    state = wave_merge(state, ch_llr, retire)
    frozen = state[n + 1] > 0.0
    if check_every:
        B, N = state.shape[1:]

        def wbody(it, c):
            st, done, u_lat = c
            Ls = [st[i] for i in range(n + 1)]
            Rs = [st[n + 1 + i] for i in range(n + 1)]
            Ls, Rs = bp_iteration(Ls, Rs, chk_fn)
            st = jnp.stack(Ls + Rs, axis=0)
            u, ok = wave_decide(st, frozen)
            do = jnp.logical_or((it + 1) % check_every == 0, it + 1 == iters)
            newly = do & ok & ~done
            u_lat = jnp.where(newly[:, None], u, u_lat)
            return st, done | newly, u_lat

        done0 = jnp.zeros((B,), bool)
        state, done, u_lat = lax.fori_loop(
            0, iters, wbody, (state, done0, jnp.zeros((B, N), jnp.int8)))
        u_fin, _ = wave_decide(state, frozen)
        return state, jnp.where(done[:, None], u_lat, u_fin), done
    state = bp_wave_jnp(state, iters=iters, flavor=flavor)
    u_hat, done = wave_decide(state, frozen)
    return state, u_hat, done


def bp_wave_fused(state, ch_llr, retire, iters: int = 8,
                  flavor: str = "minsum_lut", check_every: int = 0):
    """Backend dispatch for the fused wave step (one kernel per wave:
    refill-merge + K iterations + G-matrix decide — saves the decide and
    where-merge full-state XLA passes the unfused path pays per wave)."""
    if jax.default_backend() not in ("cpu", "gpu") and state.shape[1] % 8 == 0:
        from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_fused_pallas

        return bp_wave_fused_pallas(state, ch_llr, retire, iters=iters,
                                    flavor=flavor, check_every=check_every)
    return bp_wave_fused_jnp(state, ch_llr, retire, iters=iters,
                             flavor=flavor, check_every=check_every)


# ---------------------------------------------------------------------------
# In-kernel Monte-Carlo wave engine (v3): the whole MC step — refill
# generation (payload table + GF(2) re-encode + PRNG-bits Gaussian channel),
# K iterations, per-iteration G-matrix retirement with a one-spare-per-wave
# refill, and error counting — runs inside one Pallas kernel
# (ops/pallas/bp_kernel._bp_wave_mc_kernel); the jnp twin below pins the
# semantics bit-for-bit (tests/test_wave_mc.py, interpret mode).
#
# Engine contract (differs from the fused wave engine — opt-in, qualified):
# slot s decodes frames s, s+B, s+2B, ... (payload = pure function of the
# frame index, as everywhere); a frame's noise is the spare generated at the
# head of the wave it entered — deterministic in (seed, B, tile, K, step),
# independent across frames, but NOT a function of frame index alone.


def mc_u_table(info_positions, K: int, N: int):
    """[128, N] f32: row m = the true-u row for PN offset m (63 rows + zero
    pad rows — 128 so the kernel can select rows with a one-hot [TB, 128]
    @ table MXU matmul).  Payload bit i of a frame with offset m is
    PN[(m + i) % 63] (SC_128.c:179-181); frozen positions are 0."""
    from polardecoding_tpu.utils.pn import PN_PERIOD, pn_sequence

    pn = pn_sequence()
    import numpy as np

    tab = np.zeros((128, N), np.float32)
    I = np.asarray(info_positions)
    for m in range(PN_PERIOD):
        idx = (m + np.arange(K)) % PN_PERIOD
        tab[m, I] = pn[idx]
    return jnp.asarray(tab)


def mc_tables(info_positions, K: int, N: int):
    """(u_table, x_table) [128, N] f32 each: payload rows and their ENCODED
    codewords x = u . F^{tensor n} — precomputed so the kernel's refill is
    two one-hot matmuls with no in-kernel encode."""
    utab = mc_u_table(info_positions, K, N)
    xtab = polar_encode(utab.astype(jnp.int8)).astype(jnp.float32)
    return utab, xtab


def mc_delta(batch: int, K: int) -> int:
    """Per-slot PN-offset advance between a slot's consecutive frames."""
    return (batch * (K % 63)) % 63


def mc_meta_init(batch: int, N: int, K: int):
    """Initial meta planes [4, B, N]: every slot pending (the first wave's
    head merge performs the initial fill), m pre-stepped back by delta so the
    first spare lands on slot s's first frame offset m0(s) = (s*(K%63))%63."""
    m0 = (jnp.arange(batch, dtype=jnp.int32) * (K % 63)) % 63
    m_init = (m0 - mc_delta(batch, K)) % 63
    meta = jnp.zeros((4, batch, N), jnp.float32)
    meta = meta.at[0].set(jnp.broadcast_to(
        m_init.astype(jnp.float32)[:, None], (batch, N)))
    return meta.at[3].set(1.0)


@functools.partial(jax.jit, static_argnames=(
    "iters", "flavor", "iter_max", "delta", "drain", "spares", "cadence"))
def bp_wave_mc_jnp(state, meta, u_table, sigma, bits, iters: int = 8,
                   flavor: str = "minsum_lut", iter_max: int = 100,
                   delta: int = 0, drain: bool = False, spares: int = 2,
                   cadence: int = 1):
    """jnp twin of the in-kernel-MC wave kernel (gen_bits=False semantics:
    `bits` [spares, B, N] uint32 supplies the generations' noise).
    Bit-identical to the Pallas kernel in interpret mode.  Returns
    (state', meta', stats [B, 3] f32 — per-slot errbit / errblock /
    frames retired this wave)."""
    from polardecoding_tpu.ops.noise import gaussian_from_bits

    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    S2, B, N = state.shape
    n = S2 // 2 - 1
    f32 = jnp.float32
    zero = jnp.zeros((B, N), f32)
    one = jnp.ones((B, N), f32)

    m_in, u_in, it_in, pend_in = meta[0], meta[1], meta[2], meta[3]
    sigma = jnp.asarray(sigma, f32)
    inv_s = 1.0 / sigma
    cB = 2.0 * inv_s
    m_g, u_g, llr_g = [], [], []
    for g in range(spares):
        dm = f32(((g + 1) * delta) % 63)
        mg = m_in + dm
        mg = jnp.where(mg >= 63.0, mg - 63.0, mg)
        ug = u_table[mg[:, 0].astype(jnp.int32)]
        xg = polar_encode(ug.astype(jnp.int8)).astype(f32)
        z = gaussian_from_bits(bits[g])
        m_g.append(mg)
        u_g.append(ug)
        sgn = jnp.where(xg > 0.5, -inv_s, inv_s)  # contraction-proof form
        llr_g.append(cB * (sgn + z))

    def gen_sel(ptr):
        m_s, u_s, l_s = m_g[0], u_g[0], llr_g[0]
        for g in range(1, spares):
            pick = ptr == f32(g)
            m_s = jnp.where(pick, m_g[g], m_s)
            u_s = jnp.where(pick, u_g[g], u_s)
            l_s = jnp.where(pick, llr_g[g], l_s)
        return m_s, u_s, l_s

    rm = jnp.zeros((B, N), bool) if drain else (pend_in > 0.5)
    frozen_row = state[n + 1] > 0.0
    st = jnp.where(rm[None, :, :], 0.0, state)
    st = st.at[n].set(jnp.where(rm, llr_g[0], state[n]))
    st = st.at[n + 1].set(state[n + 1])
    m_c = jnp.where(rm, m_g[0], m_in)
    u_c = jnp.where(rm, u_g[0], u_in)
    it_c = jnp.where(rm, zero, it_in)
    rmf = rm.astype(f32)
    avail = zero if drain else f32(spares) * one - rmf
    ptr = rmf
    pend_c = pend_in if drain else zero

    # mirrors the kernel's unrolled loop exactly: checks only at cadence
    # boundaries (and always at the last iteration); `since` accumulates
    # the iterations applied to it_c at each check
    eb, ebl, fr = zero, zero, zero
    since = 0
    for it in range(iters):
        Ls = [st[i] for i in range(n + 1)]
        Rs = [st[n + 1 + i] for i in range(n + 1)]
        Ls, Rs = bp_iteration(Ls, Rs, chk_fn)
        st = jnp.stack(Ls + Rs, axis=0)
        since += 1
        last = it == iters - 1
        if not ((it + 1) % cadence == 0 or last):
            continue
        alive = 1.0 - pend_c
        it_c = it_c + f32(since) * alive
        since = 0
        u8, ok = wave_decide(st, frozen_row[0])
        u = u8.astype(f32)
        okm = jnp.broadcast_to(ok[:, None], (B, N)).astype(f32)
        done = jnp.maximum(okm, (it_c >= f32(iter_max)).astype(f32)) * alive
        has = (avail > 0.5).astype(f32)
        retire_now = done * has
        retire = retire_now if not last else (
            retire_now + done * (1.0 - has))
        bad = jnp.abs(u - u_c) * retire
        eb = eb + bad
        ebl = ebl + jnp.max(bad, axis=1, keepdims=True)
        fr = fr + retire
        m_nx, u_nx, llr_nx = gen_sel(ptr)
        rm2 = retire_now > 0.5
        st = jnp.where(rm2[None, :, :], 0.0, st)
        st = st.at[n].set(jnp.where(rm2, llr_nx, st[n]))
        st = st.at[n + 1].set(
            jnp.where(frozen_row, jnp.asarray(FROZEN_R, f32), 0.0))
        m_c = jnp.where(rm2, m_nx, m_c)
        u_c = jnp.where(rm2, u_nx, u_c)
        it_c = jnp.where(rm2, zero, it_c)
        ptr = ptr + retire_now
        avail = avail - retire_now
        if last:
            pend_c = jnp.maximum(pend_c, done * (1.0 - has))
    meta = jnp.stack([m_c, u_c, it_c, pend_c], axis=0)
    stats = jnp.stack([
        jnp.sum(eb, axis=1), jnp.max(ebl, axis=1), jnp.max(fr, axis=1)
    ], axis=1)
    return st, meta, stats


def bp_wave_mc(state, meta, u_table, x_table, sigma, seeds, bits=None,
               iters: int = 8,
               flavor: str = "minsum_lut", iter_max: int = 100,
               delta: int = 0, gen_bits: bool = True, drain: bool = False,
               spares: int = 2, cadence: int = 1, tile: int = 0,
               bit_gen: str = "tf32"):
    """Backend dispatch for the in-kernel-MC wave step.  On TPU runs the
    Pallas kernel (gen_bits=True draws noise bits in-kernel; False takes
    threefry `bits`); elsewhere the jnp twin (requires bits)."""
    if jax.default_backend() not in ("cpu", "gpu") and state.shape[1] % 8 == 0:
        from polardecoding_tpu.ops.pallas.bp_kernel import bp_wave_mc_pallas

        state, meta, stats = bp_wave_mc_pallas(
            state, meta, u_table, x_table, sigma, seeds, bits, iters=iters,
            flavor=flavor, iter_max=iter_max, delta=delta, gen_bits=gen_bits,
            drain=drain, spares=spares, cadence=cadence, tile=tile,
            bit_gen=bit_gen)
        return state, meta, stats[:, :3]
    assert bits is not None, "jnp MC twin needs XLA-side noise bits"
    return bp_wave_mc_jnp(state, meta, u_table, sigma, bits, iters=iters,
                          flavor=flavor, iter_max=iter_max, delta=delta,
                          drain=drain, spares=spares, cadence=cadence)


@functools.partial(jax.jit, static_argnames=("iters", "flavor", "checkpoints"))
def bpr_decode(
    ch_llr,
    frozen,
    true_u,
    info_positions,
    iters: int = 90,
    flavor: str = "minsum_lut",
    checkpoints: tuple = (3, 6, 10, 20, 40, 80),
):
    """BPr instrumentation (ref: BPr_128.c:373-580): run BP, and at each
    checkpoint iteration snapshot per-stage hard decisions, propagate them
    leftward through the GF(2) butterfly inverse, and count info-bit errors.

    Returns (u_hat [B, N], stage_errors [num_checkpoints, n+1] summed over the
    batch — the reference's E table before division by run count).
    """
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    dt = ch_llr.dtype

    r0 = jnp.where(frozen, jnp.asarray(FROZEN_R, dt), jnp.asarray(0, dt))
    r0 = jnp.broadcast_to(r0, (B, N))
    Ls = [jnp.zeros((B, N), dt) for _ in range(n)] + [ch_llr]
    Rs = [r0] + [jnp.zeros((B, N), dt) for _ in range(n)]

    true_info = true_u[..., info_positions]
    errs = []
    # checkpoints are static and few: unroll segments between them.
    it = 0
    cps = sorted(checkpoints)
    segs = []
    prev = 0
    for c in cps:
        segs.append(c - prev)
        prev = c

    def run_iters(Ls, Rs, count):
        Larr, Rarr = _stack(Ls), _stack(Rs)

        def body(_, c):
            La, Ra = c
            ls, rs = bp_iteration(_unstack(La), _unstack(Ra), chk_fn)
            return _stack(ls), _stack(rs)

        Larr, Rarr = lax.fori_loop(0, count, body, (Larr, Rarr))
        return _unstack(Larr), _unstack(Rarr)

    for seg in segs:
        Ls, Rs = run_iters(Ls, Rs, seg)
        it += seg
        # snapshot: for each stage i, hard-decide b = sign(l + r) at stage i,
        # propagate left via (upper <- upper xor lower, lower <- lower), then
        # count errors over info bits (ref: BPr_128.c:418-441).
        stage_err = []
        for i in range(n + 1):
            b = (Ls[i] + Rs[i] < 0).astype(jnp.int8)
            for k in range(i - 1, -1, -1):
                up, lo = _halves(b, k)
                b = _merge(up ^ lo, lo, k, N)
            bad = b[..., info_positions] != true_info
            stage_err.append(jnp.sum(bad, dtype=jnp.int32))
        errs.append(jnp.stack(stage_err))

    # finish any remaining iterations up to iterMax
    if it < iters:
        Ls, Rs = run_iters(Ls, Rs, iters - it)
    soft = Ls[0] + Rs[0]
    u_hat = jnp.where(frozen, 0, (soft < 0)).astype(jnp.int8)
    return u_hat, jnp.stack(errs)
