"""Pallas TPU kernel for the BP decoder's flooding sweeps — the framework's
hottest loop (SURVEY §3.1: 100 iters x 2 sweeps x n stages x N lanes of CHK).

Why a kernel: the jnp BP engine (models/bp.py) is a chain of elementwise ops
on [B, n+1, N] arrays; XLA fuses within a stage but streams the message state
through HBM every stage of every iteration (~2 n x 100 array passes).  Here a
tile of TB frames keeps its entire message state [n+1, TB, N] in VMEM scratch
for all iterations: HBM traffic collapses to one [TB, N] read (channel LLRs)
plus one [TB, N] write (decisions) per frame, and the kernel is VPU
compute-bound (docs/ROOFLINE.md quantifies achieved vs peak).

Butterfly exchange without reshapes: Mosaic cannot lower the [TB, G, 2, d]
strided reshape views the jnp engine uses, so the stage-i partner exchange is
expressed elementwise with directed lane rotations (one roll per operand
side) and ONE full-width CHK per half-sweep with lane-selected operands — see
_sweep_update for the derivation from the reference's four butterfly
equations (BP_128.c:357-377).  The cyclic roll wrap-around only lands on
lanes masked out by the selects.

Semantics identical to models/bp.bp_decode: Gauss-Seidel R-sweep then L-sweep
per iteration, table-corrected min-sum CHK (or exact SPA), frozen R = 999,
decision sign(L0 + R0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardecoding_tpu.ops.chk import chk, chk_exact, chk_fast
from polardecoding_tpu.ops.noise import gaussian_from_bits, threefry2x32


def _upper_mask(i, TB, N):
    """[TB, N] bool: lane's stage-i butterfly role (bit i of lane == 0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N), dimension=1)
    return (lane & (1 << i)) == 0


def _sweep_update(Rv, Lv, i, up, chk_fn, rolls=3):
    """One butterfly half-sweep with a SINGLE full-width chk and THREE rolls.

    The four reference equations (BP_128.c:357-377) need, per butterfly pair
    (u, l): chk(R[u], L[l]+R[l]) at the upper lane and chk(R[u], L[u]) at the
    lower lane (then + R[l]).  Instead of evaluating two full-width chks and
    masking half of each away (the v1 formulation — 2x VPU waste), build
    lane-selected operands so ONE chk computes exactly the value every lane
    needs:

        S = L + R                                # summed BEFORE the roll
        A = where(up, R, roll(R, d))             # u: R[u]      l: R[u]
        B = where(up, roll(S, N-d), roll(L, d))  # u: L[l]+R[l] l: L[u]
        C = chk(A, B)                            # u: chk(R,S)  l: chk(R,L)
        R' = where(up, C, R + C)

    Upper lanes only ever read partner values from BELOW (+d, the N-d
    forward roll) and lower lanes only from ABOVE (d), so each operand needs
    ONE directed roll, not a full two-roll exchange; forming S = L + R once
    before rolling replaces the v2 kernel's P(L) + P(R) (rolls move bits
    exactly, so add-then-roll == roll-then-add bitwise) — 3 rolls + 1 add
    where v2 paid 4 rolls + 2 selects + 1 add.  Results are bit-identical to
    the v1/v2 kernels and the jnp engine.  Returns the updated R (pass
    (Lv, Rv) swapped for the L-sweep: the equations are symmetric under
    R<->L with the same operand pattern).
    """
    assert rolls in (3, 4), rolls  # a typo'd rolls must not silently
    # benchmark/label the 3-roll path (advisor r3)
    d = 1 << i
    N = Rv.shape[1]
    if rolls == 4:  # v2 formulation, kept for the HW A/B (bit-identical)
        fwd, bwd = pltpu.roll(Rv, N - d, axis=1), pltpu.roll(Rv, d, axis=1)
        PR = jnp.where(up, fwd, bwd)
        fwd, bwd = pltpu.roll(Lv, N - d, axis=1), pltpu.roll(Lv, d, axis=1)
        PL = jnp.where(up, fwd, bwd)
        A = jnp.where(up, Rv, PR)
        B = jnp.where(up, PL + PR, PL)
    else:
        S = Lv + Rv
        A = jnp.where(up, Rv, pltpu.roll(Rv, d, axis=1))
        B = jnp.where(up, pltpu.roll(S, N - d, axis=1),
                      pltpu.roll(Lv, d, axis=1))
    C = chk_fn(A, B)
    return jnp.where(up, C, Rv + C)


def _bp_kernel(ch_ref, fr_ref, out_ref, Ls, Rs, *, n, N, TB, iters, chk_fn,
               early_stop_every):
    """Ls, Rs: VMEM scratch refs, n+1 each of [TB, N].  fr_ref: [1, N]."""
    ch = ch_ref[:]
    Ls[n][:] = ch
    Rs[0][:] = jnp.broadcast_to(fr_ref[:], (TB, N))
    zero = jnp.zeros((TB, N), ch.dtype)
    for i in range(n):
        Ls[i][:] = zero
        Rs[i + 1][:] = zero

    ups = [_upper_mask(i, TB, N) for i in range(n)]
    frozen = jnp.broadcast_to(fr_ref[:] > 0.0, (TB, N))

    def one_iteration():
        for i in range(n):
            Rs[i + 1][:] = _sweep_update(Rs[i][:], Ls[i + 1][:], i, ups[i],
                                         chk_fn)
        for i in range(n - 1, -1, -1):
            Ls[i][:] = _sweep_update(Ls[i + 1][:], Rs[i][:], i, ups[i],
                                     chk_fn)

    if early_stop_every:
        # G-matrix stopping rule (extension — the reference always runs
        # iterMax sweeps), checked every `early_stop_every` iterations (same
        # cadence as models/bp.bp_decode): a frame is done once its
        # re-encoded decision word equals the POSTERIOR hard decision at the
        # channel stage, sign(L[n] + R[n]) — i.e. the decoder has settled on
        # a codeword consistent with its own channel-side beliefs.  Each
        # frame's decision LATCHES at its own first passing check (`u_lat`),
        # so outputs are pure per frame — independent of tile placement and
        # of when the tile-wide loop exits; the tile loop runs until every
        # resident frame has latched (or iterMax).
        def wcond(c):
            it, donem, _ = c
            return jnp.logical_and(it < iters,
                                   jnp.logical_not(jnp.all(donem > 0.5)))

        def wbody(c):
            it, donem, u_lat = c
            one_iteration()
            u = jnp.where(frozen, 0.0,
                          (Ls[0][:] + Rs[0][:] < 0).astype(ch.dtype))
            x = _gmat_encode(u, ups, n, N)
            post_hard = (ch + Rs[n][:]) < 0.0
            ok = jnp.all((x > 0.5) == post_hard, axis=1, keepdims=True)
            okm = jnp.broadcast_to(ok, (TB, N)).astype(ch.dtype)
            check_now = ((it + 1) % early_stop_every == 0).astype(ch.dtype)
            newly = check_now * okm * (1.0 - donem)
            u_lat = newly * u + (1.0 - newly) * u_lat
            return it + 1, jnp.maximum(donem, newly), u_lat

        zf = jnp.zeros((TB, N), ch.dtype)
        _, donem, u_lat = lax.while_loop(
            wcond, wbody, (jnp.int32(0), zf, zf))
        soft = Ls[0][:] + Rs[0][:]
        u_fin = jnp.where(frozen, 0.0, (soft < 0).astype(ch.dtype))
        u = jnp.where(donem > 0.5, u_lat, u_fin)
        out_ref[:] = (u > 0.5).astype(jnp.int8)
    else:
        lax.fori_loop(0, iters, lambda _, c: (one_iteration(), c)[1], 0)
        soft = Ls[0][:] + Rs[0][:]
        out_ref[:] = jnp.where(frozen, jnp.int8(0),
                               (soft < 0).astype(jnp.int8))


def _fxor01(a, b):
    """xor of 0/1 floats."""
    return jnp.abs(a - b)


def _gmat_encode(u, ups, n, N):
    """In-kernel GF(2) re-encode of 0/1 float decisions (x = u·F^{⊗n}).

    Only UPPER lanes xor in their partner (the stage-i butterfly writes
    x[u] ^= x[l] and leaves x[l] alone), so each stage needs ONE forward
    roll — the two-roll `_pswap` exchange would compute a lower-lane value
    the select immediately discards."""
    x = u
    for i in range(n):
        px = pltpu.roll(x, N - (1 << i), axis=1)
        x = jnp.where(ups[i], _fxor01(x, px), x)
    return x


def _bp_wave_kernel(sin_ref, sout_ref, *, n, N, TB, iters, chk_fn):
    """K-iteration BP wave on persistent message state.

    sin/sout: [2(n+1), TB, N] f32 — planes 0..n are L (L[n] = channel LLRs,
    fixed), planes n+1..2n+1 are R (R[0] = frozen 999/0 row, fixed).  The
    stage-major layout makes every per-stage operand a contiguous [TB, N]
    (sublane, lane) tile — slicing the batch-major [B, S2, N] layout instead
    yields 1-sublane strided views Mosaic refuses to lower.  Runs `iters`
    flooding iterations with the whole lattice VMEM-resident; the caller owns
    convergence checks and retirement (parallel/harness.make_wave_step).
    """
    sout_ref[:] = sin_ref[:]
    ups = [_upper_mask(i, TB, N) for i in range(n)]

    def L(i):
        return sout_ref[i, :, :]

    def R(i):
        return sout_ref[n + 1 + i, :, :]

    def one_iteration():
        for i in range(n):
            sout_ref[n + 2 + i, :, :] = _sweep_update(R(i), L(i + 1), i,
                                                      ups[i], chk_fn)
        for i in range(n - 1, -1, -1):
            sout_ref[i, :, :] = _sweep_update(L(i + 1), R(i), i, ups[i],
                                              chk_fn)

    lax.fori_loop(0, iters, lambda _, c: (one_iteration(), c)[1], 0)


def _bp_wave_fused_kernel(sin_ref, llr_ref, ret_ref, sout_ref, u_ref,
                          done_ref, *, n, N, TB, iters, chk_fn, rolls=3,
                          check_every=0):
    """Refill-merge + K-iteration wave + G-matrix decide, one kernel.

    The unfused wave step pays three extra full-state XLA passes per wave
    (decide read, where-merge read+write ≈ 180 KB/frame of HBM) plus their
    dispatch; fusing them here collapses per-wave HBM traffic to one state
    read + one state write (+ a [TB, N] llr read and two [TB, N] i8 writes).

    sin/sout: [2(n+1), TB, N] f32 stage-major wave state (see
    _bp_wave_kernel).  llr: [TB, N] fresh channel LLRs for slots being
    refilled.  ret: [TB, N] f32 0/1, row-constant — 1 where the slot retired
    last wave and must be re-initialized from `llr` before advancing.  The
    R(0) frozen row is identical for every frame, so the merge touches only
    L planes 0..n and R planes 1..n.  Outputs: u_ref [TB, N] i8 hard
    decisions, done_ref [TB, N] i8 row-constant G-matrix convergence flags —
    both AFTER the K iterations, bit-identical to wave_decide on the output
    state (models/bp.py).

    check_every > 0 runs the G-matrix check INSIDE the iteration loop every
    `check_every` iterations with a per-frame latch (round-3 verdict item 3):
    a frame's (u, done) freeze at its own first passing in-wave check, so a
    frame that momentarily satisfies the rule mid-wave retires at this wave's
    boundary instead of paying further waves until a check happens to align.
    COST NOTE: the decide() runs every iteration regardless of cadence and
    is only MASKED by the cadence condition — Mosaic executes both sides of
    vector predicates — so every check_every > 0 pays the same ~2n op-rows
    per iteration (~4 %; measured ce1/ce2/ce4 all ~4-6 % slower than
    boundary-only, results/hw_queue_r4/step2.log).  The cadence changes
    decision SEMANTICS only.  Decisions remain pure per frame.
    check_every == iters is bit-identical to check_every == 0 (one
    boundary check)."""
    # selects, not arithmetic blends: 0*x can turn -0.0 into +0.0 and the
    # merge must preserve kept state bit-exactly
    rm = ret_ref[:] > 0.5
    zero = jnp.zeros_like(llr_ref[:])
    sout_ref[n, :, :] = jnp.where(rm, llr_ref[:], sin_ref[n, :, :])
    sout_ref[n + 1, :, :] = sin_ref[n + 1, :, :]  # R(0): frozen row, shared
    for i in range(n):
        sout_ref[i, :, :] = jnp.where(rm, zero, sin_ref[i, :, :])
        sout_ref[n + 2 + i, :, :] = jnp.where(rm, zero,
                                              sin_ref[n + 2 + i, :, :])

    ups = [_upper_mask(i, TB, N) for i in range(n)]

    def L(i):
        return sout_ref[i, :, :]

    def R(i):
        return sout_ref[n + 1 + i, :, :]

    def one_iteration():
        for i in range(n):
            sout_ref[n + 2 + i, :, :] = _sweep_update(R(i), L(i + 1), i,
                                                      ups[i], chk_fn, rolls)
        for i in range(n - 1, -1, -1):
            sout_ref[i, :, :] = _sweep_update(L(i + 1), R(i), i, ups[i],
                                              chk_fn, rolls)

    frozen = R(0) > 0.0
    dt = llr_ref[:].dtype

    def decide():
        """(u 0/1 f32, ok row-mask f32): G-matrix rule on current state."""
        u = jnp.where(frozen, 0.0, (L(0) + R(0) < 0).astype(dt))
        x = _gmat_encode(u, ups, n, N)
        post_hard = (L(n) + R(n)) < 0.0
        ok = jnp.all((x > 0.5) == post_hard, axis=1, keepdims=True)
        return u, jnp.broadcast_to(ok, (TB, N)).astype(dt)

    if check_every:
        def wbody(it, c):
            donem, u_lat = c
            one_iteration()
            u, okm = decide()
            # the wave boundary always checks, whatever the cadence
            do = jnp.logical_or((it + 1) % check_every == 0,
                                it + 1 == iters).astype(dt)
            newly = do * okm * (1.0 - donem)
            u_lat = newly * u + (1.0 - newly) * u_lat
            return jnp.maximum(donem, newly), u_lat

        zf = jnp.zeros((TB, N), dt)
        donem, u_lat = lax.fori_loop(0, iters, wbody, (zf, zf))
        u_fin, _ = decide()
        u = jnp.where(donem > 0.5, u_lat, u_fin)
        u_ref[:] = (u > 0.5).astype(jnp.int8)
        done_ref[:] = (donem > 0.5).astype(jnp.int8)
    else:
        lax.fori_loop(0, iters, lambda _, c: (one_iteration(), c)[1], 0)
        u, okm = decide()
        u_ref[:] = (u > 0.5).astype(jnp.int8)
        done_ref[:] = (okm > 0.5).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("iters", "flavor", "tile", "interpret", "rolls",
                              "check_every")
)
def bp_wave_fused_pallas(state, llr, retire, iters: int = 8,
                         flavor: str = "minsum_lut", tile: int = 0,
                         interpret: bool = False, rolls: int = 3,
                         check_every: int = 0):
    """Fused wave advance: (state, fresh llr, retire mask) ->
    (state', u_hat i8, done i8 [B] row flags).  retire: [B] bool.
    rolls=4 keeps the superseded two-roll-exchange sweep formulation
    reachable for the HW A/B (bit-identical outputs either way).
    check_every > 0: in-wave G-checks with a per-frame latch (see
    _bp_wave_fused_kernel)."""
    S2, B, N = state.shape
    n = S2 // 2 - 1
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    if tile == 0:
        # 6 MB state budget: admits TB=64 at N=1024, the measured optimum
        # (kernel-only slot-wave A/B, results/hw_queue_r5/step14: TB64
        # 583.8k vs TB32 554.7k (+5.2%) vs TB16 501.0k; N=128 default
        # unchanged at 256).  Tile size cannot change results: outputs are
        # pure per frame (see _bp_wave_fused_kernel), pinned by
        # test_wave_fused_tile_independence.
        budget = 6 * 1024 * 1024
        cap = max(8, budget // (S2 * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 256) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)
    ret_f = jnp.broadcast_to(retire.astype(state.dtype)[:, None], (B, N))
    kernel = functools.partial(
        _bp_wave_fused_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn,
        rolls=rolls, check_every=check_every,
    )
    state, u_hat, done = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S2, B, N), state.dtype),
            jax.ShapeDtypeStruct((B, N), jnp.int8),
            jax.ShapeDtypeStruct((B, N), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        # state updates in place: without this XLA materializes a fresh
        # [2(n+1), B, N] output and COPIES the 1.5 GB state every wave —
        # measured 10.9% of device time (scripts/profile_wave.py, r3)
        input_output_aliases={0: 0},
        interpret=interpret,
    )(state, llr, ret_f)
    return state, u_hat, done[:, 0].astype(bool)


def _bp_wave_mc_kernel(state_in, meta_in, utab_ref, xtab_ref, sig_ref,
                       seed_ref, bits_ref, state, meta, stats_ref, *, n, N,
                       TB, iters, chk_fn, rolls, iter_max, delta, gen_bits,
                       drain, spares, cadence, bit_gen):
    """Fully in-kernel Monte-Carlo wave: refill GENERATION + merge + K
    iterations + cadenced G-matrix retirement + error counting, one kernel
    — the round-4 verdict's "in-kernel MC refill" lever.  The XLA side of
    a step shrinks to summing this kernel's per-slot counters.

    Why the refill can live in-kernel: payloads depend only on the PN window
    offset m in {0..62} (SC_128.c:179-181 — 63 distinct payloads, hence 63
    distinct codewords).  utab_ref/xtab_ref [128, N] carry every possible
    true-u row and its ENCODED codeword; a one-hot(m) @ table matmul on the
    otherwise-idle MXU materializes both EXACTLY (one 1.0 per row; f32
    accumulation of a single product is exact).  The channel is BPSK +
    sigma * N(0,1) with the Gaussian built from raw PRNG bits
    (ops/noise.py — the same erfinv construction jax.random.normal uses).
    Bits come from pltpu.prng_random_bits seeded per (seed, step, tile)
    when gen_bits, else from `bits_ref` (threefry bits generated XLA-side —
    the CPU-testable and statistically conservative mode).

    MXU offload is the load-bearing optimization (r5): the first, VPU-only
    version spent ~0.37 iteration-equivalents PER CHECK in lane reductions
    (jnp.all/jnp.max over 1024 lanes) and sublane-broadcast select chains,
    erasing the retirement gain entirely (319.7k vs fused 325.3k,
    results/hw_queue_r5/step1).  Here every lane reduction is a
    [TB, N] @ [N, 128] ones-matrix matmul, the payload/codeword selects are
    one-hot matmuls, and ALL per-slot flag arithmetic runs at [TB, 128]
    width (8x fewer lanes), broadcast to [TB, N] only where a plane merge
    needs a mask.

    Retirement semantics (vs the boundary-only fused kernel): `spares`
    fresh frame GENERATIONS per slot (gen g = payload offset m + (g+1)*
    delta) are built at the head.  Every `cadence` iterations (and always
    at the wave boundary) the G-check runs; a done frame whose slot still
    has a generation left retires IMMEDIATELY (counted with its current
    decision) and the slot restarts on the next generation in place —
    E[paid iterations] drops from E[ceil(X/K)]*K (~16 at 2 dB) toward
    E[X].  Slots arriving `pending` consume generation 0 in the head merge
    (the fused kernel's head-merge pattern).  A done frame with no
    generation left keeps sweeping to the wave boundary, where it retires
    into `pending` for the next head.  Frames at iter_max retire the same
    ways.  spares >= 2 matters: with one, a head-refilled frame could
    never retire mid-wave in its own entry wave and E[paid] degenerates to
    E[max(X, K)].

    meta planes (f32, lane-broadcast where scalar): 0 = m of the current
    frame, 1 = true-u row of the current frame, 2 = iterations done,
    3 = pending (drain mode: dead).  Slot s's frame sequence is
    m0(s), m0(s)+delta, ... (delta = (B * (K%63)) % 63, slot-strided frame
    indices s, s+B, s+2B, ...) — payloads stay a pure function of the frame
    index; the noise a frame receives is the spare of the wave it entered,
    deterministic in (seed, B, tile, K, step) but — unlike the XLA wave
    engine — not a function of frame index alone.  Opt-in engine,
    BLER-qualified like chk_fast/R1 (docs/ROOFLINE.md).

    stats_ref [TB, 128]: lane 0 = errbit, 1 = errblock, 2 = frames retired
    (per slot, this wave).  drain=True: no refills, `pending` marks dead
    slots; live frames run to retirement over successive drain calls.
    """
    f32 = jnp.float32
    ups = [_upper_mask(i, TB, N) for i in range(n)]
    zero = jnp.zeros((TB, N), f32)
    z128 = jnp.zeros((TB, 128), f32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 1).astype(f32)
    ones_red = jnp.ones((N, 128), f32)  # lane-reduction matrix (MXU)
    REP = N // 128

    def b128(x):
        """[TB, 128] per-slot values -> [TB, N] lane-replicated."""
        return x if REP == 1 else jnp.concatenate([x] * REP, axis=1)

    def dotf(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # per-slot scalar planes live at [TB, 128]; meta I/O is lane-broadcast
    m_in = meta_in[0, :, 0:128]
    u_in = meta_in[1, :, :]
    it_in = meta_in[2, :, 0:128]
    pend_in = meta_in[3, :, 0:128]

    # ---- spare-generation build (once per wave): gens g = 0..spares-1 ----
    sigma = sig_ref[0, 0]
    inv_s = 1.0 / sigma
    cB = 2.0 * inv_s
    if gen_bits and bit_gen == "hw":
        # Mosaic caps prng_seed at 2 values: fold (step, tile) into one —
        # unique while step < 2^18 with grids up to 8192 tiles.  NOTE: this
        # sequentially-seeded hardware stream measured BLER-deficient at
        # the 3.5 dB tail (results/hw_queue_r5/step8-9) — kept only for the
        # A/B record; production bit_gen is the counter-based "tf32".
        pltpu.prng_seed(seed_ref[0, 2],
                        seed_ref[0, 3] * jnp.int32(8192) + pl.program_id(0))
    if gen_bits and bit_gen == "tf32":
        # counter-based threefry2x32 (ops/noise.py — bit-exact vs jax's):
        # key = the run key words, counter = (step*spares + gen,
        # global element index): bits are a pure function of
        # (seed, step, slot, gen) — tile-size-independent
        # Mosaic bitcasts/conversions need VECTOR operands: broadcast the
        # SMEM scalars to planes before going unsigned
        u32 = jnp.uint32
        zi = jnp.zeros((TB, N), jnp.int32)
        tf_k0 = (zi + seed_ref[0, 0]).astype(u32)
        tf_k1 = (zi + seed_ref[0, 1]).astype(u32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TB, N), 0)
                + pl.program_id(0) * TB)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)
        tf_clo = (rows * N + lanes).astype(u32)
    # MXU dispatches carry ~us-scale latency each at TB=32 (measured:
    # 2 dots/check ~ 0.3 iteration-equivalents), so dots are BATCHED:
    # one stacked one-hot matmul selects every generation's payload row AND
    # codeword row ([spares*TB, 128] @ [128, 2N]).
    m_g, u_g, llr_g, ohs = [], [], [], []
    for g in range(spares):
        dm = f32(((g + 1) * delta) % 63)
        mg = m_in + dm
        mg = jnp.where(mg >= 63.0, mg - 63.0, mg)  # [TB, 128]
        m_g.append(mg)
        ohs.append((mg == lane128).astype(f32))  # one-hot over table rows
    tabs = jnp.concatenate([utab_ref[:, :], xtab_ref[:, :]], axis=1)
    rows = dotf(jnp.concatenate(ohs, axis=0), tabs)  # exact row selects
    for g in range(spares):
        ug = rows[g * TB:(g + 1) * TB, 0:N]
        xg = rows[g * TB:(g + 1) * TB, N:2 * N]
        if gen_bits and bit_gen == "tf32":
            c_hi = (zi + (seed_ref[0, 3] * jnp.int32(spares)
                          + jnp.int32(g))).astype(jnp.uint32)
            bits, _ = threefry2x32(tf_k0, tf_k1, c_hi, tf_clo)
        elif gen_bits:
            bits = pltpu.prng_random_bits((TB, N))
        else:
            bits = bits_ref[g, :, :]
        z = gaussian_from_bits(bits)
        # LLR = 2y/sigma^2 = (2/sigma) * ((1-2x)/sigma + z), with the BPSK
        # sign via a SELECT and the scale applied after the add: no a*b+c
        # pattern, so XLA FMA contraction cannot make the kernel and the
        # jnp twin disagree on the merged llr plane (tests pin equality)
        sgn = jnp.where(xg > 0.5, -inv_s, inv_s)
        u_g.append(ug)
        llr_g.append(cB * (sgn + z))

    # ---- head merge: refill pending slots (consuming gen 0) --------------
    rm128 = (jnp.zeros((TB, 128), bool) if drain else (pend_in > 0.5))
    rmN = b128(rm128)
    state[n, :, :] = jnp.where(rmN, llr_g[0], state_in[n, :, :])
    state[n + 1, :, :] = state_in[n + 1, :, :]  # R(0): frozen row, shared
    for i in range(n):
        state[i, :, :] = jnp.where(rmN, zero, state_in[i, :, :])
        state[n + 2 + i, :, :] = jnp.where(rmN, zero,
                                           state_in[n + 2 + i, :, :])
    m_c = jnp.where(rm128, m_g[0], m_in)
    u_c = jnp.where(rmN, u_g[0], u_in)
    it_c = jnp.where(rm128, z128, it_in)
    rmf = rm128.astype(f32)
    avail = z128 if drain else f32(spares) - rmf  # generations left
    ptr = rmf  # next generation to consume
    pend_c = pend_in if drain else z128

    def L(i):
        return state[i, :, :]

    def R(i):
        return state[n + 1 + i, :, :]

    def one_iteration():
        for i in range(n):
            state[n + 2 + i, :, :] = _sweep_update(R(i), L(i + 1), i,
                                                   ups[i], chk_fn, rolls)
        for i in range(n - 1, -1, -1):
            state[i, :, :] = _sweep_update(L(i + 1), R(i), i, ups[i],
                                           chk_fn, rolls)

    frozen = R(0) > 0.0

    def decide():
        """(u [TB, N] 0/1, ok [TB, 128] 0/1): G-matrix rule, reduction on
        the MXU (mismatch count = mism @ ones)."""
        u = jnp.where(frozen, 0.0, (L(0) + R(0) < 0).astype(f32))
        x = _gmat_encode(u, ups, n, N)
        post = ((L(n) + R(n)) < 0.0).astype(f32)
        mism = jnp.abs(x - post)
        cnt = dotf(mism, ones_red)
        return u, (cnt < 0.5).astype(f32)

    # Unrolled iteration loop (no lax.fori_loop): unrolling keeps the
    # per-slot bookkeeping in SSA values instead of loop carries and makes
    # the retire-check CADENCE static — iterations without a check emit
    # zero decide/merge/count code.  cadence divides the machinery cost by
    # c at the price of up to c-1 extra paid iterations per frame; the
    # wave boundary always checks.
    # per-EVENT bad accumulators: a slot retires at most once per
    # generation pointer value (mid-wave events at ptr 0..spares-1, the
    # boundary event at ptr == spares), so accumulating each event's bad
    # row into acc[ptr] keeps events separable — the errbit AND errblock
    # reductions then collapse into ONE stacked MXU dot at the wave end
    # instead of one dot per check
    accs = [zero for _ in range(spares + 1)]
    fr = z128
    since = 0
    for it in range(iters):
        one_iteration()
        since += 1
        last = it == iters - 1
        if not ((it + 1) % cadence == 0 or last):
            continue
        alive = 1.0 - pend_c  # non-drain: pend only set on the last iter
        it_c = it_c + f32(since) * alive
        since = 0
        u, ok = decide()
        done = jnp.maximum(ok, (it_c >= f32(iter_max)).astype(f32)) * alive
        has = (avail > 0.5).astype(f32)
        retire_now = done * has
        retire = retire_now if not last else (
            retire_now + done * (1.0 - has))
        bad = jnp.abs(u - u_c) * b128(retire)  # frozen lanes agree (both 0)
        for e in range(spares + 1):
            pick_e = b128((ptr == f32(e)).astype(f32))
            accs[e] = accs[e] + bad * pick_e
        fr = fr + retire
        # in-place refill of immediately-retiring slots from the next gen
        m_nx, u_nx, llr_nx = m_g[0], u_g[0], llr_g[0]
        for g in range(1, spares):
            pick = ptr == f32(g)
            pickN = b128(pick)
            m_nx = jnp.where(pick, m_g[g], m_nx)
            u_nx = jnp.where(pickN, u_g[g], u_nx)
            llr_nx = jnp.where(pickN, llr_g[g], llr_nx)
        rm2 = retire_now > 0.5
        rm2N = b128(rm2)
        state[n, :, :] = jnp.where(rm2N, llr_nx, state[n, :, :])
        for i in range(n):
            state[i, :, :] = jnp.where(rm2N, zero, state[i, :, :])
            state[n + 2 + i, :, :] = jnp.where(rm2N, zero,
                                               state[n + 2 + i, :, :])
        m_c = jnp.where(rm2, m_nx, m_c)
        u_c = jnp.where(rm2N, u_nx, u_c)
        it_c = jnp.where(rm2, z128, it_c)
        ptr = ptr + retire_now
        avail = avail - retire_now
        if last:
            pend_c = jnp.maximum(pend_c, done * (1.0 - has))

    meta[0, :, :] = b128(m_c)
    meta[1, :, :] = u_c
    meta[2, :, :] = b128(it_c)
    meta[3, :, :] = b128(pend_c)
    cnts = dotf(jnp.concatenate(accs, axis=0), ones_red)  # [(sp+1)*TB, 128]
    eb_sum = z128
    ebl = z128
    for e in range(spares + 1):
        cnt_e = cnts[e * TB:(e + 1) * TB, :]
        eb_sum = eb_sum + cnt_e
        ebl = ebl + (cnt_e > 0.5).astype(f32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
    stats_ref[:] = (jnp.where(lane_i == 0, eb_sum, 0.0)
                    + jnp.where(lane_i == 1, ebl, 0.0)
                    + jnp.where(lane_i == 2, fr, 0.0))


@functools.partial(
    jax.jit, static_argnames=("iters", "flavor", "tile", "interpret", "rolls",
                              "iter_max", "delta", "gen_bits", "drain",
                              "spares", "cadence", "bit_gen")
)
def bp_wave_mc_pallas(state, meta, u_table, x_table, sigma, seeds,
                      bits=None,
                      iters: int = 8, flavor: str = "minsum_lut",
                      tile: int = 0, interpret: bool = False, rolls: int = 3,
                      iter_max: int = 100, delta: int = 0,
                      gen_bits: bool = True, drain: bool = False,
                      spares: int = 2, cadence: int = 1,
                      bit_gen: str = "tf32"):
    """In-kernel-MC wave advance (see _bp_wave_mc_kernel).

    state [2(n+1), B, N] f32; meta [4, B, N] f32; u_table/x_table [128, N]
    f32 (payload rows and their encoded codewords, models/bp.mc_tables);
    sigma f32 scalar; seeds [2] i32 (run seed, step counter — folded with
    the tile id into the in-kernel PRNG); bits [spares, B, N] uint32/int32
    required iff not gen_bits.  Returns (state', meta', stats [B, 128] f32
    — lanes 0/1/2 = per-slot errbit/errblock/frames-retired this wave)."""
    S2, B, N = state.shape
    n = S2 // 2 - 1
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    if tile == 0:
        budget = 3 * 1024 * 1024 + 512 * 1024
        cap = max(8, budget // ((S2 + 4) * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 256) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)
    if not gen_bits:
        assert bits is not None and bits.shape == (spares, B, N), bits
    else:
        bits = jnp.zeros((1, 8, N), jnp.int32)  # placeholder block (unread)
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)
    seed_arr = jnp.asarray(seeds, jnp.int32).reshape(1, 4)
    kernel = functools.partial(
        _bp_wave_mc_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn,
        rolls=rolls, iter_max=iter_max, delta=delta, gen_bits=gen_bits,
        drain=drain, spares=spares, cadence=cadence, bit_gen=bit_gen,
    )
    bits_spec = (pl.BlockSpec((1, 8, N), lambda g: (0, 0, 0),
                              memory_space=pltpu.VMEM) if gen_bits else
                 pl.BlockSpec((spares, tile, N), lambda g: (0, g, 0),
                              memory_space=pltpu.VMEM))
    state, meta, stats = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, N), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, N), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            bits_spec,
        ],
        out_specs=[
            pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S2, B, N), state.dtype),
            jax.ShapeDtypeStruct((4, B, N), meta.dtype),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(state, meta, u_table, x_table, sig, seed_arr, bits)
    return state, meta, stats


@functools.partial(
    jax.jit, static_argnames=("iters", "flavor", "tile", "interpret")
)
def bp_wave_pallas(state, iters: int = 8, flavor: str = "minsum_lut",
                   tile: int = 0, interpret: bool = False):
    """Advance persistent BP state [2(n+1), B, N] f32 by `iters` iterations.
    Same per-iteration semantics as bp_decode_pallas / models/bp.bp_iteration
    (BP_128.c:355-377 sweep order)."""
    S2, B, N = state.shape
    n = S2 // 2 - 1
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    if tile == 0:
        # in + out blocks both live in VMEM (plus pipeline double-buffering):
        # keep 4 x S2 x tile x N f32 within ~12 MB
        budget = 3 * 1024 * 1024
        cap = max(8, budget // (S2 * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 256) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)
    kernel = functools.partial(
        _bp_wave_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn
    )
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S2, tile, N), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S2, B, N), state.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        input_output_aliases={0: 0},  # in-place state (see fused variant)
        interpret=interpret,
    )(state)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "flavor", "tile", "interpret",
                     "early_stop_every"),
)
def bp_decode_pallas(
    ch_llr,
    frozen,
    iters: int = 100,
    flavor: str = "minsum_lut",
    tile: int = 0,
    interpret: bool = False,
    early_stop_every: int = 0,
):
    """Pallas BP decode.  ch_llr: [B, N] f32; frozen: [N] bool.
    Returns u_hat [B, N] int8.  B must be a multiple of the tile (default:
    auto-pick to fit ~2 x (n+1) x TB x N f32 of scratch in VMEM)."""
    B, N = ch_llr.shape
    n = N.bit_length() - 1
    chk_fn = {"minsum_lut": chk, "minsum_lut_fast": chk_fast,
              "spa": chk_exact}[flavor]
    if tile == 0:
        # 2 scratch arrays of (n+1) x TB x N f32 within ~8 MB; pick the
        # largest power-of-two divisor of B that fits (>= 8 sublanes)
        budget = 8 * 1024 * 1024
        cap = max(8, budget // (2 * (n + 1) * N * 4))
        tile = 8
        while tile * 2 <= min(cap, 256) and B % (tile * 2) == 0:
            tile *= 2
        tile = min(tile, B)
    assert B % tile == 0, (B, tile)

    fr_row = jnp.where(frozen, jnp.asarray(999.0, ch_llr.dtype), 0.0)[None, :]

    kernel = functools.partial(
        _bp_kernel, n=n, N=N, TB=tile, iters=iters, chk_fn=chk_fn,
        early_stop_every=early_stop_every,
    )
    scratch = [pltpu.VMEM((tile, N), ch_llr.dtype) for _ in range(2 * (n + 1))]

    def wrapped(ch_ref, fr_ref, out_ref, *scratches):
        Ls = list(scratches[: n + 1])
        Rs = list(scratches[n + 1 :])
        kernel(ch_ref, fr_ref, out_ref, Ls, Rs)

    return pl.pallas_call(
        wrapped,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ch_llr, fr_row)
