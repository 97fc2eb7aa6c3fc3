"""Headline benchmark: decoded frames/s on the two north-star configs.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...detail}.

BASELINE.json names BOTH BP and SCL L=8 at N=1024 ("decoded frames/s ...
(BP and SCL L=8, N=1024)"), so this measures both full Monte-Carlo pipelines
and reports vs_baseline on the WORSE of the two — the headline cannot hide
the slower decoder.  The reference itself publishes no throughput numbers
(no timing code exists — SURVEY §6); the 1e7 frames/s target is the
aggregate multi-host north star, which composes near-linearly from the
single-chip rates measured here (the only cross-chip communication is the
psum of two scalar counters per super-batch).

The BP component is the continuous-batching early-stop engine (each frame
retires at its own convergence wave) — BASELINE.json's north star names the
BP configuration as "with R/L message arrays and early-stopping", and this
is its production form (per-frame-pure decisions, unbiased MC counting,
BLER validated against the reference tables in tests/results).

The per-chip -> aggregate north-star projection (how to read vs_baseline,
what the communication model is, and the multi-process evidence) is
documented in docs/SCALING.md.  The fixed
100-sweep rate — the reference's literal iteration count, and the number a
frame-for-frame golden replay pays — is reported alongside as
bp_1024_fixed100_fps with its own vs_baseline_fixed_iters, so neither view
hides the other.  SCL uses full N-step list decode semantics (no shortcuts
exist there).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

# persistent compile cache: the K=32 mc wave kernel alone is a ~9 min
# Mosaic compile through the tunnel (results/hw_queue_r5/step13)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

# sitecustomize may pre-import jax, making the env var too late (CLAUDE.md
# "Environment") — the config update works either way
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
from jax import lax

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import (
    make_frame_step,
    make_wave_step,
    make_wave_step_mc,
)
from polardecoding_tpu.parallel.mesh import data_mesh

BASELINE_FRAMES_PER_SEC = 1e7


def bench_step(preset_name, batch, snr_db=2.0, iters=5, warmup=2,
               profile_dir=None, mesh=None, encoder="mxu",
               channel="threefry"):
    """frames/s of the full MC pipeline (gen + encode + channel + decode +
    count) for one preset at one SNR.  channel="mc" uses the in-kernel MC
    channel generator (ops/pallas/channel_kernel.py)."""
    p = preset(preset_name)
    mesh = mesh or data_mesh()
    step = make_frame_step(p, batch=batch, mesh=mesh, encoder=encoder,
                           channel=channel)
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-snr_db / 20.0))

    # Timing discipline: `block_until_ready` does not reliably block through
    # the remote-device tunnel; forcing a scalar to host (int()) is the only
    # trustworthy sync, and is what both ends of every timed region use.
    for i in range(warmup):
        int(step(key, jnp.int32(i * batch), sigma)[0])

    if profile_dir:
        # jax.profiler traces replace the reference's "no tracing at all"
        # (SURVEY §5): per-kernel timelines viewable in tensorboard/xprof
        ctx = jax.profiler.trace(profile_dir)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        outs = [step(key, jnp.int32((warmup + i) * batch), sigma)
                for i in range(iters)]
        # device executes dispatches in order: reducing every step's counter
        # to one host scalar proves all `iters` steps finished
        int(sum(o[0] for o in outs))
        dt = time.perf_counter() - t0
    return (iters * batch) / dt


def bench_waves(preset_name="BP_1024", batch=16384, snr_db=2.0, wave_iters=8,
                steps=12, warmup=3, mesh=None, fused=True, encoder="mxu",
                check_every=0, steps_per_call=8, engine="fused",
                noise="kernel", cadence=1, itermax=0):
    """Steady-state retired frames/s of the continuous-batching BP engine.

    Steps run `steps_per_call` per jit dispatch via lax.scan (counters
    summed on device), mirroring the production run_point_waves chunking:
    the tunnel sustains one dispatch per ~24 ms (scripts/probe_floor3.py),
    so per-step dispatches clip small-K configs and cost the production
    K=8 config ~4%% (324.8k scan-batched vs 311.5k per-step,
    results/hw_queue_r4/step13.log).

    engine="mc" selects the in-kernel-MC stepper (refill generation +
    per-iteration retirement + counting inside the Mosaic kernel,
    make_wave_step_mc); `noise` picks its bit source."""
    p = preset(preset_name)
    if itermax:
        import dataclasses

        p = dataclasses.replace(
            p, name=f"{p.name}_I{itermax}",
            decoder=dataclasses.replace(p.decoder, bp_iters=itermax))
    mesh = mesh or data_mesh()
    if engine == "mc":
        init, step, _ = make_wave_step_mc(p, batch, wave_iters, noise=noise,
                                          cadence=cadence)
    else:
        init, step, _ = make_wave_step(p, batch, wave_iters, mesh,
                                       fused=fused, encoder=encoder,
                                       check_every=check_every)
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-snr_db / 20.0))

    @functools.partial(jax.jit, donate_argnums=(2,))
    def chunk(key, sigma, carry):
        def body(c, _):
            c2, out = step(key, sigma, c)
            return c2, out

        carry, (eb, ebl, fr) = lax.scan(body, carry, None,
                                        length=steps_per_call)
        return carry, jnp.sum(fr)

    carry = init(key, jnp.int32(0), sigma)
    last = None
    for _ in range(warmup):
        carry, last = chunk(key, sigma, carry)
    if last is not None:
        int(last)  # host-forced sync: warmup complete
    t0 = time.perf_counter()
    frs = []
    for _ in range(steps):
        carry, fr = chunk(key, sigma, carry)
        frs.append(fr)
    # one lazy device-side sum, one host readback: the chunks pipeline
    # back-to-back instead of serializing on a tunnel round-trip each
    frames = int(sum(frs))
    return frames / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bp-batch", type=int, default=8192)
    # measured best batches (r3 queue step8: SCL 16384 = 308.5k vs 293.3k at
    # 8192 with the fast kernel; step3/5: wave 16384 fused K=8 best)
    ap.add_argument("--scl-batch", type=int, default=16384)
    ap.add_argument("--wave-batch", type=int, default=16384)
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--profile", nargs="?", const="/tmp/pd_trace", default=None)
    ap.add_argument("--skip-wave", action="store_true")
    ap.add_argument("--unfused-wave", action="store_true",
                    help="disable the fused refill+wave+decide kernel "
                         "(default on: measured 1.12x, hw_queue_r2 step3)")
    ap.add_argument("--prng", choices=("threefry", "rbg"), default="threefry",
                    help="PRNG impl for channel noise.  rbg (TPU "
                         "RngBitGenerator) measures +3.1%% wave fps but is "
                         "REJECTED as a default: at 6.5k error blocks its "
                         "BP_128 wave BLER reads 0.0907 vs threefry's "
                         "0.1113 (reference 0.1127) — the per-frame "
                         "fold_in rbg streams are statistically deficient "
                         "(docs/ROOFLINE.md, tried-and-rejected)")
    ap.add_argument("--encoder", choices=("mxu", "butterfly"), default="mxu",
                    help="refill/codeword encoder: GF(2) matmul on the MXU "
                         "(default; bit-identical codewords, measured faster "
                         "— docs/ROOFLINE.md 'encode on the MXU') or the "
                         "butterfly xor-stage path")
    ap.add_argument("--wave-k", type=int, default=0,
                    help="wave_iters K (0 = per-engine default: 8 fused, "
                         "32 mc — the r5 A/B optimum)")
    ap.add_argument("--wave-cadence", type=int, default=2,
                    help="mc-engine retire-check cadence (r5 A/B: c2 best)")
    ap.add_argument("--wave-itermax", type=int, default=0,
                    help="override the preset's BP iterMax for the wave leg "
                         "(0 = preset value).  REJECTED as a default: +12%% "
                         "fps at iterMax=48 but window BLER 0.0337 vs "
                         "0.0274 — a materially worse decoder "
                         "(results/hw_queue_r5/step13, docs/ROOFLINE.md)")
    ap.add_argument("--channel", choices=("threefry", "mc"),
                    default="threefry",
                    help="frame-step channel: production threefry or the "
                         "in-kernel MC channel kernel (qualified flavor)")
    ap.add_argument("--wave-engine", choices=("fused", "mc"),
                    default="mc",
                    help="wave stepper: the in-kernel-MC v3 engine "
                         "(cadenced in-kernel retirement + refill + "
                         "counting; qualified r5 — tail BLER ratio 0.956, "
                         "2.0 dB 0.946 from earlier retirement, "
                         "results/hw_queue_r5/step10) or the fused "
                         "boundary-retirement engine (the conservative "
                         "configuration run_point sweeps use)")
    ap.add_argument("--wave-noise", choices=("kernel", "hw", "threefry"),
                    default="kernel",
                    help="mc engine bit source: in-kernel counter-based "
                         "threefry2x32 (default; production-generator "
                         "statistics), the pltpu hardware PRNG (FAILED the "
                         "tail qualification — A/B record only), or "
                         "XLA-side threefry bit arrays")
    ap.add_argument("--wave-check-every", type=int, default=0,
                    help="in-wave G-check cadence with per-frame latch "
                         "(0 = boundary-only); candidate r4 default pending "
                         "the HW A/B + BLER validation")
    ap.add_argument("--wave-preset", default="BP_1024_FASTCHK",
                    help="wave-engine preset; the default is the production "
                         "chk_fast flavor (A/B: +6%% throughput, BLER clean "
                         "at 1000 error blocks, hw_queue_r2 step4); pass "
                         "BP_1024 for the exact-LUT golden-parity flavor")
    ap.add_argument("--scl-preset", default="SCL_1024_L8_FASTR1",
                    help="SCL headline preset; the default is the "
                         "production bounded-fork R1 flavor (+28.7%% "
                         "kernel-only, BLER clean at 1000 error blocks on "
                         "three configs — configs.py FASTR1 block); pass "
                         "SCL_1024_L8 for the exact golden-parity kernel")
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl",
                      {"threefry": "threefry2x32", "rbg": "rbg"}[args.prng])

    bp_fixed_fps = bench_step("BP_1024", args.bp_batch, args.snr, args.iters,
                              args.warmup, profile_dir=args.profile,
                              encoder=args.encoder)
    scl_fps = bench_step(args.scl_preset, args.scl_batch, args.snr,
                         args.iters, args.warmup, encoder=args.encoder,
                         channel=args.channel)
    # the exact-semantics SCL leg under its own stable key, so round-over-
    # round comparisons never silently mix the exact decoder with the
    # qualified FASTR1 flavor (advisor r4)
    scl_exact_fps = (scl_fps if args.scl_preset == "SCL_1024_L8" else
                     bench_step("SCL_1024_L8", args.scl_batch, args.snr,
                                args.iters, args.warmup,
                                encoder=args.encoder))
    bp_wave_fps = None
    if not args.skip_wave:
        wave_k = args.wave_k or (32 if args.wave_engine == "mc" else 8)
        bp_wave_fps = bench_waves(args.wave_preset, args.wave_batch, args.snr,
                                  wave_iters=wave_k,
                                  fused=not args.unfused_wave,
                                  encoder=args.encoder,
                                  check_every=args.wave_check_every,
                                  engine=args.wave_engine,
                                  noise=args.wave_noise,
                                  cadence=args.wave_cadence,
                                  itermax=args.wave_itermax)

    bp_fps = bp_fixed_fps if bp_wave_fps is None else bp_wave_fps
    worst = min(bp_fps, scl_fps)
    rec = {
        "metric": "decoded frames/s at N=1024, 1 chip — min(BP early-stop "
                  "wave engine, SCL L=8), full MC pipeline at "
                  f"{args.snr:g} dB",
        "value": round(worst, 1),
        "unit": "frames/s",
        "vs_baseline": round(worst / BASELINE_FRAMES_PER_SEC, 4),
        "bp_1024_wave_fps": None if bp_wave_fps is None
        else round(bp_wave_fps, 1),
        "wave_preset": None if bp_wave_fps is None else args.wave_preset,
        "wave_engine": None if bp_wave_fps is None else args.wave_engine,
        "wave_itermax": None if bp_wave_fps is None
        else (args.wave_itermax or preset(args.wave_preset).decoder.bp_iters),
        "bp_1024_fixed100_fps": round(bp_fixed_fps, 1),
        # the SCL leg is labeled by its preset — the default is the
        # BLER-qualified FASTR1 throughput flavor, NOT the exact
        # golden-parity decoder, so the key carries the preset name; the
        # exact decoder's rate is ALWAYS emitted under its stable key too
        "scl_preset": args.scl_preset,
        "scl_fps": round(scl_fps, 1),
        "scl_1024_l8_fps": round(scl_exact_fps, 1),
        "vs_baseline_fixed_iters": round(
            min(bp_fixed_fps, scl_fps) / BASELINE_FRAMES_PER_SEC, 4),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
