"""A/B of the default minsum_lut chk vs the opt-in minsum_lut_fast flavor
(`0.5(|a+b|-|a-b|) + lut(|a+b|) - lut(|a-b|)`, ~11% fewer VPU ops — see
docs/ROOFLINE.md "chk_fast").

Two phases, both required before any default flip:

  --perf (default)  interleaved best-of-reps full-MC throughput, fixed-100
                    and wave engines (ab_scl.py methodology: >=1 s windows,
                    round-robin reps, best-of per variant).
  --bler            1000-error-block BLER A/B at a high table SNR (where a
                    rounding change would surface) on the wave engine, both
                    N.  On the real chip this is minutes; on CPU hours —
                    use --bler-snr 2.0 for a CPU-feasible check.

Usage: python scripts/ab_chkfast.py [--perf] [--bler] [--bler-snr 4.0]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

if os.environ.get("AB_CPU"):
    # must be the config update, not just the env var — see CLAUDE.md
    # (axon PJRT init can hang any backend query while the tunnel is down)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import bench_step, bench_waves  # noqa: E402
import polardecoding_tpu.configs as cfg  # noqa: E402
from polardecoding_tpu.configs import preset  # noqa: E402
from polardecoding_tpu.parallel.harness import run_point_waves  # noqa: E402


def register_fast_twin(name):
    """<name>_FASTCHK: same preset with bp_flavor=minsum_lut_fast.  The twins
    for BP_128/BP_1024 are first-class presets since the round-2 A/B landed
    (configs.py); this keeps working for any other preset name."""
    fast = name + "_FASTCHK"
    if fast in cfg.PRESETS:
        return fast
    p = preset(name)
    fp = dataclasses.replace(
        p,
        name=fast,
        decoder=dataclasses.replace(p.decoder, bp_flavor="minsum_lut_fast"),
    )
    cfg.PRESETS[fp.name] = fp
    return fp.name


def perf_ab():
    best = {}
    fast = register_fast_twin("BP_1024")
    for rep in range(3):
        for name in ("BP_1024", fast):
            fps = bench_step(name, 8192, 2.0, iters=5,
                             warmup=(2 if rep == 0 else 1))
            best[name] = max(best.get(name, 0.0), fps)
            print(json.dumps({"engine": "fixed100", "preset": name,
                              "rep": rep, "fps": round(fps, 1)}), flush=True)
    for rep in range(3):
        for name in ("BP_1024", fast):
            fps = bench_waves(name, 8192, 2.0, steps=16,
                              warmup=(4 if rep == 0 else 2))
            best["wave_" + name] = max(best.get("wave_" + name, 0.0), fps)
            print(json.dumps({"engine": "wave", "preset": name, "rep": rep,
                              "fps": round(fps, 1)}), flush=True)
    print(json.dumps({
        "AB": {k: round(v, 1) for k, v in best.items()},
        "fixed_x": round(best[fast] / best["BP_1024"], 3),
        "wave_x": round(best["wave_" + fast] / best["wave_BP_1024"], 3),
    }), flush=True)


def bler_ab(snr_db, error_blocks=1000, max_frames=30_000_000):
    """Wave-engine BLER of default vs fast chk at one SNR, both N.

    Frames are pure functions of (seed, frame index), so both flavors decode
    the SAME noisy frames — the comparison is paired, and the reported ratio
    carries ~sqrt(2/errors) relative sigma (upper bound; paired sampling
    makes it tighter)."""
    out = {}
    for base in ("BP_128", "BP_1024"):
        fast = register_fast_twin(base)
        for name in (base, fast):
            r = run_point_waves(preset(name), snr_db,
                                error_blocks=error_blocks,
                                max_frames=max_frames)
            out[name] = r
            print(json.dumps({"preset": name, "snr_db": snr_db,
                              "frames": r.frames, "errblock": r.errblock,
                              "bler": r.bler}), flush=True)
        ratio = out[fast].bler / max(out[base].bler, 1e-300)
        sigma = (2.0 / max(min(out[base].errblock, out[fast].errblock), 1)) ** 0.5
        verdict = "OK" if abs(ratio - 1.0) < 3 * sigma else "DIVERGES"
        print(json.dumps({"N": preset(base).code.N, "bler_ratio_fast/def":
                          round(ratio, 4), "3sigma": round(3 * sigma, 4),
                          "verdict": verdict}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--bler", action="store_true")
    ap.add_argument("--bler-snr", type=float, default=4.0)
    ap.add_argument("--error-blocks", type=int, default=1000)
    args = ap.parse_args()
    if not (args.perf or args.bler):
        args.perf = True
    if args.perf:
        perf_ab()
    if args.bler:
        bler_ab(args.bler_snr, args.error_blocks)
