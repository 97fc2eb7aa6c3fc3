"""BLER qualification of the in-kernel-MC wave engine (v3) — the chk_fast
protocol (docs/ROOFLINE.md): 1000-error-block BLER A/B per SNR point,
fused engine (production r4 baseline) vs mc (in-kernel PRNG bits) vs
mc-tf (threefry bits).  Unlike the R1 qualification the engines do NOT
decode identical frames (the MC engine's noise-stream assignment is
history-dependent — models/bp.py MC contract), so the comparison is
unpaired: ratio sigma ~ sqrt(2/errors) ~ 4.5 % at 1000 blocks, 3-sigma
window +/-0.13.

The noise-quality risk being probed: the rbg experiment (ROOFLINE
"tried-and-rejected") showed a PRNG swap can read 20 % low on BLER while
measuring faster — the tail points are where a deficient generator shows.

Usage: python scripts/bler_wavemc.py [--error-blocks 1000]
Env: PD_SNRS (default "2.0,3.5"), PD_PRESET (default BP_1024_FASTCHK),
     PD_ENGINES (default fused,mc,mc-tf), PD_BATCH
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import dataclasses

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import run_point_waves


def _with_itermax(p, iters):
    return dataclasses.replace(
        p, name=f"{p.name}_I{iters}",
        decoder=dataclasses.replace(p.decoder, bp_iters=iters))

SNRS = [float(s) for s in os.environ.get("PD_SNRS", "2.0,3.5").split(",")]
PRESET = os.environ.get("PD_PRESET", "BP_1024_FASTCHK")
ENGINES = os.environ.get("PD_ENGINES", "fused,mc,mc-tf").split(",")
BATCH = int(os.environ.get("PD_BATCH", "16384"))
MC_K = int(os.environ.get("PD_MC_K", "8"))  # mc-engine wave_iters
MC_CAD = int(os.environ.get("PD_MC_CADENCE", "1"))
FUSED_K = int(os.environ.get("PD_FUSED_K", "8"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--error-blocks", type=int, default=1000)
    ap.add_argument("--max-frames", type=int, default=200_000_000)
    args = ap.parse_args()
    p = preset(PRESET)
    for snr in SNRS:
        out = {}
        for eng in ENGINES:
            kw = {}
            pp = p
            base = eng
            # "<engine>-i<N>" suffix: reduced-iterMax flavor (verdict r4
            # item 4 — the ~2.5 % iterMax tail pays ~100 iters for frames
            # that almost never converge past ~40; a qualified lower cap
            # trades an unmeasurable BLER shift for throughput)
            if "-i" in eng:
                base, it = eng.rsplit("-i", 1)
                pp = _with_itermax(p, int(it))
            wi = FUSED_K
            if base == "fused":
                kw = dict(engine="fused")
            elif base == "mc":
                kw = dict(engine="mc", noise="kernel", cadence=MC_CAD)
                wi = MC_K
            elif base == "mc-tf":
                kw = dict(engine="mc", noise="threefry", cadence=MC_CAD)
                wi = MC_K
            elif base.startswith("mc-c"):
                kw = dict(engine="mc", noise="kernel", cadence=int(base[4:]))
                wi = MC_K
            r = run_point_waves(pp, snr, batch=BATCH, wave_iters=wi,
                                error_blocks=args.error_blocks,
                                max_frames=args.max_frames, **kw)
            out[eng] = r
            print(json.dumps({
                "preset": PRESET, "engine": eng, "snr_db": snr,
                "frames": r.frames, "errblock": r.errblock,
                "bler": round(r.bler, 7),
                "fps": round(r.frames / max(r.elapsed_s, 1e-9), 1),
            }), flush=True)
        base = out.get("fused") or out[ENGINES[0]]
        rec = {"preset": PRESET, "snr_db": snr,
               "ratios_vs_" + ("fused" if "fused" in out else ENGINES[0]): {
                   k: round(v.bler / max(base.bler, 1e-12), 4)
                   for k, v in out.items()}}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
