"""BLER qualification of the approximate R1 flavor (scl_r1) — the chk_fast
protocol (docs/ROOFLINE.md): paired 1000-error-block BLER A/B at the
hardest table SNR per config.  Frames are pure functions of (seed, frame
index), so both flavors decode the SAME noisy frames; the ratio carries
~sqrt(2/errors) relative sigma (upper bound — paired sampling is tighter).

Usage: python scripts/bler_r1.py [--error-blocks 1000] [--r1 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import polardecoding_tpu.configs as cfg
from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import run_point

# name, hardest-table SNR, frame cap.  Override with PD_CASES =
# "name:snr:cap[,...]" (e.g. the round-4 L=16 qualification).
CASES = [
    ("SCL_128_L8", 3.0, 2_000_000),
    ("SCL_1024_L8", 3.0, 30_000_000),
    ("CASCL_1024_L8", 2.5, 60_000_000),
]
if os.environ.get("PD_CASES"):
    CASES = [(n, float(s), int(c)) for n, s, c in
             (e.split(":") for e in os.environ["PD_CASES"].split(","))]


def register_r1_twin(name, r1):
    fast = f"{name}_FASTR1"
    if fast in cfg.PRESETS:
        return fast
    p = preset(name)
    fp = dataclasses.replace(
        p, name=fast,
        decoder=dataclasses.replace(p.decoder, scl_r1=r1),
    )
    cfg.PRESETS[fp.name] = fp
    return fp.name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--error-blocks", type=int, default=1000)
    ap.add_argument("--r1", type=int, default=4)
    args = ap.parse_args()
    for base, snr, cap in CASES:
        fast = register_r1_twin(base, args.r1)
        out = {}
        for name in (base, fast):
            r = run_point(preset(name), snr, batch=8192,
                          error_blocks=args.error_blocks, max_frames=cap)
            out[name] = r
            print(json.dumps({"preset": name, "snr_db": snr,
                              "frames": r.frames, "errblock": r.errblock,
                              "bler": r.bler,
                              "elapsed_s": round(r.elapsed_s, 1)}),
                  flush=True)
        ratio = out[fast].bler / max(out[base].bler, 1e-300)
        sigma = (2.0 / max(min(out[base].errblock, out[fast].errblock),
                           1)) ** 0.5
        verdict = "OK" if abs(ratio - 1.0) < 3 * sigma else "DIVERGES"
        print(json.dumps({"config": base, "r1": args.r1,
                          "bler_ratio_r1/exact": round(ratio, 4),
                          "3sigma": round(3 * sigma, 4),
                          "verdict": verdict}), flush=True)


if __name__ == "__main__":
    main()
