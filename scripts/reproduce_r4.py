"""Round-4 archive closures (verdict items 4 + 5):

1. CASCL_128_fag_L32 — the last reference result archive with no matching
   entry in results/ (`result_128_fag.zip:CAL32_0.dat`, seed 1749;
   BASELINE.md rows: 0.1448 / 0.07184 / 0.01684 / 3.991e-3 / 8.20e-4 /
   1.990e-4 at 1.0..3.5 dB).
2. BP_1024_GA — the last BASELINE.json config with no archived run: BP at
   N=1024 with the GA-SC construction and early stopping (wave engine).
   The MC BLER is additionally cross-validated against the bpdega union-
   bound prediction evaluated on the SAME GA-constructed frozen mask (the
   reference's GA-vs-MC methodology, BPRGA_1024_W.c:1-16, SURVEY §4.4) and
   against the 5G-table BP_1024_ES curve (results/BP_1024.json context).

Usage: python scripts/reproduce_r4.py   (real TPU; ~minutes)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import run_sweep

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results")

RUNS = [
    ("CASCL_128_fag_L32", [1.0, 1.5, 2.0, 2.5, 3.0, 3.5], 200, 4_000_000,
     "CAL32_0.dat seed 1749: 0.1448/0.07184/0.01684/3.991e-3/8.20e-4/1.990e-4"),
    ("BP_1024_GA", [1.0, 1.5, 2.0, 2.5, 3.0, 3.5], 200, 8_000_000,
     "BASELINE.json config #2 (GA construction + early stop); no ref table"),
]


def main():
    os.makedirs(RESULTS, exist_ok=True)
    for name, snrs, blocks, cap, note in RUNS:
        p = preset(name)
        t0 = time.time()
        res = run_sweep(
            p, batch=4096, snr_points=snrs, error_blocks=blocks,
            max_frames=cap,
            checkpoint_path=os.path.join(RESULTS, f"{name}.json"),
            log=lambda m: print(m, flush=True),
        )
        print(f"== {name} [{note}]", flush=True)
        for r in res:
            print(f"   {r.snr_db:.1f} dB: {r.bler:.4e} ({r.errblock}/{r.frames})",
                  flush=True)
        print(f"   done in {time.time()-t0:.0f}s", flush=True)

    # GA-vs-MC cross-validation: bpdega/construction are numpy-only (no
    # device work; setting JAX_PLATFORMS here would be too late anyway —
    # jax is already initialized above)
    from polardecoding_tpu.analysis.construction import code_frozen_mask
    from polardecoding_tpu.analysis.dega import bpdega

    code = preset("BP_1024_GA").code
    fr = code_frozen_mask(code)
    with open(os.path.join(RESULTS, "BP_1024_GA.json")) as f:
        mc = {rec["snr_db"]: rec for rec in json.load(f)}
    rows = []
    for snr in sorted(mc):
        pred = bpdega(1024, 512, snr, iters=100, frozen=fr)
        rows.append({"snr_db": snr, "mc_bler": mc[snr]["bler"],
                     "dega_union_bound": pred.bler,
                     "mc_frames": mc[snr]["frames"],
                     "mc_errblock": mc[snr]["errblock"]})
        print(json.dumps(rows[-1]), flush=True)
    with open(os.path.join(RESULTS, "BP_1024_GA_vs_dega.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
