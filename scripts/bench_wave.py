"""Ad-hoc wave-engine throughput sweep on the real chip.

Measures steady-state retired frames/s of the continuous-batching BP engine
(parallel/harness.make_wave_step) across batch size and wave_iters, with the
honest host-forced-scalar sync discipline (see bench.py docstring), plus the
plain fixed-100-iteration engine for the speedup ratio.

Usage:  python scripts/bench_wave.py [--snr 2.0] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from bench import bench_step, bench_waves  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--ab-fused", action="store_true",
                    help="interleaved fused-vs-unfused A/B (best-of-reps, "
                         "DVFS-resistant — see scripts/ab_scl.py)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--retune", action="store_true",
                    help="K/batch retune of the production wave config "
                         "(fused + FASTCHK) after fusion changed the "
                         "traffic balance (round-3 verdict item)")
    args = ap.parse_args()

    if args.retune:
        # fused kernel + chk_fast moved the per-wave fixed costs; re-probe
        # wave_iters and batch around the old optimum (K=8, 16384)
        grid = ([(16384, 8), (16384, 6)] if args.quick else
                [(16384, 4), (16384, 6), (16384, 8), (16384, 12),
                 (32768, 6), (32768, 8)])
        best = {}
        for rep in range(args.reps):
            for batch, wi in grid:
                fps = bench_waves("BP_1024_FASTCHK", batch, args.snr,
                                  wave_iters=wi, steps=24, warmup=4,
                                  fused=True)
                key = (batch, wi)
                best[key] = max(best.get(key, 0.0), fps)
                print(json.dumps({"engine": "wave-retune", "rep": rep,
                                  "batch": batch, "wave_iters": wi,
                                  "fps": round(fps, 1)}), flush=True)
        top = max(best, key=best.get)
        print(json.dumps({"engine": "wave-retune-best", "batch": top[0],
                          "wave_iters": top[1],
                          "fps": round(best[top], 1)}), flush=True)
        return

    if args.ab_fused:
        grid = [(8192, 8)] if args.quick else [(8192, 8), (16384, 8)]
        for batch, wi in grid:
            best = {False: 0.0, True: 0.0}
            for rep in range(args.reps):
                for fused in (False, True):
                    fps = bench_waves("BP_1024", batch, args.snr,
                                      wave_iters=wi, steps=24, warmup=4,
                                      fused=fused)
                    best[fused] = max(best[fused], fps)
                    print(json.dumps({"engine": "wave", "fused": fused,
                                      "rep": rep, "batch": batch,
                                      "wave_iters": wi,
                                      "fps": round(fps, 1)}), flush=True)
            print(json.dumps({"engine": "wave-AB", "batch": batch,
                              "wave_iters": wi,
                              "best_unfused": round(best[False], 1),
                              "best_fused": round(best[True], 1),
                              "fused_x": round(best[True] / best[False], 3)}),
                  flush=True)
        return

    plain = bench_step("BP_1024", 8192, args.snr, iters=5, warmup=2)
    print(json.dumps({"engine": "plain100", "batch": 8192,
                      "fps": round(plain, 1)}), flush=True)

    grid = [(4096, 8), (8192, 8)] if args.quick else [
        (2048, 8), (4096, 4), (4096, 8), (4096, 16), (8192, 8), (16384, 8)]
    for batch, wi in grid:
        fps = bench_waves("BP_1024", batch, args.snr, wave_iters=wi,
                          steps=24, warmup=4)
        print(json.dumps({"engine": "wave", "batch": batch, "wave_iters": wi,
                          "fps": round(fps, 1),
                          "x_plain": round(fps / plain, 2)}), flush=True)


if __name__ == "__main__":
    main()
