"""bf16 message-state BLER A/B study (round-2 verdict item #8).

Runs the full Monte-Carlo BP pipeline with channel LLRs cast to bfloat16
before decode (message state, CHK LUT evaluation, and G-matrix hard decision
all in bf16) against the production float32 path, to >= 1000 error blocks
per arm at the highest-SNR reference-table points — where quantization
effects on near-threshold messages are largest.

Protocol mirrors results/REPRODUCTION.md's f32-vs-f64 study: same seed, same
frame stream (payload/noise are pure functions of (seed, frame index) and
generated in f32 in BOTH arms — only the decoder's message dtype differs),
binomial CI ~ 1/sqrt(blocks) ~ +-3 % per arm at 1000 blocks.

Usage: python scripts/bf16_study.py [--blocks 1000] [--quick]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_frame_step
from polardecoding_tpu.parallel.mesh import data_mesh


def run_arm(preset_name, snr_db, dtype, target_blocks, batch, max_frames):
    # both arms use the fused-jnp engine (the Pallas kernel is f32-only:
    # Mosaic cannot lower dynamic_rotate on sub-32-bit data) so the ONLY
    # difference between arms is the message dtype
    p = preset(preset_name)
    step = make_frame_step(p, batch=batch, mesh=data_mesh(), llr_dtype=dtype,
                           bp_engine="jnp")
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-snr_db / 20.0))
    eb = blocks = frames = 0
    t0 = time.perf_counter()
    while blocks < target_blocks and frames < max_frames:
        b, bl, _ = step(key, jnp.int32(frames), sigma)
        eb += int(b)
        blocks += int(bl)
        frames += batch
    dt = time.perf_counter() - t0
    return {"preset": preset_name, "snr_db": snr_db,
            "dtype": "f32" if dtype is None else str(dtype.__name__),
            "errblock": blocks, "frames": frames,
            "bler": blocks / frames, "ci_rel": 1.0 / math.sqrt(max(blocks, 1)),
            "fps": round(frames / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=1000)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    blocks = 100 if args.quick else args.blocks

    # highest reference-table SNR per N (BASELINE.md): quantization worst case
    points = [("BP_128", 4.0, 8192, int(3e6)),
              ("BP_1024", 3.5, 8192, int(3e7))]
    for name, snr, batch, maxf in points:
        pair = {}
        for dtype in (None, jnp.bfloat16):
            r = run_arm(name, snr, dtype, blocks, batch, maxf)
            print(json.dumps(r), flush=True)
            pair[r["dtype"]] = r
        ratio = pair["bfloat16"]["bler"] / pair["f32"]["bler"]
        ci = ratio * math.hypot(pair["bfloat16"]["ci_rel"], pair["f32"]["ci_rel"])
        print(json.dumps({"preset": name, "snr_db": snr,
                          "bler_ratio_bf16_over_f32": round(ratio, 3),
                          "ci": round(ci, 3)}), flush=True)


if __name__ == "__main__":
    main()
