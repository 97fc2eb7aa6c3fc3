"""Headline benchmark: decoded frames/s for the BP_1024 Monte-Carlo pipeline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (no timing code exists —
SURVEY §6); the baseline is the BASELINE.json north star of 1e7 decoded
frames/s aggregate, so vs_baseline = frames_per_sec / 1e7 (single chip here;
the multi-host target composes near-linearly since the only communication is
the psum of two scalar counters per super-batch).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_frame_step
from polardecoding_tpu.parallel.mesh import data_mesh

BASELINE_FRAMES_PER_SEC = 1e7


def bench(preset_name="BP_1024", batch=8192, snr_db=2.0, iters=5, warmup=2,
          profile_dir=None):
    p = preset(preset_name)
    mesh = data_mesh()
    step = make_frame_step(p, batch=batch, mesh=mesh)
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-snr_db / 20.0))

    for i in range(warmup):
        out = step(key, jnp.int32(i * batch), sigma)
        jax.block_until_ready(out)

    if profile_dir:
        # jax.profiler traces replace the reference's "no tracing at all"
        # (SURVEY §5): per-kernel timelines viewable in tensorboard/xprof
        ctx = jax.profiler.trace(profile_dir)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            outs.append(step(key, jnp.int32((warmup + i) * batch), sigma))
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
    return (iters * batch) / dt


if __name__ == "__main__":
    import sys

    prof = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        prof = sys.argv[i + 1] if len(sys.argv) > i + 1 else "/tmp/pd_trace"
    fps = bench(profile_dir=prof)
    print(
        json.dumps(
            {
                "metric": "BP_1024 decoded frames/s (100-iter BP, full MC pipeline, 1 chip)",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 4),
            }
        )
    )
