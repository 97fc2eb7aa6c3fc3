"""Device-time breakdown of the production wave step (fused + FASTCHK).

Captures a jax.profiler trace of steady-state wave steps and aggregates the
Chrome-trace device events by op name: how much of each step is the fused
Pallas kernel vs the XLA-side refill work (RNG, encode, PN payload, count).
Decides whether in-kernel refill generation is worth building.

Usage: python scripts/profile_wave.py [--batch 16384] [--steps 6]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_waves  # noqa: E402  (reuses the honest sync recipe)
from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.harness import make_wave_step
from polardecoding_tpu.parallel.mesh import data_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--dir", default="/tmp/pd_wave_trace")
    args = ap.parse_args()

    p = preset("BP_1024_FASTCHK")
    init, step, _ = make_wave_step(p, args.batch, 8, data_mesh(), fused=True)
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-2.0 / 20.0))
    carry = init(key, jnp.int32(0), sigma)
    last = None
    for _ in range(4):
        carry, last = step(key, sigma, carry)
    int(last[2])  # warm + sync

    with jax.profiler.trace(args.dir):
        outs = []
        for _ in range(args.steps):
            carry, out = step(key, sigma, carry)
            outs.append(out[2])
        int(sum(outs))

    traces = sorted(glob.glob(
        os.path.join(args.dir, "**", "*.trace.json.gz"), recursive=True))
    assert traces, f"no trace under {args.dir}"
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)

    # device-lane complete events: aggregate by op name
    by_name = collections.Counter()
    total = 0.0
    pids_device = set()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "Chip" in nm:
                pids_device.add(ev["pid"])
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in pids_device:
            continue
        dur = float(ev.get("dur", 0.0))
        name = ev.get("name", "?")
        by_name[name] += dur
        total += dur
    print(json.dumps({"device_total_ms": round(total / 1e3, 2),
                      "steps": args.steps, "batch": args.batch}))
    for name, dur in by_name.most_common(14):
        print(json.dumps({"op": name[:88], "ms": round(dur / 1e3, 2),
                          "pct": round(100 * dur / max(total, 1e-9), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
