"""Interleaved A/B: default minsum_lut vs minsum_lut_fast, fixed-100 and
wave engines, full-MC pipeline (best-of-reps per ab_scl methodology)."""
import sys, os, time, json, dataclasses
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from bench import bench_step, bench_waves
from polardecoding_tpu.configs import preset, PRESETS

def fast_preset(name):
    p = preset(name)
    return dataclasses.replace(p, decoder=dataclasses.replace(p.decoder, bp_flavor="minsum_lut_fast"))

# monkey-route: bench_step/bench_waves take preset names; easiest is to
# register a fast twin
import polardecoding_tpu.configs as cfg
fp = fast_preset("BP_1024")
fp = dataclasses.replace(fp, name="BP_1024_FASTCHK")
cfg.PRESETS["BP_1024_FASTCHK"] = fp

best = {}
for rep in range(3):
    for name in ("BP_1024", "BP_1024_FASTCHK"):
        fps = bench_step(name, 8192, 2.0, iters=5, warmup=(2 if rep == 0 else 1))
        best[name] = max(best.get(name, 0.0), fps)
        print(json.dumps({"engine": "fixed100", "preset": name, "rep": rep, "fps": round(fps, 1)}), flush=True)
for rep in range(3):
    for name in ("BP_1024", "BP_1024_FASTCHK"):
        fps = bench_waves(name, 8192, 2.0, steps=16, warmup=(4 if rep == 0 else 2))
        key = "wave_" + name
        best[key] = max(best.get(key, 0.0), fps)
        print(json.dumps({"engine": "wave", "preset": name, "rep": rep, "fps": round(fps, 1)}), flush=True)
print(json.dumps({"AB": {k: round(v, 1) for k, v in best.items()},
                  "fixed_x": round(best["BP_1024_FASTCHK"] / best["BP_1024"], 3),
                  "wave_x": round(best["wave_BP_1024_FASTCHK"] / best["wave_BP_1024"], 3)}), flush=True)
