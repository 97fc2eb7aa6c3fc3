"""Scaling harness on the virtual 8-device CPU mesh."""
import jax

from polardecoding_tpu.configs import preset
from polardecoding_tpu.parallel.distributed import scaling_bench


def test_scaling_bench_runs_on_cpu_mesh():
    """The harness must run at 1 and 8 virtual devices and report the record
    shape.  (CPU 'devices' share the same cores, so no efficiency assertion —
    that is meaningful only on real chips.)"""
    assert len(jax.devices()) >= 8
    recs = scaling_bench(
        preset("SC_128"), device_counts=[1, 8], batch_per_device=32,
        steps=1, warmup=1,
    )
    assert [r["devices"] for r in recs] == [1, 8]
    for r in recs:
        assert r["frames_per_sec"] > 0
        assert 0 < r["efficiency"] <= 2.0
