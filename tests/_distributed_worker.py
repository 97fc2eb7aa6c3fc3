"""Worker for the two-process jax.distributed CPU test (SURVEY §4 multi-node
bullet).  Launched by tests/test_distributed.py::test_two_process_determinism
as:  python _distributed_worker.py <coordinator> <num_procs> <proc_id>

Each process owns 4 virtual CPU devices; the global mesh has 8.  Runs the
ordinary harness step over the GLOBAL mesh and prints the psum'd counters —
which must be identical across processes and equal to the single-process run
(frames are pure functions of (seed, frame index), so distribution cannot
change the decoded set).
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardecoding_tpu.configs import preset  # noqa: E402
from polardecoding_tpu.parallel.distributed import init_distributed  # noqa: E402
from polardecoding_tpu.parallel.harness import make_frame_step, make_wave_step  # noqa: E402
from polardecoding_tpu.parallel.mesh import data_mesh  # noqa: E402


def wave_counters(p, mesh, fused, steps=3):
    """Per-step wave-engine counters over the given mesh — the production BP
    configuration with its sharded state carry (donated buffers, cumsum-based
    refill ranks), the code most sensitive to a multi-process global mesh."""
    key = jax.random.PRNGKey(p.sweep.seed)
    sigma = jnp.float32(10.0 ** (-2.0 / 20.0))
    init, step, _ = make_wave_step(p, batch=32, wave_iters=8, mesh=mesh,
                                   fused=fused)
    carry = init(key, jnp.int32(0), sigma)
    rows = []
    for _ in range(steps):
        carry, out = step(key, sigma, carry)
        rows.append([int(v) for v in out])
    return rows


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator, num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    p = preset("SC_128")
    mesh = data_mesh()  # global mesh over all 8 devices
    step = make_frame_step(p, batch=32, mesh=mesh)
    key = jax.random.PRNGKey(7)
    sigma = 10.0 ** (-2.0 / 20.0)
    counters = []
    for i in range(2):
        eb, ebl, _ = step(key, jnp.int32(i * 32), sigma)
        counters.append([int(eb), int(ebl)])

    pb = preset("BP_128")
    waves = {f"fused={fused}": wave_counters(pb, mesh, fused)
             for fused in (False, True)}
    print("RESULT " + json.dumps({"proc": proc_id, "counters": counters,
                                  "waves": waves}),
          flush=True)


if __name__ == "__main__":
    main()
