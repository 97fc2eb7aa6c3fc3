"""Test harness: force the CPU backend with 8 virtual devices so sharding tests
exercise a real multi-device mesh without TPU hardware (SURVEY §4).

The dev environment's sitecustomize registers the `axon` TPU-tunnel backend at
interpreter startup and exports JAX_PLATFORMS=axon, so we must both override
the env AND update jax's config (backends resolve lazily, so this is still in
time as long as no test ran jax yet).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
