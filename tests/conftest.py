"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 available, so sharding/pjit paths are exercised without TPU hardware
(the driver separately dry-runs the multi-chip path).

Note: this environment preloads jax at interpreter start with
JAX_PLATFORMS=axon (tunneled TPU), so plain env-var overrides are too late;
we must go through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
