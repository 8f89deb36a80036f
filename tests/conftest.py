"""Test harness config: CPU backend with 8 virtual devices.

Sharding tests run on a simulated 8-device mesh
(xla_force_host_platform_device_count) — the standard way to validate
pjit/shard_map layouts without a TPU pod (SURVEY §4).

NOTE: this environment's sitecustomize pins JAX_PLATFORMS=axon (a real
TPU tunnel) and ignores the env-var override, so the CPU backend must be
forced via jax.config *after* import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
