"""Test harness config: CPU backend with 8 virtual devices.

Sharding tests run on a simulated 8-device mesh
(xla_force_host_platform_device_count) — the standard way to validate
pjit/shard_map layouts without a TPU pod (SURVEY §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
