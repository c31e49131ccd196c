"""Test config: force an 8-device virtual CPU backend before JAX loads.

Multi-chip sharding tests run on the standard JAX fake-backend pattern
(xla_force_host_platform_device_count); the real-TPU path is exercised
by bench.py and the driver's compile checks instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not enough when a TPU plugin (axon) is installed:
# force the platform through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
