"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding tests run without TPU hardware, and enable x64 for f64 parity."""

import os

# Note: under the axon TPU tunnel the JAX_PLATFORMS env var is overridden by
# the plugin; jax.config.update('jax_platforms', ...) and JAX_PLATFORM_NAME
# still win, so set both.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
