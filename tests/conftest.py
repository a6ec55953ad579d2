"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
suite runs anywhere and multi-chip sharding is exercised without TPUs.

The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. 'axon'); the
jax.config update below overrides it reliably.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
