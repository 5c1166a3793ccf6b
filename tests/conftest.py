"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All tests run on CPU so they are hermetic and exercise the same multi-device
sharding paths the driver validates (xla_force_host_platform_device_count).
The container's sitecustomize pre-registers a TPU backend and pins
JAX_PLATFORMS, so we must override through jax.config as well as the env.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# parity tests compare fp32 against torch CPU — keep matmuls at full precision
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
