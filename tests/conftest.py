"""Test configuration: force CPU XLA with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multichip path. The environment pins JAX_PLATFORMS=axon
(TPU tunnel) via sitecustomize, so the platform must be overridden
through jax.config before any backend initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
