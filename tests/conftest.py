"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware.

The environment's sitecustomize registers a remote TPU platform and
overrides ``jax_platforms`` via jax.config, so setting JAX_PLATFORMS in the
environment is not enough — we must update jax.config before any backend
initializes."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
