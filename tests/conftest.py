"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
