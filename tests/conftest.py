"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402  (import after env setup)

# NOTE: this environment force-registers a remote TPU backend ("axon") via
# sitecustomize and overrides the JAX_PLATFORMS env var; config.update is the
# reliable way to pin tests to the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: CPU jit of the unrolled grid encoders dominates
# test wall-time; cache makes re-runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
