"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-chip without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices so
sharding/pjit/shard_map paths compile and execute exactly as they would
on an 8-chip slice.
"""

import os

# Note: in some environments the JAX_PLATFORMS env var is overridden by a
# device plugin; jax.config.update is authoritative, so use both.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
