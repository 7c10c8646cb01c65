"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup and pins
JAX_PLATFORMS=axon (the real TPU), so plain env vars are captured before any
conftest runs. Force CPU through the live jax config instead; XLA_FLAGS is
still honored because the CPU client is only created on first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent executable cache: the suite compiles dozens of small train-step
# graphs; cached runs cut minutes on this single-core box
from favae_tpu.utils.xla_cache import cpu_cache_dir, enable_persistent_cache  # noqa: E402

enable_persistent_cache(cpu_cache_dir())

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
