"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4.4). This environment preloads the
TPU backend from sitecustomize, but backend *initialization* is lazy, so
switching the platform via jax.config before the first device query works.
"""

import os

# must precede backend init (not merely the jax import)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# fp32 parity tests need exact fp32 matmuls/convs; JAX's DEFAULT matmul
# precision is bf16-class on TPU (and emulated on CPU in jax>=0.9).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: parity tests compile many small programs; reruns
# should hit the cache instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/sola_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
