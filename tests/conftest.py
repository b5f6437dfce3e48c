"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4.4). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep compiled tests deterministic and fast on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# fp32 parity tests need exact fp32 matmuls/convs; JAX's DEFAULT matmul
# precision is bf16-class on TPU (and emulated on CPU in jax>=0.9).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: parity tests compile many small programs; reruns
# should hit the cache instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/sola_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
