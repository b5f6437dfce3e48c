"""Persistent XLA compilation cache setup.

Full-size programs take minutes to compile through this environment's
remote-relay TPU backend, and every fresh process pays it again. JAX's
persistent compilation cache (honored by the relay's compile hook when a
cache dir is configured) makes the second process load the serialized
executable instead. Call ``enable()`` BEFORE the first jax device/compile
use — env vars are read when jax.config initializes.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a repo-local dir.

    Respects an existing JAX_COMPILATION_CACHE_DIR. Safe to call multiple
    times and before/after ``import jax`` (also sets the live config when
    jax is already imported)."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    min_secs = float(
        os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"])
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass  # pre-import call: env vars above cover it
    return cache_dir
