"""Persistent XLA compilation cache setup.

TPU compiles of the full rasterizer grad pipeline take minutes over a
remote-device tunnel; the persistent cache turns every re-run (benches,
parity checks, CLI fits) into a sub-second cache hit. Verified working on
the `axon` remote platform: executables serialize and reload across
processes.

Call :func:`enable_persistent_cache` before the first jit. Env knobs:
  GH_JAX_CACHE=0        disable entirely
  GH_JAX_CACHE_DIR=...  override the cache directory
"""
from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache; returns the dir (or None).

    Safe to call multiple times; a no-op when GH_JAX_CACHE=0 or when the
    user already configured jax_compilation_cache_dir themselves.
    """
    if os.environ.get("GH_JAX_CACHE", "1") == "0":
        return None
    import jax

    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return jax.config.jax_compilation_cache_dir
    cache_dir = os.environ.get("GH_JAX_CACHE_DIR") or default_dir
    if cache_dir is None:
        # Prefer a repo-local cache in a writable checkout; fall back to a
        # per-user dir (the package may live in read-only site-packages).
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if os.access(repo_dir, os.W_OK):
            cache_dir = os.path.join(repo_dir, ".jax_cache")
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "guassianhand", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default thresholds skip fast compiles, but over
    # a remote tunnel even small programs pay round-trip latency. These two
    # flags are optimizations only — older jax versions lack them.
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    return cache_dir
