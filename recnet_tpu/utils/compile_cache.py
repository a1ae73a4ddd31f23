"""Reliable persistent-compile-cache activation.

On this image a ``sitecustomize`` imports jax at interpreter start, which
freezes every env-var-backed jax config option before any user code runs:
``os.environ["JAX_COMPILATION_CACHE_DIR"] = ...`` at the top of a script is
read TOO LATE and silently ignored (``jax.config.jax_compilation_cache_dir``
stays None). Exporting the variable in the parent environment works — that
is why ``bench.py``'s per-attempt subprocesses always hit the cache — but a
script that jits in its own main process must go through
``jax.config.update`` after importing jax. This helper is that one correct
path; benchmarks and CLIs call it before their first jit dispatch.
"""

from __future__ import annotations

import os
from typing import Optional


def default_cache_dir() -> str:
    """<repo root>/.jax_cache — the directory bench.py pre-warms."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache_if_configured() -> Optional[str]:
    """CLI entry-point policy: activate the cache only when the user asked
    for it via JAX_COMPILATION_CACHE_DIR (which sitecustomize's early jax
    import would otherwise silently ignore). Returns the path or None."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return enable_compile_cache()
    return None


def enable_compile_cache(path: Optional[str] = None,
                         min_compile_time_secs: Optional[float] = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (default: the
    JAX_COMPILATION_CACHE_DIR env var if set, else <repo>/.jax_cache).
    Idempotent; returns the active path."""
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or default_cache_dir())
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    if min_compile_time_secs is not None:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
    return path
