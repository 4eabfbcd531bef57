"""Persistent XLA compilation cache.

First compiles through this environment's TPU tunnel are slow (tens of
seconds per executable); enabling jax's on-disk compilation cache makes every
CLI/bench invocation after the first load from disk instead.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PATENT_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    # per-backend subdir: XLA:CPU AOT results are machine-specific and a
    # cache hit compiled elsewhere can SIGILL; TPU entries come through the
    # remote-compile service and must not mix with CPU entries
    try:
        import jax

        cache_dir = os.path.join(cache_dir, jax.default_backend())
    except Exception:
        pass
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
