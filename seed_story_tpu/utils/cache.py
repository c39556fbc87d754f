"""Persistent XLA compilation cache helper.

TPU compiles in this environment go through a remote-compile tunnel and
are slow (30-300 s per program) but deterministic — the on-disk cache
makes every repeat process fast. Call once near process start.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    # TPU-only: CPU compiles are fast, and persisted CPU AOT executables
    # are machine-feature-pinned — loading one written by a host with a
    # different CPU (containers migrate) warns "could lead to SIGILL" and
    # can mis-execute (observed: a cached CPU decode program changed its
    # output between otherwise identical runs).
    if jax.default_backend() != "tpu":
        return ""
    cache_dir = cache_dir or os.environ.get(
        "SEED_STORY_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
