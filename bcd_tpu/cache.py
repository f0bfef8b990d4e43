"""Persistent XLA compile cache shared by every entry point.

First compiles on the tunneled TPU platform cost 20-180 s per shape; the
persistent cache makes every later process start warm. bench.py and the
dev scripts configured this individually — the apps (cli, gui, batch)
must too, or an end user pays full recompiles on every invocation.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def configure_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax at the repo-local persistent compile cache. Safe to call
    multiple times; honors ``BCD_JAX_CACHE`` for relocation."""
    import jax

    cache_dir = cache_dir or os.environ.get("BCD_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
