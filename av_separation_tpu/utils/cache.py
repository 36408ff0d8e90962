"""Persistent XLA compilation cache.

TPU compiles for the bigger programs here take minutes (and on this rig go
through a remote compile service); caching serialized executables across
processes makes repeat runs (bench, CLI, tests-on-TPU) start in seconds.
Safe no-op if the backend doesn't support serialization.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/avsep_jax") -> None:
    try:
        import jax
        cache_dir = os.path.expanduser(path)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a requirement
