"""Persistent XLA compilation cache.

Compiles of the fused train step take minutes over a remote-TPU tunnel;
caching them on disk makes every run after the first start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "fgp_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
