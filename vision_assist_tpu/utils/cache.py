"""Persistent XLA compilation cache.

First compiles of the train step / frame chain take tens of seconds (and go
through a remote-compile relay on this TPU setup); caching them on disk makes
every subsequent process start fast. Call enable() before the first jit.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "VISION_ASSIST_JAX_CACHE", os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
