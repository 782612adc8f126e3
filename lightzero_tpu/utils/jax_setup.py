"""Process-wide JAX setup: persistent compilation cache.

The fused search/rollout programs take minutes to compile on small hosts;
the persistent cache makes every repeat run (tests, benchmarks, resumed
training) start in seconds. Safe to call multiple times."""
from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LZT_JAX_CACHE_DIR", os.path.expanduser("~/.cache/lightzero_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure
    _DONE = True
