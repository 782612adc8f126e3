"""Process-wide JAX setup: persistent compilation cache.

The fused search/rollout programs take minutes to compile on small hosts;
the persistent cache makes every repeat run (tests, benchmarks, resumed
training) start in seconds. Safe to call multiple times.

The cache is enabled ONLY for real accelerator platforms. On the CPU
backend, XLA:CPU AOT cache entries carry machine-feature sets
(prefer-no-gather/-scatter etc.) that need not match the executing host;
loading them warns (cpu_aot_loader "could lead to execution errors such as
SIGILL") and intermittently SEGFAULTS in
compilation_cache.get_executable_and_time — observed twice killing whole
pytest runs on this host at the same stack. Fresh CPU compiles are slower
but reliable. Opt in anyway with LZT_FORCE_CPU_CACHE=1.
"""
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
        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        cpu_only = str(platforms).strip().lower() == "cpu"
        if cpu_only and os.environ.get("LZT_FORCE_CPU_CACHE") != "1":
            _DONE = True
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure
    _DONE = True
