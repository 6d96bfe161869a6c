"""Persistent XLA compilation cache for the CLI scripts.

Every CLI invocation re-jits the same programs (the reference pays the same
cost as CUDA warmup, but TPU compiles are 20-60 s for the big models); the
JAX persistent cache keys compiled executables by (HLO, compiler version,
device kind) and replays them across processes. Callers that set
``JAX_COMPILATION_CACHE_DIR`` themselves win; failures (e.g. a backend whose
executables don't serialize) degrade to cache misses, never errors.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX at an on-disk compilation cache.

    Returns the cache dir in use, or None if disabled/unavailable. Must run
    before the first jit compilation to cover it (later calls still cover
    subsequent compiles).
    """
    if os.environ.get("DEPTHG_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/depthg_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min-compile-time gate (1 s) would skip the small steps;
        # everything here is worth caching on a tunneled remote compiler
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - config names vary across jax
        return None
    return cache_dir
