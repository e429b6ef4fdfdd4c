"""Persistent XLA compilation cache (VERDICT r3 #6).

The bench-scale train step costs 240-315 s to compile cold (the adjoint's
backward while_loop re-traces the Mosaic kernels per stage) — epoch-1
latency that dominates any short training run. JAX's persistent compilation
cache keys each compiled executable by (HLO, compile options, device kind)
and replays it from disk, so the second process pays only cache-deserialise
time. The reference has no analogue (torch eager recompiles nothing, but
its per-step time is what this framework's compiled steps beat).

Wired into every CLI entry point (run.py, bench.py, reproduce.py,
training/tuning.py). Opt out with GNPDE_NO_COMPILE_CACHE=1; point the cache
somewhere else with GNPDE_COMPILE_CACHE_DIR (defaults to
``~/.cache/graph_neural_pde_tpu/xla`` — per-user, survives process exits,
shared across runs on the same machine/data dir).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on jax's on-disk compilation cache.

    Returns the cache directory, or None when disabled/unavailable.
    Must run before the first compilation to cover it (later is harmless —
    the cache only misses what was already compiled).
    """
    global _ENABLED
    if os.environ.get("GNPDE_NO_COMPILE_CACHE"):
        return None
    import jax as _jax
    try:
        if _jax.default_backend() != "tpu":
            # CPU executables are AOT-compiled against exact host machine
            # features; reloading them on a different host (or across
            # container images) logs "+prefer-no-scatter is not supported
            # ... could lead to SIGILL". The cache's value is the 2-5 min
            # TPU train-step compile, so it is TPU-only.
            return None
    except Exception:
        return None
    cache_dir = (cache_dir
                 or os.environ.get("GNPDE_COMPILE_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "graph_neural_pde_tpu", "xla"))
    import jax

    if _ENABLED:
        return cache_dir
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every entry that took >1 s to compile, regardless of size
        # (the default 2 KiB floor would skip small-but-slow Mosaic wraps)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
        return cache_dir
    except Exception:  # cache is an optimisation, never a failure mode
        return None
