"""Persistent XLA compilation cache wiring.

The reference's steady-state "graph reuse" makes re-running a model
cost microseconds of graph checks (src/llama-graph.h:427); our analog
within a process is the jit program cache, but across process restarts
every XLA compile would be re-paid (minutes for a 32-layer decode
program through a tunneled TPU). jax's persistent compilation cache
(jax_compilation_cache_dir) makes the second process start hit warm
compiles instead — this module turns it on for every Context/CLI/server
entry point.

Resolution order for the cache dir:
  1. JAX_COMPILATION_CACHE_DIR env (jax's own knob — left untouched)
  2. TPULLAMA_CACHE_DIR env
  3. ~/.cache/tpullama/jax_cache
Set TPULLAMA_CACHE_DIR=0 (or "off"/"none") to disable.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> str | None:
    """Idempotently point jax at a persistent on-disk compile cache.
    Returns the directory in use (None when disabled)."""
    global _done
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    cfg = os.environ.get("TPULLAMA_CACHE_DIR", "")
    if cfg.lower() in ("0", "off", "none", "disable"):
        return None
    path = cfg or os.path.join(
        os.path.expanduser("~"), ".cache", "tpullama", "jax_cache")
    if _done:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program regardless of compile time / size: decode
        # programs are exactly the ones we cannot afford to recompile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _done = True
    except Exception:  # never let cache plumbing break inference
        return None
    return path
