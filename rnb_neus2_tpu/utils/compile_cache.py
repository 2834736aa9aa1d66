"""Persistent XLA compilation cache (on by default).

A full-size training run compiles several (rays-bucket, level-bucket)
step variants plus occupancy-refresh variants at minutes each; with the
persistent cache a repeat run — and crucially the two-stage pipeline's
stage-2 process (pipeline.py runs the testbed twice) — reuses every
executable and starts hot.

Disable with RNB_NO_COMPILE_CACHE=1; relocate with
JAX_COMPILATION_CACHE_DIR (jax's own env var, honored by jax itself —
we only set the config default when unset).
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE or os.environ.get("RNB_NO_COMPILE_CACHE"):
        return
    _DONE = True
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # jax reads its own env var; nothing to do
    d = os.path.expanduser("~/.cache/rnb_neus2_tpu/xla")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # only persist compilations that are actually expensive
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
