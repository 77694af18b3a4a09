"""Persistent XLA compilation cache.

Compiles on a remote-attached TPU can take minutes (remote compile); the
persistent cache turns repeat invocations of the same shapes into ~seconds
(measured 150s -> 39s cold-process start for one kernel). Enabled by the CLI
and bench.py; opt out with NBODY_NO_COMPILE_CACHE=1 or choose the directory
with NBODY_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache; returns the directory used
    (None if disabled via NBODY_NO_COMPILE_CACHE or already set)."""
    if os.environ.get("NBODY_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("NBODY_COMPILE_CACHE_DIR")
        or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "nbody_tpu", "xla",
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a failure mode
        return None
    return cache_dir
