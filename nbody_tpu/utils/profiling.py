"""Profiling hooks: jax.profiler traces viewable in TensorBoard/Perfetto.

The reference has no tracer (SURVEY.md §5); this is the TPU-native
observability the survey mandates. Usage:

    with trace("/tmp/nbody-trace"):
        system.update(); system.hard_sync()

or set NBODY_TRACE_DIR to trace CLI runs.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Context manager around jax.profiler.trace; no-op if log_dir is falsy
    and NBODY_TRACE_DIR is unset."""
    import jax

    log_dir = log_dir or os.environ.get("NBODY_TRACE_DIR")
    if not log_dir:
        yield None
        return
    with jax.profiler.trace(log_dir):
        yield log_dir
