"""Profiling & observability: jax.profiler traces, named step annotations,
and device-memory introspection.

The reference has no tracer — only CUDA-event/rdtsc timers (SURVEY.md §5);
this is the TPU-native observability the survey mandates. Three surfaces:

* ``trace(dir)`` — context manager around ``jax.profiler.trace``; the
  resulting directory opens in TensorBoard/Perfetto/XProf. CLI: ``--profile
  DIR`` (or env NBODY_TRACE_DIR) wraps benchmark/demo runs.
* ``annotate(name)`` — named ``TraceAnnotation`` span so framework phases
  (step, render, energy, checkpoint) are labeled inside the timeline.
* ``device_memory_stats()`` — allocator stats of the attached device
  (bytes in use / peak / limit), the closest analogue of the reference's
  device banner plus what it never had: live memory accounting.
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


def annotate(name: str):
    """Named span in the profiler timeline (host side). Usable as a context
    manager; cheap no-op cost when no trace is active.

        with annotate("nbody.step"):
            system.update()
    """
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    """Allocator stats for `device` (default: first device) as a plain dict.

    Returns {} on backends that expose no stats (e.g. CPU). Keys of interest
    when present: bytes_in_use, peak_bytes_in_use, bytes_limit.
    """
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return {}
    return dict(stats) if stats else {}


def format_memory_line(device=None) -> str:
    """One-line human summary of device memory, '' when unavailable."""
    s = device_memory_stats(device)
    if not s:
        return ""
    gib = 1024.0 ** 3
    used = s.get("bytes_in_use")
    peak = s.get("peak_bytes_in_use")
    limit = s.get("bytes_limit")
    parts = []
    if used is not None:
        parts.append(f"in use {used / gib:.2f} GiB")
    if peak is not None:
        parts.append(f"peak {peak / gib:.2f} GiB")
    if limit is not None:
        parts.append(f"limit {limit / gib:.2f} GiB")
    return "device memory: " + ", ".join(parts) if parts else ""
