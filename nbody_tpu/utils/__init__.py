"""Utilities: timing, profiling, logging."""

from nbody_tpu.utils.timing import hard_sync, on_tpu, time_steps
from nbody_tpu.utils.profiling import trace

__all__ = ["hard_sync", "on_tpu", "time_steps", "trace"]
