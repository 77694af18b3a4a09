"""Utilities: timing, profiling, logging."""

from nbody_tpu.utils.timing import hard_sync, on_tpu, time_steps
from nbody_tpu.utils.profiling import trace
from nbody_tpu.utils.compilation_cache import enable as enable_compilation_cache

__all__ = ["hard_sync", "on_tpu", "time_steps", "trace", "enable_compilation_cache"]
