"""Device compute ops: XLA (jnp) reference path, Pallas TPU kernels, energy."""

from nbody_tpu.ops.reference import nbody_step_xla, compute_accel_xla

__all__ = ["nbody_step_xla", "compute_accel_xla"]
