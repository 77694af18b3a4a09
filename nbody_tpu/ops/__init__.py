"""Device compute ops: XLA (jnp) reference path, Pallas TPU kernels,
particle-mesh far-field solver, energy diagnostics, differentiable steps."""

from nbody_tpu.ops.reference import nbody_step_xla, compute_accel_xla
from nbody_tpu.ops.pm import make_sharded_pm_step, nbody_step_pm, pm_accel
from nbody_tpu.ops.p3m import make_sharded_p3m_step, nbody_step_p3m, p3m_accel

__all__ = [
    "nbody_step_xla",
    "compute_accel_xla",
    "pm_accel",
    "nbody_step_pm",
    "make_sharded_pm_step",
    "p3m_accel",
    "nbody_step_p3m",
    "make_sharded_p3m_step",
]
