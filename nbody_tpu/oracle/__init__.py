"""CPU oracles: NumPy reference stepper + native C++ (OpenMP) engine.

Plays the role of the reference's ``BodySystemCPU`` golden oracle
(/root/reference/src/nbody/bodysystemcpu.cpp): the device path is compared
element-wise against a CPU step from identical state, |dpos| <= 5e-4 after one
dt=0.001 step (/root/reference/src/nbody/compute_cuda.cpp:294-333).

``step`` dispatches to the native C++ engine when its shared library is
available (build with ``python -m nbody_tpu.oracle.build``), else NumPy.
"""

from nbody_tpu.oracle.numpy_oracle import step_numpy, step_numpy_leapfrog, accel_numpy
from nbody_tpu.oracle.native import (
    native_available,
    step_native,
    step as step_best,
)

__all__ = [
    "step_numpy",
    "step_numpy_leapfrog",
    "accel_numpy",
    "native_available",
    "step_native",
    "step_best",
]
