"""nbody_tpu — a TPU-native all-pairs N-body simulation framework.

A ground-up rebuild (not a port) of the capabilities of the CUDA ``nbody``
sample (reference: j-horner/cuda-nbody), designed TPU-first:

* the hot all-pairs gravity kernel is a Pallas TPU kernel that streams
  j-body tiles through VMEM while an i-tile stays resident, fused with the
  damped semi-implicit-Euler integration (``nbody_tpu.ops.pallas_kernel``),
* multi-chip scaling is a body-sharded ``jax.sharding.Mesh`` whose step
  all-gathers (or ppermute-rings) positions over ICI (``nbody_tpu.parallel``),
* correctness is anchored by a native C++ CPU oracle plus a NumPy oracle
  (``nbody_tpu.oracle``), mirroring the reference's GPU-vs-CPU QA compare,
* the OpenGL point-sprite renderer is replaced by an on-device Gaussian-splat
  rasterizer with host PNG export (``nbody_tpu.render``).

State convention (matches the reference's AoS layout,
/root/reference/src/nbody/bodysystemcuda.hpp:60-71):
``pos`` is ``(N, 4)`` with columns ``x, y, z, mass`` and ``vel`` is ``(N, 4)``
with columns ``vx, vy, vz, 0``.
"""

from nbody_tpu.params import (
    NBodyParams,
    DEMO_PARAMS,
    flops_per_interaction,
    tuned_scales,
)
from nbody_tpu.config import NBodyConfig
from nbody_tpu import ic

__all__ = [
    "NBodyParams",
    "DEMO_PARAMS",
    "NBodyConfig",
    "flops_per_interaction",
    "tuned_scales",
    "ic",
    "Compute",
    "BodySystem",
]

__version__ = "0.1.0"


def __getattr__(name):
    # lazy heavyweight exports (pull in device backends only on use)
    if name == "Compute":
        from nbody_tpu.compute import Compute

        return Compute
    if name == "BodySystem":
        from nbody_tpu.models import BodySystem

        return BodySystem
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
