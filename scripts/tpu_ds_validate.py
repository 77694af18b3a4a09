"""Validate + benchmark the double-single kernel on the attached TPU.

1. Accuracy: one dt=0.001 step at N=4096 vs the float64 NumPy oracle —
   the Mosaic path has no LLVM fma-contraction hazard (ops/ds_kernel.py),
   so this measures ds-native accuracy.
2. Energy-drift parity (BASELINE config[2] shape): N=16384, 10 steps of
   dt=0.016 — ds drift vs the f64 oracle drift.
3. Throughput at N=16384 via delta-timed rolls, vs the 0.32 G int/s the
   XLA-emulated f64 path measures (PARITY.md).
"""

import sys
import time

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.ds_kernel import (
    _scal_ds,
    ds_from_f64,
    nbody_step_ds,
    rollout_pallas_ds,
    rollout_ds,
)
from nbody_tpu.ops.energy import total_energy_f64
from nbody_tpu.oracle.numpy_oracle import step_numpy
from nbody_tpu.utils.timing import hard_sync

SOFT, DAMP = 0.1, 1.0


def main():
    # 1. accuracy
    pos, vel = ic.generate(NBodyConfig.SHELL, 4096, 1.68, 2.98, seed=7)
    p64, v64 = pos.astype(np.float64), vel.astype(np.float64)
    np_, nv_ = nbody_step_ds(p64, v64, 0.001, SOFT, DAMP)
    op, ov = step_numpy(p64, v64, 0.001, SOFT, DAMP)
    a_scale = np.abs(ov[:, :3] - v64[:, :3]).max() / 0.001
    print(f"step accuracy: max |dpos| = {np.abs(np_[:,:3]-op[:,:3]).max():.3e}, "
          f"rel force err = {np.abs(nv_[:,:3]-ov[:,:3]).max()/0.001/a_scale:.3e}",
          flush=True)

    # 2. drift parity at the fp64-anchor shape
    pos, vel = ic.generate(NBodyConfig.SHELL, 16384, 1.68, 2.98, seed=42)
    p64, v64 = pos.astype(np.float64), vel.astype(np.float64)
    e0 = total_energy_f64(p64, v64, SOFT)
    gp, gv = rollout_ds(p64, v64, 0.016, SOFT, DAMP, steps=10)
    od, ovd = p64, v64
    for _ in range(10):
        od, ovd = step_numpy(od, ovd, 0.016, SOFT, DAMP)
    d_ds = (total_energy_f64(gp, gv, SOFT) - e0) / abs(e0)
    d_or = (total_energy_f64(od, ovd, SOFT) - e0) / abs(e0)
    print(f"drift parity (N=16384, 10 steps): ds {d_ds:+.6e} vs f64 oracle "
          f"{d_or:+.6e}, delta {abs(d_ds-d_or):.2e}", flush=True)

    # 3. throughput, delta-timed
    n = 16384
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal = _scal_ds(0.016, SOFT, DAMP)
    times = {}
    for k in (10, 50):
        args = (ph, plo, vh, vlo)
        hard_sync(rollout_pallas_ds(*(a.copy() for a in args), scal, steps=k))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            hard_sync(rollout_pallas_ds(*(a.copy() for a in args), scal,
                                        steps=k))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    g = n * n * 40 / (times[50] - times[10]) / 1e9
    print(f"throughput N={n}: {g:.2f} G int/s (delta-timed; XLA-emulated "
          f"f64 measures 0.32 G) -> {g/0.32:.0f}x", flush=True)


if __name__ == "__main__":
    main()
