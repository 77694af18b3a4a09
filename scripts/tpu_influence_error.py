"""Measured force-error table: naive 1/W^2 deconvolution vs the
Hockney–Eastwood optimal influence function (VERDICT r2 item 6).

Config matches the r2 error measurements: demo-0 shell state at N=65536,
grid=64, capacity auto — reporting median and p90 of |a_solver − a_exact|
/ |a_exact| over all bodies, with a_exact from the exact fp32 Pallas
all-pairs kernel.
"""

import json
import sys

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.ops.pallas_kernel import compute_accel_pallas
from nbody_tpu.ops.pm import pm_accel
from nbody_tpu.ops.p3m import p3m_accel, p3m_max_occupancy

P = DEMO_PARAMS[0]
N, GRID = 65536, 64


def err_stats(acc, ref):
    e = np.linalg.norm(np.asarray(acc) - ref, axis=1)
    r = np.linalg.norm(ref, axis=1) + 1e-30
    rel = e / r
    return float(np.median(rel)), float(np.percentile(rel, 90))


def main():
    pos, vel = ic.generate(NBodyConfig.SHELL, N, P.cluster_scale,
                           P.velocity_scale, seed=42)
    p4 = jnp.asarray(pos)
    ref = np.asarray(compute_accel_pallas(p4, p4, P.softening))

    cap = int(p3m_max_occupancy(p4, grid=GRID)) * 2
    out = {}
    for assignment in ("cic", "tsc"):
        for influence in ("naive", "optimal"):
            acc, ovf = p3m_accel(p4, P.softening, grid=GRID, capacity=cap,
                                 assignment=assignment, influence=influence)
            med, p90 = err_stats(acc, ref)
            out[f"p3m_{assignment}_{influence}"] = (round(med * 100, 4),
                                                    round(p90 * 100, 4))
            print(f"p3m {assignment:3s} {influence:7s}: median "
                  f"{med*100:.4f}%  p90 {p90*100:.4f}%  (overflow "
                  f"{int(ovf)})", flush=True)

    # plain PM: deconvolve=False today; measure the optimal function there
    for assignment in ("cic", "tsc"):
        acc = pm_accel(p4, grid=GRID, assignment=assignment)
        med, p90 = err_stats(acc, ref)
        out[f"pm_{assignment}_none"] = (round(med * 100, 3),
                                        round(p90 * 100, 3))
        print(f"pm  {assignment:3s} none   : median {med*100:.3f}%  "
              f"p90 {p90*100:.3f}%", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
