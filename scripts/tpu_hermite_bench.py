"""Hermite force-evaluation benchmark: fused Pallas acc+jerk vs XLA (r2).

Reproduces the PARITY.md numbers (N=16384: 58.5 -> 30.8 ms/step, 1.9x;
N=65536: 436.5 -> 107.5 ms/step, 4.1x) and checks kernel agreement at
fp32 reduction-order level on silicon.

Run on the attached TPU (single process — the tunnel is single-client):
    python scripts/tpu_hermite_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.pallas_kernel import compute_accel_jerk_pallas
from nbody_tpu.ops.reference import compute_accel_jerk_xla, nbody_step_hermite
from nbody_tpu.utils.timing import hard_sync


def timeit(f):
    r = f()
    hard_sync(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f()
    hard_sync(r)
    return (time.perf_counter() - t0) / 3 * 1e3


def main() -> int:
    for n in (16384, 65536):
        pos, vel = ic.generate(NBodyConfig.SHELL, n, 3.0, 4.0, seed=2)
        p, v = jnp.asarray(pos), jnp.asarray(vel)

        a_x, j_x = compute_accel_jerk_xla(p, v, 0.1, chunk_size=4096)
        a_p, j_p = compute_accel_jerk_pallas(p, v, p, v, 0.1)
        da = np.abs(np.asarray(a_p) - np.asarray(a_x)).max()
        dj = np.abs(np.asarray(j_p) - np.asarray(j_x)).max()
        sa = np.abs(np.asarray(a_x)).max()
        sj = np.abs(np.asarray(j_x)).max()
        print(f"N={n}: max|da|/scale={da / sa:.1e}, max|dj|/scale={dj / sj:.1e}")

        xla_fn = jax.jit(lambda p=p, v=v: nbody_step_hermite(
            p, v, 0.016, 0.1, 1.0, chunk_size=4096))

        def pl_aj(p4, v4):
            return compute_accel_jerk_pallas(p4, v4, p4, v4, 0.1)

        pl_fn = jax.jit(lambda p=p, v=v: nbody_step_hermite(
            p, v, 0.016, 0.1, 1.0, accel_jerk_fn=pl_aj))
        t_x, t_p = timeit(xla_fn), timeit(pl_fn)
        print(f"N={n}: hermite step XLA {t_x:.1f} ms, "
              f"pallas {t_p:.1f} ms ({t_x / t_p:.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
