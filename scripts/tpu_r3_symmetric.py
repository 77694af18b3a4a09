"""Measure the Newton's-third-law (symmetric) kernel vs the one-sided champion.

Delta-timed scan rollouts at the official bench shape (N=65536, demo-0
params), exactly like bench.py: time k- and 5k-step rolls, divide the
difference by 4k — cancels the relay's fixed per-dispatch cost.

Prints one JSON line per configuration.
"""

import json
import sys

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls

N = 65536
ITERS = 25


def delta_rate(step, p, v, iters=ITERS, rolls=3):
    ms = delta_time_rolls(step, (p, v), iters=iters, rolls=rolls)
    return N * N * 1e-9 * (1000.0 / ms)  # G interactions/s


def main():
    enable_cache()
    params = DEMO_PARAMS[0]
    pos, vel = ic.generate(NBodyConfig.SHELL, N, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p, v = jnp.asarray(pos), jnp.asarray(vel)

    import numpy as np

    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.symmetric_kernel import nbody_step_symmetric

    # correctness on-chip first: one step vs the one-sided kernel
    p1, _ = nbody_step_symmetric(p, v, 0.001, params.softening, params.damping)
    p2, _ = nbody_step_pallas(p, v, 0.001, params.softening, params.damping,
                              tile_i=64, tile_j=32768, variant="vpu")
    dd = float(np.abs(np.asarray(p1)[:, :3] - np.asarray(p2)[:, :3]).max())
    print(json.dumps({"check": "sym_vs_onesided_1step", "max_dpos": dd}))
    assert dd <= 5e-4

    def one_sided(p, v):
        return nbody_step_pallas(p, v, params.time_step, params.softening,
                                 params.damping, tile_i=64, tile_j=32768,
                                 variant="vpu")

    g = delta_rate(one_sided, p, v)
    print(json.dumps({"kernel": "one_sided", "tile_j": 32768,
                      "g_int_per_s": round(g, 1)}))
    sys.stdout.flush()

    for tj in (4096, 8192, 16384):
        def sym(p, v, tj=tj):
            return nbody_step_symmetric(p, v, params.time_step,
                                        params.softening, params.damping,
                                        tile_j=tj)
        g = delta_rate(sym, p, v)
        print(json.dumps({"kernel": "symmetric", "tile_j": tj,
                          "g_int_per_s": round(g, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
