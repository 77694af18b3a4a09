"""Measure the blocked Newton's-third-law composition above SYM_MAX_N.

The triangle kernel's VMEM reaction scratch caps it at N <= 65536; the
blocked path (ops/symmetric_kernel.py::compute_accel_symmetric_blocked)
decomposes the global pair triangle into <=65536-body superblocks (self
triangles + mask-free cross rectangles) so larger N keeps the
each-pair-once saving. This script delta-times it against the one-sided
champion at N in {131072, 262144}.

Roll lengths are sized per N to keep every dispatch well under the
attached worker's ~90-100 s dispatch-duration watchdog (docs/ROUND3.md).

Prints one JSON line per configuration.
"""

import json
import sys

import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls

# iters per N: the 5x roll must stay far under the ~90 s dispatch watchdog
CASES = ((131072, 20), (262144, 8))


def main():
    enable_cache()
    params = DEMO_PARAMS[0]

    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.symmetric_kernel import (
        nbody_step_symmetric_blocked,
        sym_blocking,
    )

    for n, iters in CASES:
        pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                               params.velocity_scale, seed=42)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        k, blk = sym_blocking(n)

        # correctness on-chip first: one step vs the one-sided kernel
        p1, _ = nbody_step_symmetric_blocked(p, v, 0.001, params.softening,
                                             params.damping)
        p2, _ = nbody_step_pallas(p, v, 0.001, params.softening,
                                  params.damping, tile_i=64, tile_j=32768,
                                  variant="vpu")
        dd = float(np.abs(np.asarray(p1)[:, :3] - np.asarray(p2)[:, :3]).max())
        print(json.dumps({"check": "blocked_vs_onesided_1step", "n": n,
                          "blocks": k, "block": blk, "max_dpos": dd}))
        sys.stdout.flush()
        assert dd <= 5e-4

        def one_sided(p, v):
            return nbody_step_pallas(p, v, params.time_step, params.softening,
                                     params.damping, tile_i=64, tile_j=32768,
                                     variant="vpu")

        ms = delta_time_rolls(one_sided, (p, v), iters=iters, rolls=3)
        g = n * n * 1e-9 * (1000.0 / ms)
        print(json.dumps({"kernel": "one_sided", "n": n,
                          "g_int_per_s": round(g, 1)}))
        sys.stdout.flush()

        for tj in (4096, 8192):
            def sym_blocked(p, v, tj=tj):
                return nbody_step_symmetric_blocked(
                    p, v, params.time_step, params.softening, params.damping,
                    tile_j=tj)
            ms = delta_time_rolls(sym_blocked, (p, v), iters=iters, rolls=3)
            g = n * n * 1e-9 * (1000.0 / ms)
            print(json.dumps({"kernel": "sym_blocked", "n": n, "tile_j": tj,
                              "blocks": k, "g_int_per_s": round(g, 1)}))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
