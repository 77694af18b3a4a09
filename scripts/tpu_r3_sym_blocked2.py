"""Blocked-sym follow-ups: (a) does splitting the OFFICIAL shape
(N=65536) into sub-cap blocks beat the single triangle (the cross
rectangles are mask-free and halve the reaction scratch)? (b) large-N
rates for the PARITY table. One JSON line per configuration."""

import json
import sys

import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls


def main():
    enable_cache()
    params = DEMO_PARAMS[0]

    from nbody_tpu.ops.symmetric_kernel import (
        nbody_step_symmetric,
        nbody_step_symmetric_blocked,
    )

    # (a) the official shape with forced sub-blocking
    n = 65536
    pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p, v = jnp.asarray(pos), jnp.asarray(vel)

    def tri(p, v):
        return nbody_step_symmetric(p, v, params.time_step, params.softening,
                                    params.damping, tile_j=4096)

    ms = delta_time_rolls(tri, (p, v), iters=25, rolls=3)
    print(json.dumps({"kernel": "sym_triangle", "n": n,
                      "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
    sys.stdout.flush()

    for cap, tj in ((32768, 4096), (32768, 8192), (16384, 4096),
                    (32768, 16384)):
        def blocked(p, v, cap=cap, tj=tj):
            return nbody_step_symmetric_blocked(
                p, v, params.time_step, params.softening, params.damping,
                tile_j=tj, block_cap=cap)
        ms = delta_time_rolls(blocked, (p, v), iters=25, rolls=3)
        print(json.dumps({"kernel": "sym_blocked", "n": n, "block_cap": cap,
                          "tile_j": tj,
                          "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
        sys.stdout.flush()

    # (b) large N for the PARITY table (iters sized for the ~90 s
    # dispatch watchdog: 5*iters steps * ~N^2/300e9 s/step << 90 s)
    for n, iters in ((524288, 3), (1048576, 1)):
        pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                               params.velocity_scale, seed=42)
        p, v = jnp.asarray(pos), jnp.asarray(vel)

        def blocked(p, v):
            return nbody_step_symmetric_blocked(
                p, v, params.time_step, params.softening, params.damping,
                tile_j=8192)
        ms = delta_time_rolls(blocked, (p, v), iters=iters, rolls=3)
        print(json.dumps({"kernel": "sym_blocked", "n": n, "tile_j": 8192,
                          "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
