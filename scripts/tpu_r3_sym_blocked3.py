"""Blocked-sym default sweep: block size x tile_j at mid-size N. Smaller
blocks raise the mask-free cross fraction ((k-1)/k of the pair work) but
add launches; this picks the production default. One JSON line each."""

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
    from nbody_tpu.ops.symmetric_kernel import nbody_step_symmetric_blocked

    for n, iters in ((131072, 20), (262144, 8)):
        pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                               params.velocity_scale, seed=42)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        for cap in (16384, 32768, 65536):
            for tj in (4096, 8192, 16384):
                if tj > cap:
                    continue

                def blocked(p, v, cap=cap, tj=tj):
                    return nbody_step_symmetric_blocked(
                        p, v, params.time_step, params.softening,
                        params.damping, tile_j=tj, block_cap=cap)
                ms = delta_time_rolls(blocked, (p, v), iters=iters, rolls=3)
                print(json.dumps({
                    "n": n, "block_cap": cap, "tile_j": tj,
                    "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
                sys.stdout.flush()


if __name__ == "__main__":
    main()
