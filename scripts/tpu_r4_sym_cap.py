"""Blocked-sym block_cap sweep ABOVE the bench shape.

tpu_r4_sym_bench_shape.py showed block_cap=32768 beats the single
triangle at N=65536 (288.7 vs 285.3 G int/s, 3 reps): the cross
rectangles carry no triangle-walk machinery, and at cap=32768 half the
pairs move into them. This sweep asks whether the smaller cap also wins
where the blocked composition already ran (N >= 131072, r3 records at
cap=65536: 313.5 G at 131k, 327.4 G at 1M) — i.e. whether 32768 should
be the DEFAULT cap, not a bench-shape special case. One JSON line per
config.
"""

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

    shapes = [
        # (n, iters, rolls, [(cap, tile_j), ...])
        (131072, 25, 3, [(65536, 8192), (65536, 4096),
                         (32768, 8192), (32768, 4096)]),
        (1048576, 2, 2, [(65536, 8192), (32768, 8192), (32768, 4096)]),
    ]
    for n, iters, rolls, configs in shapes:
        pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                               params.velocity_scale, seed=42)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        for cap, tj in configs:
            def blocked(p, v, cap=cap, tj=tj):
                return nbody_step_symmetric_blocked(
                    p, v, params.time_step, params.softening,
                    params.damping, tile_j=tj, block_cap=cap)
            ms = delta_time_rolls(blocked, (p, v), iters=iters, rolls=rolls)
            print(json.dumps({
                "n": n, "block_cap": cap, "tile_j": tj,
                "ms_per_step": round(ms, 3),
                "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
