"""Blocked-sym at the OFFICIAL bench shape (N=65536): does the blockwise
composition beat the single triangle on its home turf?

The r3 sweeps measured the blocked composition only at N>=131072 (where
the single triangle cannot run); at N=65536 `variant='sym'` delegates to
the single triangle (285.3 G int/s champion). But the r4 cost budget
(docs/ARCHITECTURE.md "Where the missing 0.7x goes") prices the
triangle-WALK overhead at 1.85 ms of the 15.2 ms step — and the blocked
composition replaces (k-1)/k of the pair work with mask-free cross
rectangles that carry no walk machinery at all. At block_cap=16384 that
is 75% of the pairs; at 8192, 87.5%. This sweep measures whether the
swap wins at the bench shape. One JSON line per config.

Hazard gate respected: tile_j > block_cap/2 leaves the cross kernel a
single-grid-step program that overflows Mosaic's scoped-vmem stack.
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

    n, iters = 65536, 25
    pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    configs = [(65536, 4096)]  # the incumbent: single triangle champion
    for cap in (8192, 16384, 32768):
        for tj in (2048, 4096, 8192, 16384):
            if tj > cap // 2:
                continue
            configs.append((cap, tj))
    for cap, tj in configs:
        def blocked(p, v, cap=cap, tj=tj):
            return nbody_step_symmetric_blocked(
                p, v, params.time_step, params.softening,
                params.damping, tile_j=tj, block_cap=cap)
        ms = delta_time_rolls(blocked, (p, v), iters=iters, rolls=3)
        print(json.dumps({
            "n": n, "block_cap": cap, "tile_j": tj,
            "ms_per_step": round(ms, 3),
            "g_int_per_s": round(n * n * 1e-6 / ms, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
