"""Half-cap sweep for the OTHER sym families at the top of their
triangle ranges.

The euler force family's half-cap win (scripts/tpu_r4_sym_bench_shape.py:
cap=SYM_MAX_N/2 moves half the pairs into mask-free cross rectangles and
beats the single triangle 288.3-288.8 vs 285.1-286.5 G int/s at N=65536)
raises the same question for the accel+jerk and ds families, whose caps
sit lower (AJ_SYM_MAX_N=32768, DS_SYM_MAX_N=32768, DS_AJ_SYM_MAX_N=16384)
and whose walk machinery is heavier (6-12 reaction planes). This sweep
measures FULL steps (hermite for the aj families — 2 force evals, where
the halving is worth the most) at N = each family's cap: single triangle
(cap=N) vs half-cap blocked (cap=N/2), at the family default tile and
one narrower. g_int_per_s counts n^2 x evals/step. One JSON line per
config.
"""

import json
import sys

import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls


def bodies(n):
    params = DEMO_PARAMS[0]
    pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                           params.velocity_scale, seed=42)
    return jnp.asarray(pos), jnp.asarray(vel), params


def emit(family, n, cap, tj, ms, evals):
    print(json.dumps({
        "family": family, "n": n, "block_cap": cap, "tile_j": tj,
        "ms_per_step": round(ms, 3),
        "g_int_per_s": round(n * n * evals * 1e-6 / ms, 2)}))
    sys.stdout.flush()


def sweep_hermite_f32():
    from nbody_tpu.ops.reference import nbody_step_hermite
    from nbody_tpu.ops.symmetric_kernel import (
        AJ_SYM_MAX_N,
        AJ_SYM_TILE_J,
        compute_accel_jerk_symmetric_blocked,
    )

    n = AJ_SYM_MAX_N
    p, v, params = bodies(n)
    for cap in (n, n // 2):
        for tj in (AJ_SYM_TILE_J, AJ_SYM_TILE_J // 2):
            def step(p, v, cap=cap, tj=tj):
                return nbody_step_hermite(
                    p, v, params.time_step, params.softening,
                    params.damping,
                    accel_jerk_fn=lambda p4, v4:
                    compute_accel_jerk_symmetric_blocked(
                        p4, v4, params.softening, tile_j=tj,
                        block_cap=cap))
            ms = delta_time_rolls(step, (p, v), iters=15, rolls=3)
            emit("hermite_f32", n, cap, tj, ms, 2)


def sweep_ds_euler():
    from nbody_tpu.ops.ds_kernel import (
        DS_SYM_MAX_N,
        DS_SYM_TILE_J,
        _scal_ds,
        ds_from_f64,
        nbody_step_pallas_ds_sym_blocked,
    )

    n = DS_SYM_MAX_N
    p, v, params = bodies(n)
    ph, plo = ds_from_f64(jnp.asarray(p, jnp.float64))
    vh, vlo = ds_from_f64(jnp.asarray(v, jnp.float64))
    scal = _scal_ds(params.time_step, params.softening, params.damping)
    for cap in (n, n // 2):
        for tj in (DS_SYM_TILE_J, DS_SYM_TILE_J // 2):
            def step(ph, plo, vh, vlo, cap=cap, tj=tj):
                return nbody_step_pallas_ds_sym_blocked(
                    ph, plo, vh, vlo, scal, tile_j=tj, block_cap=cap)
            ms = delta_time_rolls(step, (ph, plo, vh, vlo), iters=10,
                                  rolls=3)
            emit("ds_euler", n, cap, tj, ms, 1)


def sweep_ds_hermite():
    from nbody_tpu.ops.ds_kernel import (
        DS_AJ_SYM_MAX_N,
        DS_AJ_SYM_TILE_J,
        _scal_ds_hermite,
        ds_from_f64,
        nbody_step_pallas_ds_hermite,
    )

    n = DS_AJ_SYM_MAX_N
    p, v, params = bodies(n)
    ph, plo = ds_from_f64(jnp.asarray(p, jnp.float64))
    vh, vlo = ds_from_f64(jnp.asarray(v, jnp.float64))
    scal = _scal_ds_hermite(params.time_step, params.softening,
                            params.damping)
    for cap in (n, n // 2):
        for tj in (DS_AJ_SYM_TILE_J, DS_AJ_SYM_TILE_J // 2):
            def step(ph, plo, vh, vlo, cap=cap, tj=tj):
                return nbody_step_pallas_ds_hermite(
                    ph, plo, vh, vlo, scal, tile_j=tj, sym=True,
                    block_cap=cap)
            ms = delta_time_rolls(step, (ph, plo, vh, vlo), iters=5,
                                  rolls=3)
            emit("ds_hermite", n, cap, tj, ms, 2)


def main():
    enable_cache()
    sweep_hermite_f32()
    sweep_ds_euler()
    sweep_ds_hermite()


if __name__ == "__main__":
    main()
