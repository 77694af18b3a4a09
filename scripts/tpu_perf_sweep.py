"""Perf sweep: vpu tile frontier, fp64 benchmark row, hostmem rollout gain.

VERDICT r1 items 3/5/8: attack the exact-fp32 tile space (is vpu really
ceiling-bound at every tile shape?), record the fp64 ms/step + GFLOP/s row
at N=16384 the reference benchmarks (compute.cpp:16-18), and quantify the
single-dispatch hostmem rollout win. One JSON line per section.
"""

import json
import time

N_SWEEP = 65536
SWEEP_STEPS = 10
VPU_TILES = ((128, 4096), (256, 1024), (256, 4096), (512, 2048),
             (512, 4096), (1024, 4096), (1024, 8192))
MXU_TILES = ((512, 4096), (1024, 8192), (2048, 8192), (1024, 4096))

N_FP64 = 16384
FP64_ITERS = 10

N_HOST = 16384
HOST_STEPS = 100


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax

    jax.config.update("jax_enable_x64", True)  # for the fp64 row

    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.utils.timing import hard_sync

    assert jax.default_backend() != "cpu"
    params = DEMO_PARAMS[0]
    dt, soft, damp = params.time_step, params.softening, params.damping

    # ---- 1. tile sweep (vpu exact-fp32 frontier + mxu_bf16 check) ----
    pos, vel = ic.generate(NBodyConfig.SHELL, N_SWEEP, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

    def timed(variant, ti, tj):
        @jax.jit
        def roll(p, v):
            def body(s, _):
                return nbody_step_pallas(*s, dt, soft, damp, tile_i=ti,
                                         tile_j=tj, variant=variant), None
            (p, v), _ = jax.lax.scan(body, (p, v), None, length=SWEEP_STEPS)
            return p, v
        try:
            hard_sync(roll(p0, v0))
            t0 = time.perf_counter()
            hard_sync(roll(p0, v0))
            el = time.perf_counter() - t0
        except Exception as e:
            print(f"  {variant} ti={ti} tj={tj}: failed ({type(e).__name__})",
                  flush=True)
            return None
        gips = N_SWEEP * N_SWEEP * SWEEP_STEPS / el / 1e9
        print(f"  {variant:9s} ti={ti:5d} tj={tj:5d}: {gips:7.1f} G int/s",
              flush=True)
        return round(gips, 1)

    sweep = {}
    for ti, tj in VPU_TILES:
        sweep[f"vpu_{ti}_{tj}"] = timed("vpu", ti, tj)
    for ti, tj in MXU_TILES:
        sweep[f"mxu_bf16_{ti}_{tj}"] = timed("mxu_bf16", ti, tj)
    print(json.dumps({"section": "tile_sweep", "n": N_SWEEP,
                      "g_int_s": sweep}))

    # ---- 2. fp64 benchmark row (XLA path, genuine f64) ----
    from nbody_tpu.ops.reference import nbody_step_xla

    pos64, vel64 = ic.generate(NBodyConfig.SHELL, N_FP64, params.cluster_scale,
                               params.velocity_scale, seed=42,
                               dtype=np.float64)
    p64, v64 = jnp.asarray(pos64), jnp.asarray(vel64)
    assert p64.dtype == jnp.float64

    @jax.jit
    def roll64(p, v):
        def body(s, _):
            return nbody_step_xla(*s, dt, soft, damp), None
        (p, v), _ = jax.lax.scan(body, (p, v), None, length=FP64_ITERS)
        return p, v

    hard_sync(roll64(p64, v64))
    t0 = time.perf_counter()
    hard_sync(roll64(p64, v64))
    ms = (time.perf_counter() - t0) * 1e3
    ms_per_step = ms / FP64_ITERS
    gips64 = N_FP64 * N_FP64 / (ms_per_step * 1e-3) / 1e9
    print(json.dumps({"section": "fp64_row", "n": N_FP64,
                      "ms_per_step": round(ms_per_step, 3),
                      "g_int_s": round(gips64, 2),
                      "gflops_at_30": round(gips64 * 30.0, 1)}))

    # ---- 3. hostmem rollout: one dispatch vs per-step dispatch ----
    jax.config.update("jax_enable_x64", False)
    from nbody_tpu.models import BodySystem

    b = BodySystem(N_HOST, params, backend="pallas", placement="host", seed=1)
    b.update_many(HOST_STEPS)  # warm-up/compile
    b.reset(params, NBodyConfig.SHELL, seed=1)
    t0 = time.perf_counter()
    b.update_many(HOST_STEPS)
    t_scan = time.perf_counter() - t0

    b.reset(params, NBodyConfig.SHELL, seed=1)
    b.update()  # warm the single-step dispatch path
    t0 = time.perf_counter()
    for _ in range(HOST_STEPS):
        b.update()
    t_loop = time.perf_counter() - t0
    print(json.dumps({"section": "hostmem", "n": N_HOST, "steps": HOST_STEPS,
                      "scan_s": round(t_scan, 3), "loop_s": round(t_loop, 3),
                      "speedup": round(t_loop / t_scan, 2)}))


if __name__ == "__main__":
    main()
