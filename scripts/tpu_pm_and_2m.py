"""PM throughput/crossover table + the exact kernel's 2M-body row +
a compiled ring_fused lowering check (post index-map fix).

One serial TPU session (single-client tunnel). JSON line per section.
"""

import json
import time


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.pm import pm_accel
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.utils.timing import hard_sync

    assert jax.default_backend() != "cpu"
    params = DEMO_PARAMS[0]
    dt, soft, damp = params.time_step, params.softening, params.damping

    # ---- 1. PM accel time vs N (and the direct-sum crossover) ----
    rows = []
    for n in (65536, 262144, 1048576, 4194304):
        pos, _ = ic.generate(NBodyConfig.RANDOM, n, 1.5, 2.0, seed=0)
        p = jnp.asarray(pos)
        f = jax.jit(lambda q: pm_accel(q, grid=64))
        hard_sync(f(p))
        el = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            hard_sync(f(p))
            el = min(el, time.perf_counter() - t0)
        direct_ms = n * n / 221.5e9 * 1e3  # from the measured vpu rate
        rows.append({"n": n, "pm_ms": round(el * 1e3, 1),
                     "direct_ms_est": round(direct_ms, 1)})
        print(f"pm n={n:8d}: {el * 1e3:8.1f} ms  (direct est "
              f"{direct_ms:9.1f} ms)", flush=True)
    print(json.dumps({"section": "pm_scaling_g64", "rows": rows}))

    # ---- 2. exact vpu kernel at N=2M ----
    n, iters = 2097152, 3
    pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

    @jax.jit
    def roll(p, v):
        def body(s, _):
            return nbody_step_pallas(*s, dt, soft, damp, tile_i=64,
                                     tile_j=32768, variant="vpu"), None
        (p, v), _ = jax.lax.scan(body, (p, v), None, length=iters)
        return p, v

    hard_sync(roll(p0, v0))
    t0 = time.perf_counter()
    hard_sync(roll(p0, v0))
    el = time.perf_counter() - t0
    ms_step = el * 1e3 / iters
    gips = n * n / (ms_step * 1e-3) / 1e9
    print(json.dumps({"section": "vpu_2m", "n": n,
                      "ms_per_step": round(ms_step, 1),
                      "g_int_s": round(gips, 1),
                      "gflops": round(gips * 20, 0)}))

    # ---- 3. ring_fused compiled Mosaic lowering (1-device mesh) ----
    from nbody_tpu.parallel import make_mesh, make_sharded_step, shard_state
    from nbody_tpu.ops.reference import nbody_step_xla

    mesh = make_mesh(1)
    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=3)
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="ring_fused",
                             tile_i=256, interpret=False)
    p1, v1 = step(ps, vs, 0.001, soft, damp)
    hard_sync((p1, v1))
    ref_p, _ = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.001,
                              soft, damp)
    err = float(np.abs(np.asarray(p1)[:, :3] - np.asarray(ref_p)[:, :3]).max())
    print(json.dumps({"section": "ring_fused_compiled_1dev",
                      "max_dpos_vs_xla": err, "ok": err < 5e-4}))


if __name__ == "__main__":
    main()
