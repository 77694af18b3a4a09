"""Round-2 wrap: run the drift-gated autotuner live, then the headline
kernel's N-scaling table.

1. `autotune(65536)` end-to-end on the chip — expects the gate to REJECT the
   mxu_bf16 candidates on measured drift and cache a vpu winner.
2. vpu (ti=64, tj=32768) scan-rollout throughput at N = 16k..1M for the
   PARITY.md table.
"""

import json
import time

SCALING = ((16384, 50), (65536, 25), (262144, 10), (1048576, 3))


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax
    import jax.numpy as jnp

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.tune import autotune
    from nbody_tpu.utils.timing import hard_sync

    assert jax.default_backend() != "cpu"

    best = autotune(65536, steps=20)
    print(json.dumps({"section": "autotune", "best": best}))

    params = DEMO_PARAMS[0]
    dt, soft, damp = params.time_step, params.softening, params.damping
    rows = []
    for n, iters in SCALING:
        pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                               params.velocity_scale, seed=42)
        p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

        @jax.jit
        def roll(p, v, iters=iters):
            def body(s, _):
                return nbody_step_pallas(*s, dt, soft, damp, tile_i=64,
                                         tile_j=32768, variant="vpu"), None
            (p, v), _ = jax.lax.scan(body, (p, v), None, length=iters)
            return p, v

        hard_sync(roll(p0, v0))
        el = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            hard_sync(roll(p0, v0))
            el = min(el, time.perf_counter() - t0)
        ms_step = el * 1e3 / iters
        gips = n * n / (ms_step * 1e-3) / 1e9
        rows.append({"n": n, "ms_per_step": round(ms_step, 2),
                     "g_int_s": round(gips, 1),
                     "gflops": round(gips * 20, 0)})
        print(f"vpu n={n:8d}: {ms_step:9.2f} ms/step  {gips:6.1f} G int/s",
              flush=True)
    print(json.dumps({"section": "vpu_scaling", "rows": rows}))


if __name__ == "__main__":
    main()
