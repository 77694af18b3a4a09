"""Driver benchmark: prints ONE JSON line with the headline metric.

Config = BASELINE.json configs[1]: fp32 tiled all-pairs at N=65536, shell
init, demo-0 params (dt=0.016, softening=0.1, damping=1.0), reporting
GFLOP/s at the reference's 20-flops-per-interaction convention
(/root/reference/src/nbody/compute.cpp:16-18,118-120).

The kernel is the exact-fp32 Newton's-third-law `sym` variant
(ops/symmetric_kernel.py): each pair evaluated ONCE, both sides
accumulated — same math as the one-sided vpu kernel to reduction-order
rounding (drift-faithful by construction since the arithmetic is
identical exact fp32). The shape is the HALF-CAP blocked composition
(block_cap=32768, tile_j=4096): half the pairs run as mask-free cross
rectangles with no triangle-walk machinery, measured 288.7 G int/s at
this shape vs the single triangle's 285.3 and the one-sided vpu
champion's 221.2 (scripts/tpu_r4_sym_bench_shape.py,
scripts/tpu_r3_symmetric.py). Deliberately NOT the faster mxu_bf16
mode: the measured drift table (PARITY.md) shows bf16-reduction force
noise makes the simulation explode by 10k steps, so its throughput
would be for a different simulation than the reference runs.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is a nominal 2000 fp32 GFLOP/s — the ballpark a modern desktop
GPU reaches on the CUDA sample's own --benchmark at this N — making
vs_baseline ~= "multiples of a typical CUDA-sample run".
"""

import json
import sys

N = 65536
ITERS = 25
BASELINE_GFLOPS = 2000.0

# CPU-fallback sizing: the official N=65536 x 25-step x 3-roll config takes
# >10 min of host all-pairs compute (it timed out the round-2 slow-tier
# test); the fallback exists to prove the bench pipeline end-to-end, not to
# measure the host, so it runs a config that finishes in seconds.
N_CPU = 8192
ITERS_CPU = 5


def main() -> int:
    from nbody_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()

    import os

    import jax

    # Honor JAX_PLATFORMS even when a sitecustomize registered an
    # accelerator plugin at interpreter start (which latches the platform
    # before this process's env var is consulted). Backends are lazy, so
    # updating the live config here — before any device is touched — works;
    # this is what `JAX_PLATFORMS=cpu python bench.py` (CI + the slow-tier
    # test) relies on to actually exercise the CPU fallback.
    _want = os.environ.get("JAX_PLATFORMS", "")
    if _want:
        jax.config.update("jax_platforms", _want)

    import jax.numpy as jnp

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.utils.timing import delta_time_rolls

    params = DEMO_PARAMS[0]
    on_tpu = jax.default_backend() != "cpu"
    n = N if on_tpu else N_CPU
    iters = ITERS if on_tpu else ITERS_CPU
    rolls = 3 if on_tpu else 2

    pos, vel = ic.generate(NBodyConfig.SHELL, n, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p, v = jnp.asarray(pos), jnp.asarray(vel)

    if on_tpu:
        from nbody_tpu.ops.symmetric_kernel import (
            nbody_step_symmetric_blocked,
        )

        # fastest DRIFT-FAITHFUL configuration measured on v5e: the exact
        # fp32 Newton's-third-law kernel, half-cap blocked composition —
        # 288.7 G int/s at (cap=32768, ti=64, tj=4096) vs the single
        # triangle's 285.3 and the one-sided vpu champion's 221.2
        # (scripts/tpu_r4_sym_bench_shape.py, scripts/tpu_r3_symmetric.py)
        def step(p, v):
            return nbody_step_symmetric_blocked(p, v, params.time_step,
                                                params.softening,
                                                params.damping,
                                                tile_i=64, tile_j=4096,
                                                block_cap=32768)
    else:  # CPU fallback so the bench always reports something
        from nbody_tpu.ops.reference import nbody_step_xla

        step = jax.jit(
            lambda p, v: nbody_step_xla(p, v, params.time_step,
                                        params.softening, params.damping)
        )

    # DELTA timing (utils.timing.delta_time_rolls): scan rollouts so the
    # relay's fixed per-dispatch cost (~55-60 ms here) cancels exactly —
    # the shared recipe for every measurement in this repo
    ms_per_step = delta_time_rolls(step, (p, v), iters=iters, rolls=rolls)
    steps_per_s = 1000.0 / ms_per_step
    interactions = n * n * 1e-9 * steps_per_s
    gflops = interactions * 20.0

    # pure exact-fp32 pipeline end to end (the vpu kernel), so the metric
    # name needs no precision qualifier
    name = f"fp32_gflops_n{n}" if on_tpu else f"fp32_gflops_n{n}_cpu_fallback"
    print("# vs_baseline denominator is NOMINAL (2000 GFLOP/s, a typical "
          "desktop-GPU run of the CUDA sample; the reference publishes no "
          "numbers — see BASELINE.md)", file=sys.stderr)
    print(json.dumps({
        "metric": name,
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
