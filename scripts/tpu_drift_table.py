"""Long-horizon energy-drift characterization per kernel variant.

VERDICT r1: the headline perf number uses mxu_bf16, whose accuracy evidence
was a 1-step QA pass. This measures relative energy drift |E_k - E_0| / |E_0|
at N=65536 over 100 / 1,000 / 10,000 steps for every kernel variant, with
the energy functional evaluated in GENUINE fp64 (XLA path) so the comparison
is not polluted by f32 summation error. The exact-fp32 `vpu` kernel is the
anchor: a variant is drift-faithful if its drift matches vpu's.

Config = BASELINE configs[1] geometry: shell init, demo-0 params
(dt=0.016, softening=0.1, damping=1.0). Emits a markdown table for PARITY.md
plus one JSON line. Runtime: ~25 min on one v5e chip.
"""

import json
import time

N = 65536
CHUNK = 100                      # steps per compiled rollout dispatch
CHECKPOINTS = (100, 1000, 10000)
VARIANTS = (
    ("sym", "sym"),     # Newton's-third-law kernel (ops/symmetric_kernel.py)
    ("vpu", dict(variant="vpu", tile_i=256, tile_j=1024)),
    ("mxu", dict(variant="mxu", tile_i=1024, tile_j=8192)),
    ("mxu_bf16", dict(variant="mxu_bf16", tile_i=1024, tile_j=8192)),
    ("xla", None),               # portable f32 path, sanity row
)
XLA_MAX_STEPS = 1000             # the XLA row is a sanity anchor, keep it short


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax

    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.energy import total_energy
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.reference import nbody_step_xla
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.utils.timing import hard_sync

    assert jax.default_backend() != "cpu", "drift table runs on the TPU"
    params = DEMO_PARAMS[0]
    dt, soft, damp = params.time_step, params.softening, params.damping

    pos0, vel0 = ic.generate(NBodyConfig.SHELL, N, params.cluster_scale,
                             params.velocity_scale, seed=42)

    @jax.jit
    def energy64(p, v):
        return total_energy(p.astype(jnp.float64), v.astype(jnp.float64),
                            soft, chunk_size=4096)

    def make_rollout(kw):
        if kw is None:
            def step(p, v):
                return nbody_step_xla(p, v, dt, soft, damp)
        elif kw == "sym":
            from nbody_tpu.ops.symmetric_kernel import nbody_step_symmetric

            def step(p, v):
                return nbody_step_symmetric(p, v, dt, soft, damp)
        else:
            def step(p, v):
                return nbody_step_pallas(p, v, dt, soft, damp, **kw)

        @jax.jit
        def roll(p, v):
            def body(s, _):
                return step(*s), None
            (p, v), _ = jax.lax.scan(body, (p, v), None, length=CHUNK)
            return p, v
        return roll

    results = {}
    for name, kw in VARIANTS:
        max_steps = XLA_MAX_STEPS if name == "xla" else max(CHECKPOINTS)
        roll = make_rollout(kw)
        p = jnp.asarray(pos0)
        v = jnp.asarray(vel0)
        e0 = float(energy64(p, v))
        row = {"e0": e0, "drift": {}, "g_int_s": None}
        # warm-up compile outside the timed region
        pw, vw = roll(p, v)
        hard_sync((pw, vw))
        del pw, vw
        done = 0
        t_steps = 0.0
        for target in CHECKPOINTS:
            if target > max_steps:
                break
            t0 = time.perf_counter()
            while done < target:
                p, v = roll(p, v)
                done += CHUNK
            hard_sync((p, v))
            t_steps += time.perf_counter() - t0
            ek = float(energy64(p, v))
            row["drift"][target] = (ek - e0) / abs(e0)
            print(f"{name:9s} steps={target:6d}  E={ek:+.9e}  "
                  f"drift={(ek - e0) / abs(e0):+.3e}", flush=True)
        row["g_int_s"] = round(N * N * done / t_steps / 1e9, 1)
        results[name] = row

    # markdown table for PARITY.md
    print("\n| variant | " + " | ".join(f"drift @{k}" for k in CHECKPOINTS)
          + " | G int/s |")
    print("|---|" + "---|" * (len(CHECKPOINTS) + 1))
    for name, row in results.items():
        cells = [f"{row['drift'][k]:+.3e}" if k in row["drift"] else "—"
                 for k in CHECKPOINTS]
        print(f"| {name} | " + " | ".join(cells) + f" | {row['g_int_s']} |")

    print(json.dumps({
        "n": N, "dt": dt, "softening": soft, "damping": damp,
        "results": {k: {"drift": {str(s): round(d, 6) for s, d in r["drift"].items()},
                        "g_int_s": r["g_int_s"]} for k, r in results.items()},
    }))


if __name__ == "__main__":
    main()
