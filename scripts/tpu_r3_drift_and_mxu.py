"""r3 follow-ups: (a) p3m drift gap vs assignment scheme, (b) the one
unmeasured MXU config (Precision.HIGH / bf16_3x reduction).

(a) The r2 drift table recorded +0.80 (p3m, cic) vs +0.57 (exact) relative
drift x1e-3?? at the demo config — the gap is p3m mesh-force noise. TSC
halves the mesh error (0.135% vs 0.157% median at N=65536/G=64), so
measure whether it narrows the drift gap at equal cost elsewhere.

(b) The mxu variant runs its f32 reduction at Precision.HIGHEST; HIGH
(bf16_3x) halves the MXU passes. If it approached vpu's 220 G it would
matter; measured here for the record.
"""

import sys
import time

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.ops.energy import total_energy_f64
from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
from nbody_tpu.utils.timing import hard_sync, time_steps

P = DEMO_PARAMS[0]
N, STEPS = 65536, 1000


def drift_run(label, make_system):
    from nbody_tpu.models import BodySystem  # noqa: F401

    s = make_system()
    e0 = total_energy_f64(s.positions, s.velocities, P.softening)
    t0 = time.time()
    s.update_many(STEPS, P.time_step)
    s.hard_sync()
    wall = time.time() - t0
    e1 = total_energy_f64(s.positions, s.velocities, P.softening)
    drift = (e1 - e0) / abs(e0)
    print(f"{label:16s}: drift {drift:+.3e} over {STEPS} steps "
          f"({wall:.0f} s wall)", flush=True)
    return drift


def main():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    pos, vel = ic.generate(NBodyConfig.SHELL, N, P.cluster_scale,
                           P.velocity_scale, seed=42)
    params = NBodyParams(time_step=P.time_step, softening=P.softening,
                         damping=P.damping)

    def sysmk(**kw):
        return lambda: BodySystem(N, params, state=(pos.copy(), vel.copy()),
                                  **kw)

    drift_run("exact vpu", sysmk(backend="pallas"))
    drift_run("p3m cic", sysmk(backend="p3m"))
    drift_run("p3m tsc", sysmk(backend="p3m", pm_assignment="tsc"))

    # (b) mxu Precision.HIGH probe: override the precision pick via the
    # module hook and clear the jit cache so each precision re-traces
    import nbody_tpu.ops.pallas_kernel as pk

    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)
    for prec_name in ("HIGHEST", "HIGH"):
        prec = getattr(jax.lax.Precision, prec_name)
        pk._MXU_PRECISION_OVERRIDE = prec
        pk.nbody_step_pallas_vs.clear_cache()

        def step(p, v):
            return nbody_step_pallas(p, v, P.time_step, P.softening,
                                     P.damping, tile_i=64, tile_j=8192,
                                     variant="mxu")

        def make(k):
            @jax.jit
            def roll(p, v):
                def body(s, _):
                    return step(*s), None
                (p, v), _ = jax.lax.scan(body, (p, v), None, length=k)
                return p, v
            return roll

        times = {}
        try:
            for k in (25, 125):
                r = make(k)
                hard_sync(r(p0, v0))
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    hard_sync(r(p0, v0))
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            g = N * N * 100 / (times[125] - times[25]) / 1e9
            print(f"mxu {prec_name:7s}: {g:.1f} G int/s (delta-timed)",
                  flush=True)
        finally:
            pk._MXU_PRECISION_OVERRIDE = None


if __name__ == "__main__":
    main()
