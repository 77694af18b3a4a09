"""Physics-quality evidence on the chip: symplectic soak + demo artifact.

1. Leapfrog soak: 20,000 steps at N=16384 (demo-0 params, dt scaled down to
   a stable regime) — symplectic integrators must show BOUNDED energy
   drift, unlike the damped-Euler demo integrator. Records drift at
   checkpoints.
2. Galaxy-collision frame render at 1M bodies — BASELINE config[4]
   (per-step rasterization + export) timed on-chip.
"""

import json
import time

N_SOAK = 16384
SOAK_STEPS = 20000
SOAK_DT = 0.001
CHUNK = 1000


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops.energy import total_energy
    from nbody_tpu.params import DEMO_PARAMS
    from nbody_tpu.utils.timing import hard_sync

    assert jax.default_backend() != "cpu"

    # ---- 1. leapfrog soak ----
    params = DEMO_PARAMS[0].replace(time_step=SOAK_DT, damping=1.0)
    s = BodySystem(N_SOAK, params, backend="pallas", integrator="leapfrog",
                   seed=42)

    def energy():
        return float(total_energy(jnp.asarray(s.positions),
                                  jnp.asarray(s.velocities),
                                  params.softening, chunk_size=4096))

    e0 = energy()
    drifts = {}
    done = 0
    t0 = time.perf_counter()
    while done < SOAK_STEPS:
        s.update_many(CHUNK, SOAK_DT)
        done += CHUNK
        if done in (1000, 5000, 10000, 20000):
            s.hard_sync()
            d = (energy() - e0) / abs(e0)
            drifts[done] = round(d, 6)
            print(f"leapfrog soak {done:6d} steps: drift {d:+.3e}",
                  flush=True)
    wall = time.perf_counter() - t0
    bounded = all(abs(d) < 0.01 for d in drifts.values())
    print(json.dumps({"section": "leapfrog_soak", "n": N_SOAK,
                      "dt": SOAK_DT, "drifts": drifts,
                      "bounded_1pct": bounded,
                      "wall_s": round(wall, 1)}))

    # ---- 2. 1M-body galaxy frame render ----
    from nbody_tpu.render import Camera, FrameRenderer

    pos, vel = ic.galaxy_collision(1048576, seed=7)
    p = jnp.asarray(pos)
    cam = Camera(origin=(0.0, -2.0, -100.0))
    # the CLI's large-N splat default (splat=8 above 262k bodies,
    # cli.py) — the documented 735 ms/frame configuration
    r = FrameRenderer(width=1024, height=768, splat=8)
    frame = r.render(p, cam)  # compile + first frame
    t0 = time.perf_counter()
    frame = r.render(p, cam)
    el = time.perf_counter() - t0
    ok = bool(np.isfinite(frame.astype(np.float64)).all() and frame.sum() > 0)
    print(json.dumps({"section": "render_1m", "ms_per_frame": round(el * 1e3, 1),
                      "resolution": [1024, 768], "ok": ok}))


if __name__ == "__main__":
    main()
