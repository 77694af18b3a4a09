"""r5 item 3, round 2: block timesteps in their DESIGN regime.

Round 1 (tpu_r5_block_dt.py) measured the violent cold-collapse shell:
block computed 36% of global's rows but lost 3.1x on wall-clock
(substep serialization) and exploded the energy drift (14.6 vs 0.27) —
macro-frozen rungs misclassify when every body's criterion dt plunges
simultaneously. That is the worst case for ANY per-body ladder (there
is no dt stratification to exploit once the whole system hits the
caustic together).

This round measures the regime block steps exist for: a Plummer
equilibrium sphere — a dense core needing small dt under a halo content
with dt_max, stratification QUASI-STATIC so macro-frozen rungs stay
valid. Same protocol: rows, wall (warmed, hard-synced), fp64-precise
energy drift, at equal simulated time; global adaptive at the same eta
is the baseline.

Run (ONE TPU process at a time): python scripts/tpu_r5_block_dt2.py
"""

import json
import time

import numpy as np

import jax

from nbody_tpu import NBodyConfig
from nbody_tpu.models.body_system import BodySystem
from nbody_tpu.params import NBodyParams

assert jax.default_backend() != "cpu", "needs the TPU attachment"

N = 16384
MACROS = 40
# equilibrium Plummer: a=0.3 concentrates the core; vscale=1 =
# self-consistent virial velocities; small softening resolves the core
PRM = NBodyParams(time_step=0.01, cluster_scale=0.3, velocity_scale=1.0,
                  softening=0.02, damping=1.0)


def fresh():
    return BodySystem(N, PRM, backend="pallas", seed=11,
                      config=NBodyConfig.PLUMMER)


def run_block(eta, k):
    bs = fresh()
    e0 = bs.total_energy(precise=True)
    bs.update_many_block(1, eta=eta, n_classes=k)   # warm the compiles
    bs = fresh()
    t0 = time.perf_counter()
    st = bs.update_many_block(MACROS, eta=eta, n_classes=k)
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": f"block K={k} eta={eta}", "t": st["t"],
            "rows": st["rows"], "k_max": st["k_max"],
            "wall_s": round(wall, 3), "drift": abs(e1 - e0) / abs(e0)}


def run_global(eta, target_t, dt_min):
    bs = fresh()
    e0 = bs.total_energy(precise=True)
    bs.update_many_adaptive(1, eta=eta, dt_min=dt_min,
                            dt_max=PRM.time_step)   # warm
    bs = fresh()
    t0 = time.perf_counter()
    t, steps, chunk = 0.0, 0, 64
    while t < target_t:
        st = bs.update_many_adaptive(chunk, eta=eta, dt_min=dt_min,
                                     dt_max=PRM.time_step)
        t += st["t"]
        steps += chunk
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": f"global eta={eta}", "t": t,
            "rows": float(steps) * N, "steps": steps,
            "wall_s": round(wall, 3), "drift": abs(e1 - e0) / abs(e0)}


ETA, K = 0.05, 5
blk = run_block(ETA, K)
print(json.dumps(blk), flush=True)
deep = PRM.time_step / (1 << (K - 1))
glob = run_global(ETA, blk["t"], deep)
print(json.dumps(glob), flush=True)
print(json.dumps({
    "config": "plummer a=0.3 vscale=1 eps=0.02",
    "row_ratio_block_over_global": blk["rows"] / glob["rows"],
    "wall_ratio_block_over_global": blk["wall_s"] / glob["wall_s"],
    "drift_block": blk["drift"], "drift_global": glob["drift"],
    "simulated_t": blk["t"], "N": N, "K": K, "eta": ETA,
}, indent=2))
