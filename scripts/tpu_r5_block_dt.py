"""r5 item 3: per-body block timesteps vs the global adaptive dt —
the measured adopt/reject comparison (ARCHITECTURE "Per-body block
timesteps").

Config: a cold collapsing shell (velocity_scale=0 — purely radial
infall; the regime where the core's criterion dt plunges while the
halo's is unchanged, i.e. where a global dt wastes the most work).
Both integrators share the criterion family eta*sqrt(eps/|a_i|): the
global path takes the MIN over bodies each step, the block path gives
each body its own power-of-two rung, deepest rung = dt_max/2^(K-1)
(play the role of the global path's dt_min).

Measured per scheme, at equal simulated time:
  * force-eval ROWS (the work unit: one row = N pair interactions)
  * wall-clock on the chip (hard-synced, one warmed rep)
  * relative energy drift |E(T)-E(0)|/|E(0)| (fp64-precise energies)

Run (ONE TPU process at a time): python scripts/tpu_r5_block_dt.py
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
K = 5
ETA = 0.05
MACROS = 40
PRM = NBodyParams(time_step=0.01, cluster_scale=0.4, velocity_scale=0.0,
                  softening=0.05, damping=1.0)


def fresh():
    return BodySystem(N, PRM, backend="pallas", seed=11,
                      config=NBodyConfig.SHELL)


def run_block():
    bs = fresh()
    e0 = bs.total_energy(precise=True)
    # warm the compile on a throwaway segment shape
    bs._block_rollout_fn(min(MACROS, max(1, bs._segment_steps()
                                         // (1 << (K - 1)))), ETA,
                         PRM.time_step, K)
    t0 = time.perf_counter()
    st = bs.update_many_block(MACROS, eta=ETA, n_classes=K)
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": f"block K={K}", "t": st["t"], "rows": st["rows"],
            "k_max": st["k_max"], "wall_s": round(wall, 3),
            "drift": abs(e1 - e0) / abs(e0)}


def run_global(target_t, dt_min):
    bs = fresh()
    e0 = bs.total_energy(precise=True)
    # warm one segment
    bs.update_many_adaptive(1, eta=ETA, dt_min=dt_min,
                            dt_max=PRM.time_step)
    bs = fresh()
    t0 = time.perf_counter()
    t = 0.0
    steps = 0
    chunk = 64
    while t < target_t:
        st = bs.update_many_adaptive(chunk, eta=ETA, dt_min=dt_min,
                                     dt_max=PRM.time_step)
        t += st["t"]
        steps += chunk
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": "global adaptive", "t": t, "rows": float(steps) * N,
            "steps": steps, "wall_s": round(wall, 3),
            "drift": abs(e1 - e0) / abs(e0)}


deep = PRM.time_step / (1 << (K - 1))
blk = run_block()
print(json.dumps(blk), flush=True)
glob = run_global(blk["t"], deep)
print(json.dumps(glob), flush=True)
print(json.dumps({
    "row_ratio_block_over_global": blk["rows"] / glob["rows"],
    "wall_ratio_block_over_global": blk["wall_s"] / glob["wall_s"],
    "drift_block": blk["drift"], "drift_global": glob["drift"],
    "simulated_t": blk["t"], "N": N, "K": K, "eta": ETA,
}, indent=2))
