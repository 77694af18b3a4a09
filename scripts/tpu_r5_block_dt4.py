"""r5 item 3, round 4: the N-scaling point.

Rounds 1-3 measured N=16384: the ladder's row saving materializes with
stratification depth (rows 0.85x global at k_max=4) but wall-clock
stays behind (1.58x) — the substep machinery (per-macro sort, dynamic
while_loop tile walks, 2^(K-1) sequential boundaries) costs more than
the rows it saves at this N. Those overheads are O(N log N) and
O(substeps); the row work is O(N^2), so the crossover — if it exists on
this chip — arrives with N. This measures the same deep-stratification
config at N=65536.

Run (ONE TPU process at a time): python scripts/tpu_r5_block_dt4.py
"""

import json
import time

import jax

from nbody_tpu import NBodyConfig
from nbody_tpu.models.body_system import BodySystem
from nbody_tpu.params import NBodyParams

assert jax.default_backend() != "cpu", "needs the TPU attachment"

N = 65536
K = 6
ETA = 0.05
MACROS = 10
PRM = NBodyParams(time_step=0.01, cluster_scale=0.15, velocity_scale=1.0,
                  softening=0.005, damping=1.0)


def fresh(integrator="euler"):
    return BodySystem(N, PRM, backend="pallas", seed=11,
                      config=NBodyConfig.PLUMMER, integrator=integrator)


bs = fresh()
e0 = bs.total_energy(precise=True)
bs.update_many_block(1, eta=ETA, n_classes=K)   # warm the compiles
bs = fresh()
t0 = time.perf_counter()
st = bs.update_many_block(MACROS, eta=ETA, n_classes=K)
bs.hard_sync()
wall = time.perf_counter() - t0
e1 = bs.total_energy(precise=True)
blk = {"scheme": f"block K={K} eta={ETA}", "t": st["t"], "rows": st["rows"],
       "k_max": st["k_max"], "wall_s": round(wall, 3),
       "drift": abs(e1 - e0) / abs(e0)}
print(json.dumps(blk), flush=True)

deep = PRM.time_step / (1 << (K - 1))
bs = fresh("leapfrog")
e0 = bs.total_energy(precise=True)
bs.update_many_adaptive(1, eta=ETA, dt_min=deep, dt_max=PRM.time_step)
bs = fresh("leapfrog")
t0 = time.perf_counter()
t, steps, chunk = 0.0, 0, 64
while t < blk["t"]:
    s = bs.update_many_adaptive(chunk, eta=ETA, dt_min=deep,
                                dt_max=PRM.time_step)
    t += s["t"]
    steps += chunk
bs.hard_sync()
wall = time.perf_counter() - t0
e1 = bs.total_energy(precise=True)
glob = {"scheme": f"global leapfrog eta={ETA}", "t": t,
        "rows": float(steps) * N, "steps": steps, "wall_s": round(wall, 3),
        "drift": abs(e1 - e0) / abs(e0)}
print(json.dumps(glob), flush=True)
print(json.dumps({
    "config": f"plummer a=0.15 eps=0.005 K={K} N={N}",
    "row_ratio_block_over_global": blk["rows"] / glob["rows"],
    "wall_ratio_block_over_global": blk["wall_s"] / glob["wall_s"],
    "drift_block": blk["drift"], "drift_global": glob["drift"],
    "k_max": blk["k_max"],
}, indent=2))
