"""r5 item 3, round 3: integrator-fair baseline + deep stratification.

Round 2 (tpu_r5_block_dt2.py) measured the equilibrium Plummer sphere:
block rows ~= global rows (1.06x), wall 1.87x worse, drift 6.2e-8 vs
7.4e-5 — but that drift gap is the INTEGRATOR (block is KDK leapfrog,
the global baseline ran euler), not the ladder. This round:

 (a) the same Plummer config against a GLOBAL LEAPFROG adaptive
     baseline (ops/adaptive.py KDK — same integrator family, same
     criterion, eval-neutral), isolating what the per-body ladder
     itself buys;
 (b) a deeply-stratified config (concentrated Plummer, eps=0.005,
     K=6) where the criterion dt spans >= 3 octaves — the regime the
     ladder's row economics exist for (rows win needs a small occupied
     deep rung under a large shallow population).

Run (ONE TPU process at a time): python scripts/tpu_r5_block_dt3.py
"""

import json
import time

import jax

from nbody_tpu import NBodyConfig
from nbody_tpu.models.body_system import BodySystem
from nbody_tpu.params import NBodyParams

assert jax.default_backend() != "cpu", "needs the TPU attachment"

N = 16384


def fresh(prm, integrator="euler"):
    return BodySystem(N, prm, backend="pallas", seed=11,
                      config=NBodyConfig.PLUMMER, integrator=integrator)


def run_block(prm, macros, eta, k):
    bs = fresh(prm)
    e0 = bs.total_energy(precise=True)
    bs.update_many_block(1, eta=eta, n_classes=k)   # warm the compiles
    bs = fresh(prm)
    t0 = time.perf_counter()
    st = bs.update_many_block(macros, eta=eta, n_classes=k)
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": f"block K={k} eta={eta}", "t": st["t"],
            "rows": st["rows"], "k_max": st["k_max"],
            "wall_s": round(wall, 3), "drift": abs(e1 - e0) / abs(e0)}


def run_global(prm, target_t, eta, dt_min, integrator):
    bs = fresh(prm, integrator)
    e0 = bs.total_energy(precise=True)
    bs.update_many_adaptive(1, eta=eta, dt_min=dt_min,
                            dt_max=prm.time_step)   # warm
    bs = fresh(prm, integrator)
    t0 = time.perf_counter()
    t, steps, chunk = 0.0, 0, 64
    while t < target_t:
        st = bs.update_many_adaptive(chunk, eta=eta, dt_min=dt_min,
                                     dt_max=prm.time_step)
        t += st["t"]
        steps += chunk
    bs.hard_sync()
    wall = time.perf_counter() - t0
    e1 = bs.total_energy(precise=True)
    return {"scheme": f"global {integrator} eta={eta}", "t": t,
            "rows": float(steps) * N, "steps": steps,
            "wall_s": round(wall, 3), "drift": abs(e1 - e0) / abs(e0)}


def compare(tag, prm, macros, eta, k):
    blk = run_block(prm, macros, eta, k)
    print(json.dumps({"config": tag, **blk}), flush=True)
    deep = prm.time_step / (1 << (k - 1))
    glob = run_global(prm, blk["t"], eta, deep, "leapfrog")
    print(json.dumps({"config": tag, **glob}), flush=True)
    print(json.dumps({
        "config": tag,
        "row_ratio_block_over_global": blk["rows"] / glob["rows"],
        "wall_ratio_block_over_global": blk["wall_s"] / glob["wall_s"],
        "drift_block": blk["drift"], "drift_global": glob["drift"],
        "k_max": blk["k_max"], "N": N, "K": k, "eta": eta,
    }, indent=2), flush=True)


# (a) the dt2 config, leapfrog-fair baseline
compare("plummer a=0.3 eps=0.02 K=5",
        NBodyParams(time_step=0.01, cluster_scale=0.3, velocity_scale=1.0,
                    softening=0.02, damping=1.0),
        macros=40, eta=0.05, k=5)

# (b) deep stratification: concentrated core + tight softening
compare("plummer a=0.15 eps=0.005 K=6",
        NBodyParams(time_step=0.01, cluster_scale=0.15, velocity_scale=1.0,
                    softening=0.005, damping=1.0),
        macros=20, eta=0.05, k=6)
