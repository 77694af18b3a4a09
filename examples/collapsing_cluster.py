"""P3M contract lifecycle on a collapsing cluster.

The fast solver's cell capacity and pair budget are sized from the FIRST
state; a cold collapse concentrates bodies until the contract breaks
(BodySystem warns — short-range pairs would silently drop otherwise).
This example runs the production pattern: simulate in segments, watch for
the warning, `refresh_p3m_contract()` (re-sizes from the current state,
recompiles once), continue.

    python examples/collapsing_cluster.py          # any backend
"""

import warnings

import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.models import BodySystem
from nbody_tpu.params import NBodyParams

N, DT, SEGMENTS, STEPS = 8192, 0.004, 8, 50

pos, vel = ic.generate(NBodyConfig.SHELL, N, 1.5, 0.2, seed=11)  # cold shell
s = BodySystem(N, NBodyParams(softening=0.05, damping=1.0), backend="p3m",
               pm_grid=48, integrator="leapfrog", state=(pos, vel))
print(f"start: capacity={s.p3m_capacity}, engine={s.p3m_short_range}")

refreshes = 0
for seg in range(SEGMENTS):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        s.update_many(STEPS, DT)
    if any("contract broken" in str(w.message) for w in caught):
        s.refresh_p3m_contract()
        refreshes += 1
        print(f"segment {seg}: contract breached -> refreshed "
              f"(capacity now {s.p3m_capacity})")
    else:
        print(f"segment {seg}: ok (capacity {s.p3m_capacity})")

r = np.linalg.norm(s.positions[:, :3] - s.positions[:, :3].mean(0), axis=1)
print(f"done: {SEGMENTS * STEPS} steps, {refreshes} refreshes, "
      f"median radius {np.median(r):.2f} "
      f"(finite={bool(np.isfinite(s.positions).all())})")
