"""P3M contract lifecycle on a collapsing cluster.

The fast solver's cell capacity and pair budget are sized from the FIRST
state; a cold collapse concentrates bodies until the contract breaks.
Since r3 the probe runs INSIDE the compiled rollout (the scan carries the
first-breach step and a snapshot of the last in-contract state), so there
are two production patterns:

1. **unattended** (default here): `p3m_auto_refresh=True` — one
   `update_many(STEPS)` call; on a breach the system rewinds to the breach
   step, re-sizes capacity/pair budget from that state (one recompile),
   and resumes by itself. 20k steps run correct-forces end to end with no
   babysitting.
2. **manual segments** (`--manual`): simulate in segments, watch for the
   warning (which now names the exact breach step), call
   `refresh_p3m_contract()`, continue.

    python examples/collapsing_cluster.py            # unattended
    python examples/collapsing_cluster.py --manual   # segment pattern
"""

import sys
import warnings

import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.models import BodySystem
from nbody_tpu.params import NBodyParams
from nbody_tpu.utils.timing import on_tpu

N, DT = 8192, 0.004
# 20k steps exercise several breach/refresh cycles on the TPU; the CPU
# fallback keeps the same physics on a budget that finishes in minutes
TOTAL_STEPS = 20_000 if on_tpu() else 400

pos, vel = ic.generate(NBodyConfig.SHELL, N, 1.5, 0.2, seed=11)  # cold shell


def make_system(**kw):
    return BodySystem(N, NBodyParams(softening=0.05, damping=1.0),
                      backend="p3m", pm_grid=48, integrator="leapfrog",
                      state=(pos, vel), **kw)


def run_unattended():
    s = make_system(p3m_auto_refresh=True)
    cap0 = s.p3m_capacity
    print(f"start: capacity={cap0}, engine={s.p3m_short_range}, "
          f"steps={TOTAL_STEPS} (one call, auto-refresh on breach)")
    s.update_many(TOTAL_STEPS, DT)
    return s, f"capacity {cap0} -> {s.p3m_capacity}"


def run_manual():
    s = make_system()
    print(f"start: capacity={s.p3m_capacity}, engine={s.p3m_short_range}")
    segments, steps = 8, max(TOTAL_STEPS // 8, 1)
    refreshes = 0
    for seg in range(segments):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s.update_many(steps, DT)
        breach = [w for w in caught
                  if "contract broken" in str(w.message)]
        if breach:
            s.refresh_p3m_contract()
            refreshes += 1
            print(f"segment {seg}: {breach[0].message} -> refreshed "
                  f"(capacity now {s.p3m_capacity})")
        else:
            print(f"segment {seg}: ok (capacity {s.p3m_capacity})")
    return s, f"{refreshes} manual refreshes"


if __name__ == "__main__":
    manual = "--manual" in sys.argv
    s, note = run_manual() if manual else run_unattended()
    r = np.linalg.norm(s.positions[:, :3] - s.positions[:, :3].mean(0),
                       axis=1)
    print(f"done: {TOTAL_STEPS} steps, {note}, "
          f"median radius {np.median(r):.2f} "
          f"(finite={bool(np.isfinite(s.positions).all())})")
