"""Adaptive timestep on a cold collapse: right dt, only when needed.

The reference integrates at one fixed deltaTime
(/root/reference/src/nbody/bodysystemcuda.cu:148-184). A cold collapse
has no single good dt: early on the shell is quiet and the preset's
dt is fine; at core bounce accelerations spike and the same dt is
catastrophically large. `--adaptive-dt` / `update_many_adaptive`
tracks the shortest resolved free-fall time INSIDE the compiled
rollout (ops/adaptive.py), so the run takes small steps only through
the bounce.

Three runs to the same simulated time T (leapfrog, energy measured
with the fp64 functional):

1. fixed dt = dt_max (the quiet-phase step): fastest, WRONG — the
   bounce blows the energy up by O(100%).
2. adaptive (eta=0.01, dt in [auto, dt_max]): correct; the criterion
   spans a ~300x dt range by itself.
3. fixed dt = the smallest dt the adaptive run used: comparable
   accuracy, but EVERY step pays the bounce-resolution price — ~2-3x
   the adaptive run's step count (and the gap grows with how brief
   the bounce is relative to T).

Measured (CPU budget, N=1024, T=1.0): fixed-coarse dE/E = +2.1e-1,
adaptive -3.3e-7 in 7k steps spanning a 233x dt range, fixed-fine
needs 2.1x the steps for the same quality. On-chip (N=8192, T=1.0,
deeper collapse): fixed-coarse dE/E = +2.5e+1, adaptive -5.2e-6 in
23k steps riding the full 1024x default dt window (it clips at
dt_max/1024 through the bounce), fixed-fine 2.8x the steps.

    python examples/adaptive_collapse.py
"""

import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.models import BodySystem
from nbody_tpu.params import NBodyParams
from nbody_tpu.utils.timing import on_tpu

P = NBodyParams(softening=0.1, damping=1.0)
# the core bounce lands around t ~ 0.5 at these scales; T must cover it
if on_tpu():
    N, T = 8192, 1.0
else:
    N, T = 1024, 1.0
DT_MAX = 0.016  # demo-0's preset dt: fine for the quiet shell phase
ETA = 0.01

pos, vel = ic.generate(NBodyConfig.SHELL, N, 1.5, 0.2, seed=11)
vel = vel * 0.0  # cold: the shell free-falls and core-bounces


def fresh() -> BodySystem:
    return BodySystem(N, P, backend="auto" if on_tpu() else "xla",
                      integrator="leapfrog", state=(pos, vel))


def drift(bs, e0):
    return (bs.total_energy(precise=True) - e0) / abs(e0)


bs = fresh()
e0 = bs.total_energy(precise=True)

# 1. fixed at the quiet-phase dt: the bounce is unresolved
k_coarse = int(round(T / DT_MAX))
bs.update_many(k_coarse, DT_MAX)
print(f"fixed dt={DT_MAX}: {k_coarse} steps to t={T}, "
      f"dE/E = {drift(bs, e0):+.2e}   <-- bounce unresolved")

# 2. adaptive: segments until the simulated time reaches T
bs = fresh()
t, steps, dt_lo = 0.0, 0, np.inf
chunk = 500
while t < T:
    st = bs.update_many_adaptive(chunk, eta=ETA, dt_max=DT_MAX)
    t += st["t"]
    steps += chunk
    dt_lo = min(dt_lo, st["dt_lo"])
print(f"adaptive eta={ETA}: {steps} steps to t={t:.3f}, "
      f"dt spanned [{dt_lo:.2e}, {DT_MAX}] ({DT_MAX / dt_lo:.0f}x), "
      f"dE/E = {drift(bs, e0):+.2e}")

# 3. fixed at the adaptive run's smallest dt: every step pays the
#    bounce price
k_fine = int(round(T / dt_lo))
print(f"fixed dt={dt_lo:.2e}: would need {k_fine} steps "
      f"({k_fine / steps:.1f}x the adaptive run) ...")
bs = fresh()
bs.update_many(k_fine, float(dt_lo))
print(f"  ... ran them: dE/E = {drift(bs, e0):+.2e}")
