"""Price the sharded-P3M redundant per-chip cell sort (VERDICT r4 item 6).

The sharded P3M step all-gathers positions and every chip re-runs the
FULL-set cell sort (`_sorted_cell_tables`) before taking its chunk of
the short-range work. That sort is O(N log N) per chip regardless of D,
while everything else scales ~1/D — so the redundant sort caps strong
scaling at D* ≈ (T_step − T_sort)/T_sort. This script measures T_sort
and T_step single-chip (the only chip attached) at P3M production
shapes and prints the implied crossover; the ARCHITECTURE scaling note
quotes these numbers.

Usage: python scripts/tpu_r4_p3m_sort_cost.py [N ...]
"""

import json
import sys

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.p3m import (
    RCUT_SIGMAS,
    SIGMA_CELLS,
    _cell_grid_size,
    _fit_box,
    _sorted_cell_tables,
    nbody_step_p3m,
    p3m_max_occupancy,
)
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls

GRID = 64
SOFT = 0.1


def main():
    enable_cache()
    ns = [int(a) for a in sys.argv[1:]] or [262144, 1048576]
    for n in ns:
        pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        occ = int(p3m_max_occupancy(p, grid=GRID))
        cap = max(8, -(-int(occ * 1.5 + 1) // 8) * 8)

        gc = _cell_grid_size(GRID)

        @jax.jit
        def sort_only(p4):
            pos3 = p4[:, :3].astype(jnp.float32)
            mass = p4[:, 3].astype(jnp.float32)
            lo, h = _fit_box(pos3, GRID)
            rcut = jnp.float32(RCUT_SIGMAS) * jnp.float32(SIGMA_CELLS) * h
            out = _sorted_cell_tables(pos3, mass, lo, rcut, gc, cap)
            # fold to a small value so the timing carry stays cheap
            return p4 + out[1][0, 0] * 0.0

        def sort_step(p4, v4):
            return sort_only(p4), v4

        def full_step(p4, v4):
            np_, nv_, _ = nbody_step_p3m(p4, v4, 0.001, SOFT, 1.0,
                                         grid=GRID, capacity=cap,
                                         short_range="xla")
            return np_, nv_

        # short rolls: a 5x-iters full-step roll at N=1M must stay under
        # the attached worker's ~90 s dispatch watchdog (ARCHITECTURE
        # "Dispatch economics"; the first attempt at iters=10 was killed)
        it = 10 if n <= 200000 else 1
        ms_sort = delta_time_rolls(sort_step, (p, v), iters=10, rolls=3)
        ms_step = delta_time_rolls(full_step, (p, v), iters=it, rolls=3)
        frac = ms_sort / ms_step
        dstar = max((ms_step - ms_sort) / max(ms_sort, 1e-9), 0.0)
        print(json.dumps({
            "n": n, "grid": GRID, "capacity": cap,
            "ms_sort": round(ms_sort, 3), "ms_step": round(ms_step, 3),
            "sort_fraction": round(frac, 4),
            "equal_share_devices": round(dstar, 1),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
