"""σ/h accuracy ladder: can the optimal influence function buy a smaller
P3M split (smaller σ → smaller r_cut → cheaper short-range) at equal
accuracy?

At the production split σ = 1.5h, assignment-alias power at the Nyquist
frequency is e^{-σ²k²/2} ≈ e^{-11} — there is nothing for the H&E optimal
influence function to fix (measured: naive == optimal to 4 digits,
scripts/tpu_influence_error.py). Aliasing only bites at smaller σ/h,
which is exactly the regime that would make P3M cheaper: r_cut = 4σ, so
σ: 1.5h → 1.0h shrinks every short-range neighborhood by (1.5)³ ≈ 3.4×.

This script measures median/p90 force error vs the exact kernel at
N=65536 / grid=64 for σ/h ∈ {1.5, 1.25, 1.0} × {naive, optimal}, with
the erf-split short-range recomputed per σ (cells sized to r_cut).
"""

import json
import math
import sys

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.ops.pallas_kernel import compute_accel_pallas
from nbody_tpu.ops.p3m import (
    RCUT_SIGMAS,
    _fit_box,
    _short_range_cells,
    _sorted_cell_tables,
)
from nbody_tpu.ops.pm import ASSIGNMENTS, _deposit, _gather, _solve_force_grids

P = DEMO_PARAMS[0]
N, GRID = 65536, 64


@functools.partial(
    jax.jit, static_argnames=("grid", "sc", "cap", "assignment", "deconv"))
def p3m_accel_sigma(pos, softening, *, grid, sc, cap, assignment, deconv):
    f32 = jnp.float32
    n = pos.shape[0]
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    eps2 = jnp.asarray(softening, f32) ** 2
    lo, h = _fit_box(pos3, grid)
    sigma = f32(sc) * h
    rcut = f32(RCUT_SIGMAS) * sigma
    gc = max(1, math.ceil(grid / (RCUT_SIGMAS * sc)))

    assign, wexp = ASSIGNMENTS[assignment]
    idx, w = assign(pos3, lo, h, grid)
    rho = _deposit(idx, w, mass, grid)
    acc_lr = _gather(
        _solve_force_grids(rho, h, grid, sigma=sigma, deconvolve=deconv,
                           window_exp=wexp, sigma_cells=sc),
        idx, w)

    (order, sorted_pos4, starts, counts,
     n_starts, n_counts, overflow) = _sorted_cell_tables(
        pos3, mass, lo, rcut, gc, cap)
    acc_sorted = _short_range_cells(
        sorted_pos4, starts, counts, n_starts, n_counts,
        eps2=eps2, sigma=sigma, rcut=rcut, cap=cap, chunk=2048, n=n)
    acc_sr = jnp.zeros((n, 3), f32).at[order].set(acc_sorted)
    return acc_lr + acc_sr, overflow


def main():
    pos, vel = ic.generate(NBodyConfig.SHELL, N, P.cluster_scale,
                           P.velocity_scale, seed=42)
    p4 = jnp.asarray(pos)
    ref = np.asarray(compute_accel_pallas(p4, p4, P.softening))
    rn = np.linalg.norm(ref, axis=1) + 1e-30

    out = {}
    for sc in (1.5, 1.25, 1.0):
        # capacity: cells grow with smaller sigma (gc larger, cells smaller)
        for deconv in (True, "optimal"):
            acc, ovf = p3m_accel_sigma(p4, P.softening, grid=GRID, sc=sc,
                                       cap=4096, assignment="tsc",
                                       deconv=deconv)
            rel = np.linalg.norm(np.asarray(acc) - ref, axis=1) / rn
            med, p90 = (float(np.median(rel)) * 100,
                        float(np.percentile(rel, 90)) * 100)
            name = "optimal" if deconv == "optimal" else "naive"
            out[f"sc{sc}_{name}"] = (round(med, 4), round(p90, 4))
            print(f"sigma={sc:4.2f}h {name:7s}: median {med:.4f}%  "
                  f"p90 {p90:.4f}%  (overflow {int(ovf)})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
