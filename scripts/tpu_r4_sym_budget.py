"""Per-component cost budget for the Newton's-third-law (sym) kernel.

VERDICT r3 item 3: the sym kernel measures 285.3 G int/s at the bench
shape (N=65536, ti=64, tj=4096) against a 2x-pair-count bound of ~444 G
(2x the one-sided 222 G plateau). This script decomposes the missing
0.5-0.7x into NAMED costs by timing ablated variants of the same
triangle walk (each ablation removes one component; deltas between
successive variants price the components):

  A  one-sided production kernel          (the 222 G baseline)
  B  full sym kernel                      (the 285 G production path)
  C  triangle walk, reaction REMOVED      (i-side only: the ceiling the
     walk itself allows -- diagonal mask waste and grid overhead only)
  D  C + reaction math + 64->8 add tree, accumulated into a SMALL
     (8, LANES) scratch slot (no wide-scratch RMW addressing)
  E  D but RMW into the full (8, n_pad) scratch = the production
     reaction (differs from B only by code layout; sanity check)

  C - 2xA(eff)   = triangle-walk overhead (mask waste + short rows)
  D - C          = reaction arithmetic (t*d, 7-add tree) cost
  E - D (~B - D) = wide-scratch RMW cost

All variants share the production kernel's structure (same scalar
prefetch worklist, same i-side accumulators, same chunk loop); only the
reaction tail differs. Ablated variants produce WRONG physics by design
(timing-only); correctness of the production path is pinned by
tests/test_symmetric.py and the one-step check here.

Usage: python scripts/tpu_r4_sym_budget.py [N]
Prints one JSON line per measurement (the provenance record for the
ARCHITECTURE.md budget table).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.pallas_kernel import LANES, _ix, _round_up
from nbody_tpu.ops.reference import integrate
from nbody_tpu.ops.symmetric_kernel import SUB, _pair_tables
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
TI = 64
TJ = 4096
ITERS = 25


def _ablate_kernel(meta_ref, rows_ref, cols_ref, first_ref, last_ref,
                   posi_ref, post_ref, acc_ref, react_ref,
                   ax, ay, az, rx, ry, rz, *, tile_i, tile_j, n_steps,
                   reaction):
    """The production _sym_kernel with a parametrized reaction tail.
    reaction: 'full' | 'none' | 'tree_small' (tree + small-slot RMW)."""
    p = pl.program_id(0)
    eps2 = meta_ref[0]
    first = first_ref[p]

    @pl.when(p == 0)
    def _zero_reaction():
        zeros = jnp.zeros_like(rx)
        rx[:] = zeros
        ry[:] = zeros
        rz[:] = zeros

    @pl.when(first == 1)
    def _zero_row_acc():
        zeros = jnp.zeros_like(ax)
        ax[:] = zeros
        ay[:] = zeros
        az[:] = zeros

    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    j_base = cols_ref[p] * tile_j

    def chunk_loop(masked):
        if masked:
            ig = rows_ref[p] * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, 1), 0)
        # tree_small: accumulate the 8-row partials in LOCAL values
        # (register-resident across the unrolled chunk loop) and write
        # the scratch once per grid step — prices the add tree itself,
        # not a serialized same-address RMW chain
        r_local = [None, None, None]
        for k in range(tile_j // LANES):
            sl = slice(k * LANES, (k + 1) * LANES)
            xj = post_ref[0:1, sl]
            yj = post_ref[1:2, sl]
            zj = post_ref[2:3, sl]
            mj = post_ref[3:4, sl]
            dx = xj - xi
            dy = yj - yi
            dz = zj - zi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            inv = jax.lax.rsqrt(r2)
            c = inv * inv * inv
            s = mj * c
            if reaction != "none":
                t = mi * c
            if masked:
                jg = j_base + k * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                keep = jg > ig
                s = jnp.where(keep, s, 0.0)
                if reaction != "none":
                    t = jnp.where(keep, t, 0.0)
            ax[:] += s * dx
            ay[:] += s * dy
            az[:] += s * dz
            if reaction == "none":
                continue
            for ci, (rref, d) in enumerate(((rx, dx), (ry, dy), (rz, dz))):
                u = t * d
                r8 = u[0:SUB]
                for q in range(1, tile_i // SUB):
                    r8 = r8 + u[q * SUB:(q + 1) * SUB]
                if reaction == "tree_small":
                    r_local[ci] = (r8 if r_local[ci] is None
                                   else r_local[ci] + r8)
                else:
                    idx = (slice(0, SUB),
                           pl.ds(j_base + k * LANES, LANES))
                    rref[idx] = rref[idx] - r8
        if reaction == "tree_small":
            for ci, rref in enumerate((rx, ry, rz)):
                idx = (slice(0, SUB), pl.ds(0, LANES))
                rref[idx] = rref[idx] - r_local[ci]

    @pl.when(first == 1)
    def _diag():
        chunk_loop(True)

    @pl.when(first == 0)
    def _off():
        chunk_loop(False)

    @pl.when(last_ref[p] == 1)
    def _finalize_row():
        acc_ref[:, 0:1] = jnp.sum(ax[:], axis=1, keepdims=True)
        acc_ref[:, 1:2] = jnp.sum(ay[:], axis=1, keepdims=True)
        acc_ref[:, 2:3] = jnp.sum(az[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])

    @pl.when(p == n_steps - 1)
    def _emit_reaction():
        for c_idx, rref in enumerate((rx, ry, rz)):
            v = rref[0:1, :]
            for q in range(1, SUB):
                v = v + rref[q:q + 1, :]
            react_ref[c_idx:c_idx + 1, :] = v


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "reaction"))
def ablated_accel(pos, softening, *, tile_i=TI, tile_j=TJ, reaction="full"):
    f32 = jnp.float32
    n = pos.shape[0]
    n_pad = _round_up(n, tile_j)
    pos_p = jnp.pad(pos.astype(f32), ((0, n_pad - n), (0, 0)))
    post = pos_p.T
    rows, cols, first, last = _pair_tables(n_pad, tile_i, tile_j)
    n_steps = int(rows.shape[0])
    meta = jnp.asarray(softening, f32).reshape(1) ** 2
    scratch_w = LANES if reaction in ("none", "tree_small") else n_pad

    acc, react = pl.pallas_call(
        functools.partial(_ablate_kernel, tile_i=tile_i, tile_j=tile_j,
                          n_steps=n_steps, reaction=reaction),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((4, tile_j),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, cols[p])),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((3, scratch_w),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((SUB, scratch_w), f32),
                pltpu.VMEM((SUB, scratch_w), f32),
                pltpu.VMEM((SUB, scratch_w), f32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 4), f32),
            jax.ShapeDtypeStruct((3, scratch_w), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * n_pad,
            bytes_accessed=n_steps * (tile_i + tile_j) * 16,
            transcendentals=n_pad * n_pad // 2,
        ),
    )(meta, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(first),
      jnp.asarray(last), pos_p, post)
    # keep both outputs live (timing only; physics is wrong by design
    # for the ablated variants)
    return acc[:n, :3] + react[0:1, 0:1]


def main():
    enable_cache()
    params = DEMO_PARAMS[0]
    pos, vel = ic.generate(NBodyConfig.SHELL, N, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    soft, damp, dt = params.softening, params.damping, params.time_step

    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_symmetric,
        nbody_step_symmetric,
    )

    # sanity: the production path and every ablation run and stay finite
    # ('full' here omits the final react-transpose merge, so only the
    # production kernel's value is meaningful)
    a_prod = np.asarray(compute_accel_symmetric(p, soft, tile_i=TI,
                                                tile_j=TJ))
    assert np.isfinite(a_prod).all()
    for r in ("none", "tree_small", "full"):
        assert np.isfinite(np.asarray(ablated_accel(p, soft,
                                                    reaction=r))).all(), r

    def rate(step):
        ms = delta_time_rolls(step, (p, v), iters=ITERS, rolls=3)
        return N * N * 1e-9 * (1000.0 / ms)

    def step_of(reaction):
        def step(p, v):
            acc = ablated_accel(p, soft, reaction=reaction)
            return integrate(p, v, acc, dt, damp)
        return step

    def one_sided(p, v):
        return nbody_step_pallas(p, v, dt, soft, damp, tile_i=64,
                                 tile_j=min(32768, N), variant="vpu")

    def sym_prod(p, v):
        return nbody_step_symmetric(p, v, dt, soft, damp)

    g_one = rate(one_sided)
    print(json.dumps({"variant": "A_one_sided", "g_int_s": round(g_one, 1)}))
    sys.stdout.flush()
    g_sym = rate(sym_prod)
    print(json.dumps({"variant": "B_sym_production",
                      "g_int_s": round(g_sym, 1),
                      "x_one_sided": round(g_sym / g_one, 3)}))
    sys.stdout.flush()
    out = {"A_one_sided": g_one, "B_sym_production": g_sym}
    for name, reaction in (("C_no_reaction", "none"),
                           ("D_tree_small_slot", "tree_small"),
                           ("E_tree_wide_rmw", "full")):
        g = rate(step_of(reaction))
        out[name] = g
        print(json.dumps({"variant": name, "g_int_s": round(g, 1),
                          "x_one_sided": round(g / g_one, 3)}))
        sys.stdout.flush()

    # budget summary (ms per step at this shape; pair count = N^2/2)
    pair_ms = {k: N * N * 1e-6 / g for k, g in out.items()}
    budget = {
        "shape": {"N": N, "tile_i": TI, "tile_j": TJ},
        "bound_2x_one_sided_g": round(2 * out["A_one_sided"], 1),
        "walk_overhead_ms": round(
            pair_ms["C_no_reaction"] - N * N * 1e-6 / (2 * out["A_one_sided"]), 3),
        "reaction_tree_ms": round(
            pair_ms["D_tree_small_slot"] - pair_ms["C_no_reaction"], 3),
        "wide_rmw_ms": round(
            pair_ms["E_tree_wide_rmw"] - pair_ms["D_tree_small_slot"], 3),
        "layout_delta_ms_B_vs_E": round(
            pair_ms["B_sym_production"] - pair_ms["E_tree_wide_rmw"], 3),
        "total_ms": {k: round(v, 3) for k, v in pair_ms.items()},
    }
    print(json.dumps({"budget": budget}))


if __name__ == "__main__":
    main()
