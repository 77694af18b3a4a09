"""Packed-state vpu kernel experiment: one (N,8) state array [pos4|vel4]
halves the per-i-block small-DMA count (2 inputs + 2 outputs -> 1 + 1).
Tile geometry, chunk loop, and arithmetic identical to the champion
(ti=64, tj=32768, lc=128). If the ~2.3 us/i-block boundary cost is
DMA-issue-bound, this should claw back ~1 ms/step at N=65536.
"""

import functools
import sys

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.ops.pallas_kernel import (
    LANES, _accumulate_tile, _ix, _pad_i, _pad_j_t, _scal, nbody_step_pallas,
)
from nbody_tpu.utils.timing import time_steps

P = DEMO_PARAMS[0]
N, ITERS = 65536, 25


def _packed_kernel(scal_ref, state_ref, post_ref, nstate_ref,
                   ax_ref, ay_ref, az_ref, *, tile_j):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        ax_ref[:] = zeros
        ay_ref[:] = zeros
        az_ref[:] = zeros

    _accumulate_tile(state_ref, post_ref, scal_ref[0, 1],
                     ax_ref, ay_ref, az_ref, tile_j)

    @pl.when(j == nj - 1)
    def _finalize():
        dt = scal_ref[0, 0]
        damping = scal_ref[0, 2]
        acc_x = jnp.sum(ax_ref[:], axis=1, keepdims=True)
        acc_y = jnp.sum(ay_ref[:], axis=1, keepdims=True)
        acc_z = jnp.sum(az_ref[:], axis=1, keepdims=True)
        vx = (state_ref[:, 4:5] + acc_x * dt) * damping
        vy = (state_ref[:, 5:6] + acc_y * dt) * damping
        vz = (state_ref[:, 6:7] + acc_z * dt) * damping
        nstate_ref[:, 0:1] = state_ref[:, 0:1] + vx * dt
        nstate_ref[:, 1:2] = state_ref[:, 1:2] + vy * dt
        nstate_ref[:, 2:3] = state_ref[:, 2:3] + vz * dt
        nstate_ref[:, 3:4] = state_ref[:, 3:4]
        nstate_ref[:, 4:5] = vx
        nstate_ref[:, 5:6] = vy
        nstate_ref[:, 6:7] = vz
        nstate_ref[:, 7:8] = state_ref[:, 7:8]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def step_packed(state, post, dt, softening, damping, *, tile_i=64,
                tile_j=32768):
    """state: (n_pad, 8); post: (4, n_pad) transposed positions.
    Returns (new_state, new_post) — new_post computed with XLA slices."""
    m_pad = state.shape[0]
    n_pad = post.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)
    smem = pl.BlockSpec((1, 4), lambda i, j: _ix(0, 0), memory_space=pltpu.SMEM)
    i_tile = pl.BlockSpec((tile_i, 8), lambda i, j: _ix(i, 0),
                          memory_space=pltpu.VMEM)
    j_tile = pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j),
                          memory_space=pltpu.VMEM)
    nstate = pl.pallas_call(
        functools.partial(_packed_kernel, tile_j=tile_j),
        grid=grid,
        in_specs=[smem, i_tile, j_tile],
        out_specs=i_tile,
        out_shape=jax.ShapeDtypeStruct((m_pad, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_i, LANES), jnp.float32)
                        for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 2) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
    )(_scal(dt, softening, damping), state, post)
    npost = nstate[:, :4].T
    return nstate, npost


def main():
    pos, vel = ic.generate(NBodyConfig.SHELL, N, P.cluster_scale,
                           P.velocity_scale, seed=42)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)
    state0 = jnp.concatenate([p0, v0], axis=1)
    post0 = p0.T

    rp, rv = nbody_step_pallas(p0, v0, P.time_step, P.softening, P.damping,
                               tile_i=64, tile_j=32768)
    ns, npt = step_packed(state0, post0, P.time_step, P.softening, P.damping)
    err = max(float(jnp.abs(ns[:, :4] - rp).max()),
              float(jnp.abs(ns[:, 4:] - rv).max()))
    print(f"packed correctness err = {err:.2e}", flush=True)

    @jax.jit
    def roll(state, post):
        def body(s, _):
            return step_packed(*s, P.time_step, P.softening, P.damping), None
        (state, post), _ = jax.lax.scan(body, (state, post), None,
                                        length=ITERS)
        return state, post

    ms = min(time_steps(lambda s, t: roll(s, t), (state0, post0), iters=1,
                        warmup=1 if i == 0 else 0)[0] for i in range(3))
    g = N * N * ITERS / ms * 1e3 / 1e9
    print(f"packed scan: {ms:.1f} ms  {g:.1f} G int/s  ({g*20:.0f} GFLOP/s)")


if __name__ == "__main__":
    main()
