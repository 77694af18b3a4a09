"""Pallas TPU kernel: fused all-pairs force + integration.

TPU-first redesign of the reference's hot loop (the shared-memory-tiled CUDA
kernel, /root/reference/src/nbody/bodysystemcuda.cu:98-184 — behavior, not
code): instead of one thread per body with j-tiles staged through shared
memory, we tile the N x N interaction matrix for the VPU's (8, 128) lanes:

* the grid is (i_blocks, j_blocks) with j innermost; an i-tile of TILE_I
  bodies stays resident while j-tiles stream through VMEM,
* per 128-lane chunk, the Plummer interaction is evaluated on (TILE_I, 128)
  vectors: dx = x_j[1,128] - x_i[TILE_I,1], r2 = |dx|^2 + eps^2,
  s = m_j * rsqrt(r2)^3, acc += s*dx — all VPU element-wise ops,
* accumulators live in VMEM scratch (persist across the sequential grid),
  zeroed at j==0 and reduced over lanes at the final j-step, where the damped
  semi-implicit Euler update (v=(v+a*dt)*damping; p+=v*dt) is fused so the
  step never round-trips to HBM — the analogue of the reference fusing
  integrateBodies into the same kernel as computeBodyAccel.

Layout: i-side state is AoS (N, 4) = [x,y,z,m]; the j-side sees a transposed
(4, N) copy so that per-coordinate rows are contiguous 128-lane vectors
(the O(N) transpose happens outside the kernel, negligible vs the O(N^2)
kernel). dt/eps^2/damping arrive via SMEM so param changes don't recompile.

N is padded to the tile LCM with zero-mass bodies, which exert zero force —
exactly the reference's pad-to-256 trick (/root/reference/src/nbody/tipsy.cpp:111-122).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_I = 256
DEFAULT_TILE_J = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(scal_ref, posi_ref, veli_ref, post_ref, npos_ref, nvel_ref,
            ax_ref, ay_ref, az_ref, *, tile_j: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        ax_ref[:] = zeros
        ay_ref[:] = zeros
        az_ref[:] = zeros

    eps2 = scal_ref[0, 1]

    xi = posi_ref[:, 0:1]  # (TILE_I, 1)
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]

    # Stream the j-tile through the VPU in 128-lane chunks (static unroll).
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        xj = post_ref[0:1, sl]  # (1, 128)
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]

        dx = xj - xi  # (TILE_I, 128)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        s = mj * (inv * inv * inv)
        ax_ref[:] += s * dx
        ay_ref[:] += s * dy
        az_ref[:] += s * dz

    @pl.when(j == nj - 1)
    def _finalize():
        dt = scal_ref[0, 0]
        damping = scal_ref[0, 2]
        acc_x = jnp.sum(ax_ref[:], axis=1, keepdims=True)  # (TILE_I, 1)
        acc_y = jnp.sum(ay_ref[:], axis=1, keepdims=True)
        acc_z = jnp.sum(az_ref[:], axis=1, keepdims=True)
        vx = (veli_ref[:, 0:1] + acc_x * dt) * damping
        vy = (veli_ref[:, 1:2] + acc_y * dt) * damping
        vz = (veli_ref[:, 2:3] + acc_z * dt) * damping
        nvel_ref[:, 0:1] = vx
        nvel_ref[:, 1:2] = vy
        nvel_ref[:, 2:3] = vz
        nvel_ref[:, 3:4] = veli_ref[:, 3:4]
        npos_ref[:, 0:1] = posi_ref[:, 0:1] + vx * dt
        npos_ref[:, 1:2] = posi_ref[:, 1:2] + vy * dt
        npos_ref[:, 2:3] = posi_ref[:, 2:3] + vz * dt
        npos_ref[:, 3:4] = posi_ref[:, 3:4]


@functools.partial(
    jax.jit,
    static_argnames=("tile_i", "tile_j", "interpret"),
)
def nbody_step_pallas(
    pos,
    vel,
    dt,
    softening,
    damping,
    *,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False,
):
    """One fused force+integrate step. pos/vel: (N, 4) float32 AoS.

    tile_i/tile_j are the i-block height and j-stream width (the reference's
    --blockSize analogue); tile_i must be a multiple of 8, tile_j of 128.
    """
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    assert tile_i % 8 == 0 and tile_j % LANES == 0

    n = pos.shape[0]
    n_pad = _round_up(n, math.lcm(tile_i, tile_j))
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        pos_p = jnp.pad(pos, pad)  # zero mass => zero force contribution
        vel_p = jnp.pad(vel, pad)
    else:
        pos_p, vel_p = pos, vel
    post = pos_p.T  # (4, N_pad) — j-stream layout

    scal = jnp.array(
        [[dt, jnp.asarray(softening, jnp.float32) ** 2, damping, 0.0]],
        dtype=jnp.float32,
    )

    grid = (n_pad // tile_i, n_pad // tile_j)

    new_pos, new_vel = pl.pallas_call(
        functools.partial(_kernel, tile_j=tile_j),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_i, LANES), jnp.float32),
            pltpu.VMEM((tile_i, LANES), jnp.float32),
            pltpu.VMEM((tile_i, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * n_pad * n_pad,
            bytes_accessed=(n_pad // tile_i + 4) * n_pad * 16,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(scal, pos_p, vel_p, post)

    if n_pad != n:
        new_pos = new_pos[:n]
        new_vel = new_vel[:n]
    return new_pos, new_vel
