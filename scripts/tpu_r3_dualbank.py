"""Dual-bank vpu kernel experiment: 2 independent 64-row i-banks per grid
step. Motivation (r3 overhead decomposition): per-i-block boundary costs
~2.3 us (tiny DMA flushes + finalize serialization); ti=64 wins on
dependency-chain length but pays 1024 boundaries at N=65536. Two
independent 64-row banks in a 128-row i-tile keep the 64-deep chains AND
halve the boundaries; tile_j=16384 keeps the unrolled program at the
champion's compile-safe size (2 banks x 128 chunks = 256 chunk-bodies).
"""

import functools
import sys
import time

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
    LANES, _common_specs, _pad_i, _pad_j_t, _scal, nbody_step_pallas,
)
from nbody_tpu.utils.timing import time_steps

P = DEMO_PARAMS[0]
N, ITERS = 65536, 25


def _dual_kernel(scal_ref, posi_ref, veli_ref, post_ref, npos_ref, nvel_ref,
                 a0x, a0y, a0z, a1x, a1y, a1z, *, tile_j, half):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(a0x)
        for r in (a0x, a0y, a0z, a1x, a1y, a1z):
            r[:] = zeros

    eps2 = scal_ref[0, 1]
    x0 = posi_ref[0:half, 0:1]
    y0 = posi_ref[0:half, 1:2]
    z0 = posi_ref[0:half, 2:3]
    x1 = posi_ref[half:, 0:1]
    y1 = posi_ref[half:, 1:2]
    z1 = posi_ref[half:, 2:3]
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        xj = post_ref[0:1, sl]
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]
        dx0 = xj - x0
        dy0 = yj - y0
        dz0 = zj - z0
        dx1 = xj - x1
        dy1 = yj - y1
        dz1 = zj - z1
        r20 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0 + eps2
        r21 = dx1 * dx1 + dy1 * dy1 + dz1 * dz1 + eps2
        inv0 = jax.lax.rsqrt(r20)
        inv1 = jax.lax.rsqrt(r21)
        s0 = mj * (inv0 * inv0 * inv0)
        s1 = mj * (inv1 * inv1 * inv1)
        a0x[:] += s0 * dx0
        a0y[:] += s0 * dy0
        a0z[:] += s0 * dz0
        a1x[:] += s1 * dx1
        a1y[:] += s1 * dy1
        a1z[:] += s1 * dz1

    @pl.when(j == nj - 1)
    def _finalize():
        dt = scal_ref[0, 0]
        damping = scal_ref[0, 2]
        accx = jnp.concatenate(
            [jnp.sum(a0x[:], axis=1, keepdims=True),
             jnp.sum(a1x[:], axis=1, keepdims=True)], axis=0)
        accy = jnp.concatenate(
            [jnp.sum(a0y[:], axis=1, keepdims=True),
             jnp.sum(a1y[:], axis=1, keepdims=True)], axis=0)
        accz = jnp.concatenate(
            [jnp.sum(a0z[:], axis=1, keepdims=True),
             jnp.sum(a1z[:], axis=1, keepdims=True)], axis=0)
        vx = (veli_ref[:, 0:1] + accx * dt) * damping
        vy = (veli_ref[:, 1:2] + accy * dt) * damping
        vz = (veli_ref[:, 2:3] + accz * dt) * damping
        nvel_ref[:, 0:1] = vx
        nvel_ref[:, 1:2] = vy
        nvel_ref[:, 2:3] = vz
        nvel_ref[:, 3:4] = veli_ref[:, 3:4]
        npos_ref[:, 0:1] = posi_ref[:, 0:1] + vx * dt
        npos_ref[:, 1:2] = posi_ref[:, 1:2] + vy * dt
        npos_ref[:, 2:3] = posi_ref[:, 2:3] + vz * dt
        npos_ref[:, 3:4] = posi_ref[:, 3:4]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def step_dual(pos, vel, dt, softening, damping, *, tile_i=128, tile_j=16384):
    half = tile_i // 2
    pos_p, m = _pad_i(pos, tile_i)
    vel_p, _ = _pad_i(vel, tile_i)
    post = _pad_j_t(pos, tile_j)
    m_pad, n_pad = pos_p.shape[0], post.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)
    scratch = [pltpu.VMEM((half, LANES), jnp.float32) for _ in range(6)]
    new_pos, new_vel = pl.pallas_call(
        functools.partial(_dual_kernel, tile_j=tile_j, half=half),
        grid=grid,
        in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"],
                  specs["j_tile"]],
        out_specs=[specs["i_tile"], specs["i_tile"]],
        out_shape=[jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((m_pad, 4), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 3) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
    )(_scal(dt, softening, damping), pos_p, vel_p, post)
    return new_pos[:m], new_vel[:m]


def main():
    pos, vel = ic.generate(NBodyConfig.SHELL, N, P.cluster_scale,
                           P.velocity_scale, seed=42)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

    # correctness vs the production vpu kernel
    rp, rv = nbody_step_pallas(p0, v0, P.time_step, P.softening, P.damping,
                               tile_i=64, tile_j=32768)
    for ti, tj in ((128, 16384), (128, 32768), (256, 16384)):
        try:
            gp, gv = step_dual(p0, v0, P.time_step, P.softening, P.damping,
                               tile_i=ti, tile_j=tj)
            err = max(float(jnp.abs(gp - rp).max()),
                      float(jnp.abs(gv - rv).max()))
        except Exception as e:
            print(f"dual ti={ti} tj={tj}: FAILED {str(e)[:120]}", flush=True)
            continue

        @jax.jit
        def roll(p, v, ti=ti, tj=tj):
            def body(s, _):
                return step_dual(*s, P.time_step, P.softening, P.damping,
                                 tile_i=ti, tile_j=tj), None
            (p, v), _ = jax.lax.scan(body, (p, v), None, length=ITERS)
            return p, v

        ms = min(time_steps(lambda p, v: roll(p, v), (p0, v0), iters=1,
                            warmup=1 if i == 0 else 0)[0] for i in range(3))
        g = N * N * ITERS / ms * 1e3 / 1e9
        print(f"dual ti={ti} tj={tj}: {ms:.1f} ms  {g:.1f} G int/s "
              f"({g*20:.0f} GFLOP/s)  err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
