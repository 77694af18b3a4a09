"""Particle-Mesh (PM) gravity: an O(N + G^3 log G) far-field fast mode.

The reference is all-pairs only (O(N^2), /root/reference/src/nbody/
bodysystemcuda.cu:125-146); this is the natural TPU-native fast model
family: instead of a tree code (pointer-chasing, hostile to XLA), PM maps
gravity onto dense-grid primitives the hardware loves —

  1. **deposit**: cloud-in-cell (CIC) trilinear scatter-add of masses onto a
     G^3 grid (one fused XLA scatter of 8N updates),
  2. **solve**: isolated-boundary Poisson solve by FFT convolution with the
     open-space Green's function 1/r on a zero-padded 2G grid
     (Hockney-Eastwood); forces via spectral gradient (i*k multiply),
  3. **gather**: CIC trilinear interpolation of the three force grids back
     to the particles.

Everything is jnp (static shapes, differentiable, shardable); the box is
fit to the particles dynamically so no recompilation on cluster expansion.
Accuracy is resolution-limited: forces are smooth below the cell scale
(self-force-free by kernel symmetry K(0)=0), so PM is an approximation —
tests pin the RMS force error vs the exact direct sum. For production
accuracy at small N, use the exact kernels; PM is for N where O(N^2) is
unaffordable or as the far-field half of a future P3M split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cic_indices_weights(pos3, lo, h, grid: int):
    """CIC: 8 (flat index, weight) pairs per particle on a grid^3 lattice.

    Returns (idx, w): each (8, N) — trilinear weights summing to 1.
    """
    rel = (pos3 - lo[None, :]) / h  # in cell units
    base = jnp.floor(rel)
    frac = rel - base
    base = base.astype(jnp.int32)

    idxs = []
    weights = []
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = jnp.clip(base[:, 0] + dx, 0, grid - 1)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = jnp.clip(base[:, 1] + dy, 0, grid - 1)
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = jnp.clip(base[:, 2] + dz, 0, grid - 1)
                idxs.append((ix * grid + iy) * grid + iz)
                weights.append(wx * wy * wz)
    return jnp.stack(idxs), jnp.stack(weights)


@functools.partial(jax.jit, static_argnames=("grid",))
def pm_accel(pos, *, grid: int = 64):
    """(N, 4) [x,y,z,m] -> (N, 3) far-field accelerations.

    Isolated (non-periodic) boundary conditions via the zero-padding
    trick: the density lives on a grid^3 mesh, the convolution runs on a
    (2*grid)^3 zero-padded mesh with the open-space kernel 1/r, so no
    periodic images pollute the forces.
    """
    if pos.shape[-1] != 4:
        raise ValueError("pm_accel expects (N, 4) [x,y,z,m]")
    f32 = jnp.float32
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)

    # fit the box to the particles with a 2-cell margin (dynamic values,
    # static shapes -> no recompilation as the system expands)
    lo_raw = jnp.min(pos3, axis=0)
    hi_raw = jnp.max(pos3, axis=0)
    span = jnp.max(hi_raw - lo_raw)
    h = span / f32(grid - 4) + f32(1e-30)  # cell size
    center = (lo_raw + hi_raw) / 2.0
    lo = center - h * f32(grid) / 2.0

    # 1. deposit (CIC scatter-add)
    idx, w = _cic_indices_weights(pos3, lo, h, grid)
    rho = jnp.zeros(grid * grid * grid, f32)
    rho = rho.at[idx.reshape(-1)].add((w * mass[None, :]).reshape(-1))
    rho = rho.reshape(grid, grid, grid)

    # 2. Poisson solve on the 2G padded mesh: phi = -conv(rho, 1/r),
    #    a = -grad(phi) = +grad(conv); spectral gradient = i*k multiply
    gp = 2 * grid
    rho_p = jnp.zeros((gp, gp, gp), f32).at[:grid, :grid, :grid].set(rho)

    # open-space kernel: 1/r with min-image distances on the padded mesh;
    # K(0)=0 removes the bulk of the self-interaction (CIC gather of a
    # particle's own deposit through a symmetric kernel cancels to O(h))
    n = jnp.arange(gp)
    d = jnp.minimum(n, gp - n).astype(f32) * h
    r2 = (d[:, None, None] ** 2 + d[None, :, None] ** 2
          + d[None, None, :] ** 2)
    kernel = jnp.where(r2 > 0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-30)), 0.0)

    rho_k = jnp.fft.fftn(rho_p)
    conv_k = rho_k * jnp.fft.fftn(kernel)

    k1 = (2.0 * jnp.pi) * jnp.fft.fftfreq(gp, d=h).astype(f32)
    acc = []
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = gp
        kv = k1.reshape(shape)
        grad_k = conv_k * (1j * kv)
        grad = jnp.real(jnp.fft.ifftn(grad_k)).astype(f32)
        acc.append(grad[:grid, :grid, :grid].reshape(-1))

    # 3. gather (CIC interpolation of the force grids)
    out = [jnp.sum(g[idx] * w, axis=0) for g in acc]
    return jnp.stack(out, axis=1)


def nbody_step_pm(pos, vel, dt, softening, damping, *, grid: int = 64):
    """PM step with the reference's damped semi-implicit Euler update.

    `softening` is accepted for interface parity but PM's effective
    softening is the cell scale (set by `grid`), which dominates any
    Plummer epsilon below it.
    """
    del softening
    a = pm_accel(pos, grid=grid)
    dt = jnp.asarray(dt, pos.dtype)
    damping = jnp.asarray(damping, pos.dtype)
    v3 = (vel[:, :3] + a * dt) * damping
    p3 = pos[:, :3] + v3 * dt
    new_pos = jnp.concatenate([p3, pos[:, 3:4]], axis=1)
    new_vel = jnp.concatenate([v3, vel[:, 3:4]], axis=1)
    return new_pos, new_vel
