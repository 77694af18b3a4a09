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

Multi-chip (``make_sharded_pm_step``): bodies shard over the mesh; each
chip deposits its shard locally, ONE ``psum`` of the G^3 density grid
(~1 MiB at G=64) replicates the mass field, the FFT solve runs redundantly
per chip (a few ms), and each chip gathers forces for its own shard —
deposit/gather scale 1/D, the only collective is the grid reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _fit_box(pos3, grid: int, *, axis: str | None = None):
    """Particle-fitting bounding box -> (lo corner (3,), cell size h).

    With `axis`, reduces the extremes across a shard_map mesh axis so every
    device agrees on one global box.
    """
    f32 = jnp.float32
    lo_raw = jnp.min(pos3, axis=0)
    hi_raw = jnp.max(pos3, axis=0)
    if axis is not None:
        lo_raw = jax.lax.pmin(lo_raw, axis)
        hi_raw = jax.lax.pmax(hi_raw, axis)
    span = jnp.max(hi_raw - lo_raw)
    h = span / f32(grid - 4) + f32(1e-30)  # 2-cell margin each side
    center = (lo_raw + hi_raw) / 2.0
    lo = center - h * f32(grid) / 2.0
    return lo, h


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


def _tsc_indices_weights(pos3, lo, h, grid: int):
    """TSC (triangular-shaped cloud, Hockney & Eastwood order-3): 27
    (flat index, weight) pairs per particle.

    Per axis, around the NEAREST node with frac ∈ [-0.5, 0.5):
        w(-1) = (1/2)(1/2 − frac)²,  w(0) = 3/4 − frac²,
        w(+1) = (1/2)(1/2 + frac)²           (sum = 1).
    One order smoother than CIC — the assigned field has a continuous
    first derivative, so the mesh force loses the cell-crossing kinks
    that dominate CIC's error.
    """
    rel = (pos3 - lo[None, :]) / h
    base = jnp.floor(rel + 0.5)      # nearest node
    frac = rel - base                # in [-0.5, 0.5)
    base = base.astype(jnp.int32)

    def w1(fr, off):
        if off == -1:
            return 0.5 * (0.5 - fr) ** 2
        if off == 0:
            return 0.75 - fr * fr
        return 0.5 * (0.5 + fr) ** 2

    idxs = []
    weights = []
    for dx in (-1, 0, 1):
        wx = w1(frac[:, 0], dx)
        ix = jnp.clip(base[:, 0] + dx, 0, grid - 1)
        for dy in (-1, 0, 1):
            wy = w1(frac[:, 1], dy)
            iy = jnp.clip(base[:, 1] + dy, 0, grid - 1)
            for dz in (-1, 0, 1):
                wz = w1(frac[:, 2], dz)
                iz = jnp.clip(base[:, 2] + dz, 0, grid - 1)
                idxs.append((ix * grid + iy) * grid + iz)
                weights.append(wx * wy * wz)
    return jnp.stack(idxs), jnp.stack(weights)


# assignment scheme name -> ((idx, w) builder, per-axis Fourier-window
# exponent: the order-p B-spline window is sinc^p per axis)
ASSIGNMENTS = {
    "cic": (_cic_indices_weights, 2),
    "tsc": (_tsc_indices_weights, 3),
}


def _deposit(idx, w, mass, grid: int):
    """CIC scatter-add -> flat (grid^3,) density grid."""
    rho = jnp.zeros(grid * grid * grid, jnp.float32)
    return rho.at[idx.reshape(-1)].add((w * mass[None, :]).reshape(-1))


def _solve_force_grids(rho_flat, h, grid: int, sigma=None,
                       deconvolve: bool = False, window_exp: int = 2):
    """Isolated-BC Poisson solve; returns 3 flat (grid^3,) accel grids.

    phi = -conv(rho, K) on the 2G zero-padded mesh, a = -grad(phi) =
    +grad(conv); gradient applied spectrally (i*k multiply).

    K is the open-space kernel: plain PM uses 1/r with K(0)=0 (removes the
    bulk of the self-interaction); the P3M split passes ``sigma`` (in
    LENGTH units) to use the Gaussian-smoothed erf(r/(sqrt2 sigma))/r —
    smooth at the origin (K(0) = sqrt(2/pi)/sigma), so the mesh only ever
    represents structure above sigma and a short-range pair sum supplies
    the rest exactly.

    ``deconvolve`` divides the spectrum by the squared assignment window
    W(k)^2 (one factor for deposit, one for gather), where W is sinc^p per
    axis with p = ``window_exp`` (2 for CIC, 3 for TSC). Only sensible when
    the target field is smooth (the sigma path — measured ~2x error
    reduction at sigma=1.5h); it AMPLIFIES sub-cell error for the raw 1/r
    kernel, so plain PM keeps it off.
    """
    f32 = jnp.float32
    rho = rho_flat.reshape(grid, grid, grid)
    gp = 2 * grid
    rho_p = jnp.zeros((gp, gp, gp), f32).at[:grid, :grid, :grid].set(rho)

    n = jnp.arange(gp)
    d = jnp.minimum(n, gp - n).astype(f32) * h
    r2 = (d[:, None, None] ** 2 + d[None, :, None] ** 2
          + d[None, None, :] ** 2)
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    if sigma is None:
        kernel = jnp.where(r2 > 0, 1.0 / r, 0.0)
    else:
        sigma = jnp.asarray(sigma, f32)
        k0 = jnp.sqrt(2.0 / jnp.pi) / sigma
        u = r / (jnp.sqrt(2.0).astype(f32) * sigma)
        kernel = jnp.where(r2 > 0, jax.scipy.special.erf(u) / r, k0)

    conv_k = jnp.fft.fftn(rho_p) * jnp.fft.fftn(kernel)
    f1 = jnp.fft.fftfreq(gp, d=h).astype(f32)
    if deconvolve:
        # the order-p B-spline window is sinc^p per axis (p=2 CIC triangle,
        # p=3 TSC quadratic) — one factor each for deposit and gather makes
        # sinc^(2p) per axis total. Measured on the P3M split (CIC): none
        # 1.2% / half 0.65% / full 0.36% median force error (r2 review
        # caught the original half-correction).
        wx = jnp.sinc(f1 * h) ** window_exp  # W(k) per axis
        win = wx[:, None, None] * wx[None, :, None] * wx[None, None, :]
        conv_k = conv_k / (win * win)
    k1 = (2.0 * jnp.pi) * f1
    grids = []
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = gp
        kv = k1.reshape(shape)
        grad = jnp.real(jnp.fft.ifftn(conv_k * (1j * kv))).astype(f32)
        grids.append(grad[:grid, :grid, :grid].reshape(-1))
    return grids


def _gather(force_grids, idx, w):
    return jnp.stack([jnp.sum(g[idx] * w, axis=0) for g in force_grids],
                     axis=1)


@functools.partial(jax.jit, static_argnames=("grid", "assignment"))
def pm_accel(pos, *, grid: int = 64, assignment: str = "cic"):
    """(N, 4) [x,y,z,m] -> (N, 3) far-field accelerations (single device).

    assignment: "cic" (8-point trilinear) or "tsc" (27-point quadratic —
    one order smoother, ~2x lower force error on the same mesh for ~2x
    the deposit/gather work; the FFT solve cost is unchanged).
    """
    if pos.shape[-1] != 4:
        raise ValueError("pm_accel expects (N, 4) [x,y,z,m]")
    assign, _ = ASSIGNMENTS[assignment]
    pos3 = pos[:, :3].astype(jnp.float32)
    mass = pos[:, 3].astype(jnp.float32)
    lo, h = _fit_box(pos3, grid)
    idx, w = assign(pos3, lo, h, grid)
    rho = _deposit(idx, w, mass, grid)
    return _gather(_solve_force_grids(rho, h, grid), idx, w)


def nbody_step_pm(pos, vel, dt, softening, damping, *, grid: int = 64,
                  assignment: str = "cic"):
    """PM step with the reference's damped semi-implicit Euler update.

    `softening` is accepted for interface parity but PM's effective
    softening is the cell scale (set by `grid`), which dominates any
    Plummer epsilon below it.
    """
    from nbody_tpu.ops.reference import integrate

    del softening
    a = pm_accel(pos, grid=grid, assignment=assignment)
    return integrate(pos, vel, a, dt, damping)


def make_sharded_pm_step(mesh, *, grid: int = 64, axis: str = "bodies",
                         integrator: str = "euler",
                         assignment: str = "cic"):
    """Body-sharded PM step over a mesh: (pos, vel, dt, soft, damp) ->
    (pos, vel), pos/vel sharded P(axis, None).

    Per chip: local CIC deposit of its body shard, one psum of the G^3
    density grid over ICI, a (redundant, cheap) per-chip FFT solve, local
    gather — the multi-chip structure where only O(G^3) bytes move.
    """
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.ops.reference import integrate, nbody_step_leapfrog

    if integrator not in ("euler", "leapfrog"):
        raise ValueError(f"unknown integrator {integrator!r}")

    assign, _ = ASSIGNMENTS[assignment]

    def accel_local(pos_sh):
        pos3 = pos_sh[:, :3].astype(jnp.float32)
        mass = pos_sh[:, 3].astype(jnp.float32)
        lo, h = _fit_box(pos3, grid, axis=axis)
        idx, w = assign(pos3, lo, h, grid)
        rho = jax.lax.psum(_deposit(idx, w, mass, grid), axis)
        return _gather(_solve_force_grids(rho, h, grid), idx, w)

    def local(pos_sh, vel_sh, dt, soft, damp):
        del soft  # PM's effective softening is the cell scale
        if integrator == "leapfrog":
            return nbody_step_leapfrog(pos_sh, vel_sh, dt, 0.0, damp,
                                       accel_fn=accel_local)
        return integrate(pos_sh, vel_sh, accel_local(pos_sh), dt, damp)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )

    @jax.jit
    def step(pos, vel, dt, softening, damping):
        return sharded(
            pos, vel,
            jnp.asarray(dt, pos.dtype),
            jnp.asarray(softening, pos.dtype),
            jnp.asarray(damping, pos.dtype),
        )

    return step
