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
import os

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


def _cic_components(pos3, lo, h, grid: int):
    """CIC: 8 stencil points per particle on a grid^3 lattice.

    Returns (ix, iy, iz, w): each (8, N) — per-axis node indices (clipped)
    and trilinear weights summing to 1.
    """
    rel = (pos3 - lo[None, :]) / h  # in cell units
    base = jnp.floor(rel)
    frac = rel - base
    base = base.astype(jnp.int32)

    ixs, iys, izs, weights = [], [], [], []
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = jnp.clip(base[:, 0] + dx, 0, grid - 1)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = jnp.clip(base[:, 1] + dy, 0, grid - 1)
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = jnp.clip(base[:, 2] + dz, 0, grid - 1)
                ixs.append(ix)
                iys.append(iy)
                izs.append(iz)
                weights.append(wx * wy * wz)
    return (jnp.stack(ixs), jnp.stack(iys), jnp.stack(izs),
            jnp.stack(weights))


def _cic_indices_weights(pos3, lo, h, grid: int):
    """CIC: 8 (flat index, weight) pairs per particle on a grid^3 lattice."""
    ix, iy, iz, w = _cic_components(pos3, lo, h, grid)
    return (ix * grid + iy) * grid + iz, w


def _tsc_components(pos3, lo, h, grid: int):
    """TSC (triangular-shaped cloud, Hockney & Eastwood order-3): 27
    stencil points per particle; returns (ix, iy, iz, w), each (27, N).

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

    ixs, iys, izs, weights = [], [], [], []
    for dx in (-1, 0, 1):
        wx = w1(frac[:, 0], dx)
        ix = jnp.clip(base[:, 0] + dx, 0, grid - 1)
        for dy in (-1, 0, 1):
            wy = w1(frac[:, 1], dy)
            iy = jnp.clip(base[:, 1] + dy, 0, grid - 1)
            for dz in (-1, 0, 1):
                wz = w1(frac[:, 2], dz)
                iz = jnp.clip(base[:, 2] + dz, 0, grid - 1)
                ixs.append(ix)
                iys.append(iy)
                izs.append(iz)
                weights.append(wx * wy * wz)
    return (jnp.stack(ixs), jnp.stack(iys), jnp.stack(izs),
            jnp.stack(weights))


def _tsc_indices_weights(pos3, lo, h, grid: int):
    """TSC: 27 (flat index, weight) pairs per particle."""
    ix, iy, iz, w = _tsc_components(pos3, lo, h, grid)
    return (ix * grid + iy) * grid + iz, w


# assignment scheme name -> ((idx, w) builder, per-axis Fourier-window
# exponent: the order-p B-spline window is sinc^p per axis)
ASSIGNMENTS = {
    "cic": (_cic_indices_weights, 2),
    "tsc": (_tsc_indices_weights, 3),
}

# assignment scheme name -> per-axis-component builder (slab decomposition)
ASSIGNMENT_COMPONENTS = {
    "cic": (_cic_components, 2),
    "tsc": (_tsc_components, 3),
}


def _deposit(idx, w, mass, grid: int):
    """CIC scatter-add -> flat (grid^3,) density grid."""
    rho = jnp.zeros(grid * grid * grid, jnp.float32)
    return rho.at[idx.reshape(-1)].add((w * mass[None, :]).reshape(-1))


def _greens_kernel(r2, sigma=None):
    """Open-space Green's-function values on a grid of squared distances:
    1/r with K(0)=0 (plain PM), or the Gaussian-smoothed
    erf(r/(sqrt2 sigma))/r with K(0)=sqrt(2/pi)/sigma (the P3M split)."""
    f32 = jnp.float32
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    if sigma is None:
        return jnp.where(r2 > 0, 1.0 / r, 0.0)
    sigma = jnp.asarray(sigma, f32)
    k0 = jnp.sqrt(2.0 / jnp.pi) / sigma
    u = r / (jnp.sqrt(2.0).astype(f32) * sigma)
    return jnp.where(r2 > 0, jax.scipy.special.erf(u) / r, k0)


@functools.lru_cache(maxsize=8)
def _optimal_influence_factor(grid: int, sigma_cells, window_exp: int):
    """Hockney–Eastwood optimal-influence correction factor, as a constant
    (2G, 2G, G+1) half-spectrum table in UNIT-CELL k-space.

    H&E (Computer Simulation Using Particles, eq. 8-22) minimize the
    position-averaged mean-square force error over the influence function,
    accounting for ALIASING of the assignment window — naive 1/W(k)^2
    deconvolution amplifies the aliased power it cannot undo. With our
    exact spectral differentiation D(k) = i k and reference force spectrum
    R(k') = -i k' g(k') (g = 4π e^{-σ²k'²/2}/k'², the Gaussian-smoothed
    open-space kernel; σ=0 for plain PM), the optimum is

        G_opt(k) = [ Σ_m U²(k_m) (k·k_m) g(k_m) ] / [ k² S(k)² ]

    over alias images k_m = k + 2π m (unit cell), with U the per-axis
    sinc^p B-spline window and S = Σ_m U²(k_m). The pipeline multiplies
    the SAMPLED isolated-BC kernel spectrum K̂(k) — which equals g(k) up
    to the isolated-boundary correction — so this returns the RATIO
    F(k) = G_opt(k) / g(k), applied multiplicatively: K̂·F ≈ G_opt with
    the isolated-BC structure preserved. Everything is dimensionless in
    cell units (σ enters as σ/h, fixed by the P3M split), so the table is
    h-independent and computed once per (grid, σ_cells, p) in NumPy.

    Images are truncated at m ∈ {-1,0,1}³: U² decays as (k h)^(-2p), so
    the omitted images contribute O(3^-2p) — below fp32 for p ≥ 2.
    """
    import numpy as np

    gp = 2 * grid
    nz = gp // 2 + 1
    sc = float(sigma_cells) if sigma_cells is not None else 0.0
    p = int(window_exp)

    # disk cache next to the XLA compilation cache: the table is pure math
    # keyed by (grid, sigma/h, p) but costs ~25 s of host churn at G=128
    # (scaling ~G^3) — pay it once per machine, not per process. Opt out /
    # relocate with the same env vars the compilation cache honors.
    cache_file = None
    if not os.environ.get("NBODY_NO_COMPILE_CACHE"):
        cache_dir = os.path.join(
            os.environ.get("NBODY_COMPILE_CACHE_DIR")
            or os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "nbody_tpu"),
            "influence")
        cache_file = os.path.join(
            cache_dir, f"g{grid}_s{sc!r}_p{p}_v1.npy")
        try:
            tab = np.load(cache_file)
            if tab.shape == (gp, gp, nz) and tab.dtype == np.float32:
                return tab
        except (OSError, ValueError):
            pass
    fx = np.fft.fftfreq(gp)                      # dimensionless ∈ [-0.5, 0.5)
    fz = np.fft.rfftfreq(gp)

    def g_hat(q2):
        with np.errstate(divide="ignore", invalid="ignore"):
            g = 4.0 * np.pi * np.exp(-0.5 * sc * sc * q2) / q2
        return np.where(q2 > 0, g, 0.0)

    # x-plane chunks bound the f64 temporaries: the 27-image loop
    # materializes several (cx, gp, nz) arrays per image, which at G=256
    # would be ~540 MB EACH unchunked (multi-GB peak, minutes of churn,
    # at first trace of every large-grid p3m run — this table is the
    # silent default there). cx caps each temporary at ~32 MB.
    cx = max(1, min(gp, (1 << 22) // max(1, gp * nz)))
    out = np.empty((gp, gp, nz), np.float32)
    for x0 in range(0, gp, cx):
        f3 = (fx[x0 : x0 + cx, None, None], fx[None, :, None],
              fz[None, None, :])
        k0 = [2.0 * np.pi * f for f in f3]
        k0_sq = sum(k * k for k in k0)
        num = np.zeros((f3[0].shape[0], gp, nz))
        s_sum = np.zeros_like(num)
        for mx in (-1, 0, 1):
            for my in (-1, 0, 1):
                for mz in (-1, 0, 1):
                    km = [2.0 * np.pi * (f3[0] + mx),
                          2.0 * np.pi * (f3[1] + my),
                          2.0 * np.pi * (f3[2] + mz)]
                    u2 = (np.sinc(f3[0] + mx) * np.sinc(f3[1] + my)
                          * np.sinc(f3[2] + mz)) ** (2 * p)
                    km_sq = sum(k * k for k in km)
                    k_dot = sum(a * b for a, b in zip(k0, km))
                    num += u2 * k_dot * g_hat(km_sq)
                    s_sum += u2
        denom = k0_sq * s_sum * s_sum * g_hat(k0_sq)
        with np.errstate(divide="ignore", invalid="ignore"):
            f_opt = num / denom
        # k=0: forces carry no DC component (i*k kills it) — any finite
        # value works; 1.0 keeps the kernel's own DC convention
        out[x0 : x0 + cx] = np.where(denom > 0, f_opt, 1.0)
    if cache_file is not None:
        try:  # cache is an optimization, never a failure mode
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{cache_file}.tmp{os.getpid()}.npy"
            np.save(tmp, out)  # np.save keeps the name (already .npy)
            os.replace(tmp, cache_file)
        except OSError:
            pass
    # return HOST memory (NumPy): an lru_cached jnp array created inside a
    # trace would leak that trace's tracer into later ones
    return out


def _apply_deconvolution(conv_k, deconvolve, grid, h, window_exp,
                         sigma_cells=None, *, f1, fz, fy=None, y_slice=None):
    """Shared spectrum correction for the replicated and slab solvers.

    deconvolve: False (raw), True (naive 1/W² division), or "optimal"
    (multiply by the H&E optimal-influence ratio — see
    _optimal_influence_factor). For "optimal", the smoothing scale enters
    as the STATIC σ/h ratio ``sigma_cells`` (the P3M split's SIGMA_CELLS;
    None for plain PM) so the table is trace-constant.
    """
    if deconvolve is False:
        return conv_k
    if deconvolve == "optimal":
        table = jnp.asarray(_optimal_influence_factor(grid, sigma_cells,
                                                      window_exp))
        if y_slice is not None:
            table = jax.lax.dynamic_slice_in_dim(
                table, y_slice[0], y_slice[1], axis=1)
        return conv_k * table
    wx = jnp.sinc(f1 * h) ** window_exp
    wz = jnp.sinc(fz * h) ** window_exp
    wy = wx if fy is None else jnp.sinc(fy * h) ** window_exp
    win = wx[:, None, None] * wy[None, :, None] * wz[None, None, :]
    return conv_k / (win * win)


def _solve_force_grids(rho_flat, h, grid: int, sigma=None,
                       deconvolve=False, window_exp: int = 2,
                       sigma_cells=None):
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
    kernel = _greens_kernel(r2, sigma)

    # rho and the kernel are both REAL, so the whole solve runs on
    # half-spectrum transforms (rfftn/irfftn over the last axis) — half
    # the FFT work and memory of the complex pipeline
    conv_k = jnp.fft.rfftn(rho_p) * jnp.fft.rfftn(kernel)
    f1 = jnp.fft.fftfreq(gp, d=h).astype(f32)
    fz = jnp.fft.rfftfreq(gp, d=h).astype(f32)
    # deconvolve=True: naive 1/W² division — the order-p B-spline window is
    # sinc^p per axis, one factor each for deposit and gather. Measured on
    # the P3M split (CIC): none 1.2% / half 0.65% / full 0.36% median
    # force error. deconvolve="optimal": the H&E optimal-influence ratio
    # (alias-aware; see _optimal_influence_factor) — measured better still
    # (scripts/tpu_influence_error.py).
    conv_k = _apply_deconvolution(conv_k, deconvolve, grid, h, window_exp,
                                  sigma_cells, f1=f1, fz=fz)
    # spectral derivative: zero the Nyquist bin of the differentiation
    # operator (its sign is ambiguous; the complex pipeline's real() cast
    # discarded the asymmetric part implicitly — this is the explicit,
    # symmetric convention for the half-spectrum transform)
    k1 = ((2.0 * jnp.pi) * f1).at[gp // 2].set(0.0)
    kz = ((2.0 * jnp.pi) * fz).at[gp // 2].set(0.0)
    grids = []
    for axis in range(3):
        if axis == 2:
            kv = kz[None, None, :]
        else:
            shape = [1, 1, 1]
            shape[axis] = gp
            kv = k1.reshape(shape)
        grad = jnp.fft.irfftn(conv_k * (1j * kv), s=(gp, gp, gp)).astype(f32)
        grids.append(grad[:grid, :grid, :grid].reshape(-1))
    return grids


def _gather(force_grids, idx, w):
    return jnp.stack([jnp.sum(g[idx] * w, axis=0) for g in force_grids],
                     axis=1)


# ---- slab-decomposed (distributed-FFT) pipeline ----
#
# The replicated solve holds the full zero-padded (2G)^3 grid on every chip
# (~1 GB of complex64 temporaries at G=256), which caps the mesh resolution
# at what ONE chip's HBM fits. The slab pipeline shards the padded grid
# over the mesh as x-plane slabs and never materializes it anywhere:
#
#   FFT(y,z) on the local (2G/D, 2G, 2G) slab      — local batched FFTs
#   all_to_all transpose (split y, concat x)       — ONE ICI collective
#   FFT(x) on the (2G, 2G/D, 2G) y-pencil          — local
#
# and the inverse runs the mirror. The Green's-function grid goes through
# the same transform (its values are analytic per slab), the spectral
# multiply and i*k gradients act on aligned y-pencils, and deposit/gather
# run against the local slab with off-slab stencil points masked (a
# particle straddling a slab boundary is completed by the final psum).


def _slab_fft3(slab, axis: str):
    """(2G/D, 2G, 2G) real x-slab -> (2G, 2G/D, G+1) y-pencil half
    spectrum: rfft on z (the input is real — halves both the local FFT
    work and the all_to_all bytes), fft on y, transpose, fft on x."""
    f = jnp.fft.rfft(slab, axis=2)
    f = jnp.fft.fft(f, axis=1)
    f = jax.lax.all_to_all(f, axis, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(f, axis=0)


def _slab_ifft3_real(spec, axis: str):
    """Inverse of _slab_fft3, returning the real x-slab."""
    gp = spec.shape[0]
    f = jnp.fft.ifft(spec, axis=0)
    f = jax.lax.all_to_all(f, axis, split_axis=0, concat_axis=1, tiled=True)
    f = jnp.fft.ifft(f, axis=1)
    return jnp.fft.irfft(f, n=gp, axis=2).astype(jnp.float32)


def _solve_force_grids_slab(rho_slab, h, grid: int, *, axis: str, ndev: int,
                            sigma=None, deconvolve=False,
                            window_exp: int = 2, sigma_cells=None):
    """Distributed-FFT Poisson solve on x-slabs of the padded 2G grid.

    rho_slab: (2G/ndev, 2G, 2G) — this chip's x-planes of the zero-padded
    density (planes >= G hold the padding zeros by construction). Returns
    three (2G/ndev, 2G, 2G) real acceleration slabs. Mirrors
    _solve_force_grids exactly (same kernel, deconvolution, i*k gradient);
    only the data decomposition differs.
    """
    f32 = jnp.float32
    gp = 2 * grid
    gl = gp // ndev
    d = jax.lax.axis_index(axis)

    # Green's-function slab in real space (analytic per plane)
    gx = (d * gl + jnp.arange(gl)).astype(jnp.int32)
    n_full = jnp.arange(gp)
    dx1 = jnp.minimum(gx, gp - gx).astype(f32) * h      # (gl,)
    d1 = jnp.minimum(n_full, gp - n_full).astype(f32) * h  # (gp,)
    r2 = (dx1[:, None, None] ** 2 + d1[None, :, None] ** 2
          + d1[None, None, :] ** 2)
    kernel = _greens_kernel(r2, sigma)

    conv_k = _slab_fft3(rho_slab, axis) * _slab_fft3(kernel, axis)

    # spectral coordinates of the y-pencil: x full, y chunked, z half
    f1 = jnp.fft.fftfreq(gp, d=h).astype(f32)
    fz = jnp.fft.rfftfreq(gp, d=h).astype(f32)
    fy = jax.lax.dynamic_slice_in_dim(f1, (d * gl).astype(jnp.int32), gl)
    conv_k = _apply_deconvolution(
        conv_k, deconvolve, grid, h, window_exp, sigma_cells,
        f1=f1, fz=fz, fy=fy, y_slice=((d * gl).astype(jnp.int32), gl))
    # derivative Nyquist bins zeroed — the same explicit convention as the
    # replicated half-spectrum solve (_solve_force_grids)
    k1 = ((2.0 * jnp.pi) * f1).at[gp // 2].set(0.0)
    kz = ((2.0 * jnp.pi) * fz).at[gp // 2].set(0.0)
    ky = (2.0 * jnp.pi) * jnp.where(jnp.abs(fy * h) >= 0.5 - 1e-7, 0.0, fy)
    kvs = [k1[:, None, None], ky[None, :, None], kz[None, None, :]]
    return [_slab_ifft3_real(conv_k * (1j * kv), axis) for kv in kvs]


def _deposit_slab(ix, iy, iz, w, mass, grid: int, x0, gl: int):
    """Masked scatter-add of the stencil points owned by this x-slab into
    a (gl, 2G, 2G) padded-density slab."""
    gp = 2 * grid
    lx = ix - x0
    ok = (lx >= 0) & (lx < gl)
    flat = jnp.where(ok, (lx * gp + iy) * gp + iz, gl * gp * gp)
    rho = jnp.zeros(gl * gp * gp + 1, jnp.float32).at[flat.reshape(-1)].add(
        (w * mass[None, :]).reshape(-1))
    return rho[:-1].reshape(gl, gp, gp)


def _gather_slab(grids, ix, iy, iz, w, x0, gl: int, grid: int):
    """Masked CIC/TSC gather from this chip's slab grids; off-slab stencil
    points contribute zero (the psum across slabs completes them)."""
    gp = 2 * grid
    lx = ix - x0
    ok = (lx >= 0) & (lx < gl)
    flat = jnp.where(ok, (lx * gp + iy) * gp + iz, 0)
    out = []
    for g in grids:
        vals = jnp.where(ok, g.reshape(-1)[flat], 0.0)
        out.append(jnp.sum(vals * w, axis=0))
    return jnp.stack(out, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("grid", "assignment", "influence"))
def pm_accel(pos, *, grid: int = 64, assignment: str = "cic",
             influence: str = "none"):
    """(N, 4) [x,y,z,m] -> (N, 3) far-field accelerations (single device).

    assignment: "cic" (8-point trilinear) or "tsc" (27-point quadratic —
    one order smoother, ~2x lower force error on the same mesh for ~2x
    the deposit/gather work; the FFT solve cost is unchanged).
    influence: "none" (raw kernel — naive 1/W^2 deconvolution of the raw
    1/r kernel AMPLIFIES sub-cell error, so plain PM defaults off),
    "naive", or "optimal" (H&E alias-aware influence function — measured
    error table: scripts/tpu_influence_error.py).
    """
    if pos.shape[-1] != 4:
        raise ValueError("pm_accel expects (N, 4) [x,y,z,m]")
    if influence not in ("none", "naive", "optimal"):
        raise ValueError(f"unknown influence {influence!r}")
    deconv = {"none": False, "naive": True, "optimal": "optimal"}[influence]
    assign, wexp = ASSIGNMENTS[assignment]
    pos3 = pos[:, :3].astype(jnp.float32)
    mass = pos[:, 3].astype(jnp.float32)
    lo, h = _fit_box(pos3, grid)
    idx, w = assign(pos3, lo, h, grid)
    rho = _deposit(idx, w, mass, grid)
    return _gather(
        _solve_force_grids(rho, h, grid, deconvolve=deconv,
                           window_exp=wexp, sigma_cells=None),
        idx, w)


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


def _pm_accel_local_factory(*, axis: str, ndev: int, grid: int,
                            assignment: str, fft: str):
    """Shared shard_map-local PM force evaluation: `accel_local(pos_sh)
    -> (nloc, 3)`, used by the fixed-dt sharded step AND the sharded
    adaptive rollout (one force decomposition, two drivers)."""
    assign, _ = ASSIGNMENTS[assignment]
    comp, _ = ASSIGNMENT_COMPONENTS[assignment]

    def accel_local_replicated(pos_sh):
        pos3 = pos_sh[:, :3].astype(jnp.float32)
        mass = pos_sh[:, 3].astype(jnp.float32)
        lo, h = _fit_box(pos3, grid, axis=axis)
        idx, w = assign(pos3, lo, h, grid)
        rho = jax.lax.psum(_deposit(idx, w, mass, grid), axis)
        return _gather(_solve_force_grids(rho, h, grid), idx, w)

    def accel_local_slab(pos_sh):
        f32 = jnp.float32
        nloc = pos_sh.shape[0]
        pos_all = jax.lax.all_gather(pos_sh, axis, axis=0, tiled=True)
        pos3 = pos_all[:, :3].astype(f32)
        mass = pos_all[:, 3].astype(f32)
        lo, h = _fit_box(pos3, grid)     # gathered -> identical per chip
        ix, iy, iz, w = comp(pos3, lo, h, grid)
        gl = 2 * grid // ndev
        d = jax.lax.axis_index(axis)
        x0 = (d * gl).astype(jnp.int32)
        rho = _deposit_slab(ix, iy, iz, w, mass, grid, x0, gl)
        grids = _solve_force_grids_slab(rho, h, grid, axis=axis, ndev=ndev)
        acc = jax.lax.psum(
            _gather_slab(grids, ix, iy, iz, w, x0, gl, grid), axis)
        return jax.lax.dynamic_slice_in_dim(
            acc, (d * nloc).astype(jnp.int32), nloc)

    return accel_local_slab if fft == "slab" else accel_local_replicated


def make_sharded_pm_accel(mesh, *, grid: int = 64, axis: str = "bodies",
                          assignment: str = "cic", fft: str = "replicated"):
    """Jitted sharded PM force evaluation: `(pos4 sharded P(axis, None))
    -> (N, 3)` with the same sharding — the building block the sharded
    ADAPTIVE rollout plugs into its jit-level scan (the dt criterion's
    global max then reduces over the sharded array via GSPMD, exactly
    like the p3m probed rollout's jit-level bincounts)."""
    from jax.sharding import PartitionSpec as P

    if fft not in ("replicated", "slab"):
        raise ValueError(f"unknown fft {fft!r}")
    ndev = mesh.shape[axis]
    if fft == "slab" and (2 * grid) % ndev:
        raise ValueError(
            f"fft='slab' needs the device count ({ndev}) to divide the "
            f"padded grid 2*{grid}")
    accel_local = _pm_accel_local_factory(axis=axis, ndev=ndev, grid=grid,
                                          assignment=assignment, fft=fft)
    return jax.shard_map(
        accel_local, mesh=mesh, in_specs=(P(axis, None),),
        out_specs=P(axis, None), check_vma=False)


def make_sharded_pm_step(mesh, *, grid: int = 64, axis: str = "bodies",
                         integrator: str = "euler",
                         assignment: str = "cic",
                         fft: str = "replicated"):
    """Body-sharded PM step over a mesh: (pos, vel, dt, soft, damp) ->
    (pos, vel), pos/vel sharded P(axis, None).

    fft="replicated" (default): local deposit of the body shard, one psum
    of the G^3 density grid over ICI, a redundant per-chip FFT solve,
    local gather — the right structure while the padded (2G)^3 FFT fits
    one chip's HBM (G ≲ 128).

    fft="slab": the DISTRIBUTED-FFT pipeline — the padded grid lives as
    x-plane slabs (never materialized whole anywhere): gathered positions
    deposit into each chip's slab (masked stencil), the Poisson solve runs
    local FFTs + one all_to_all transpose each way, and a masked slab
    gather + one (N,3) psum returns the forces. Use when G^3 outgrows a
    chip (G ≥ 256). Needs ndev | 2*grid.
    """
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.ops.reference import integrate, nbody_step_leapfrog

    if integrator not in ("euler", "leapfrog"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if fft not in ("replicated", "slab"):
        raise ValueError(f"unknown fft {fft!r}")
    ndev = mesh.shape[axis]
    if fft == "slab" and (2 * grid) % ndev:
        raise ValueError(
            f"fft='slab' needs the device count ({ndev}) to divide the "
            f"padded grid 2*{grid}")

    accel_local = _pm_accel_local_factory(axis=axis, ndev=ndev, grid=grid,
                                          assignment=assignment, fft=fft)

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
