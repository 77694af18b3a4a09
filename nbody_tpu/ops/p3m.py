"""P3M (particle-particle particle-mesh): near-exact forces at PM speed.

Ewald-style split of the softened Plummer force into a smooth long-range
part solved on the PM mesh and an exact short-range correction summed over
neighbors only (Hockney & Eastwood's P3M, built TPU-first):

  long-range:  the PM pipeline (ops/pm.py) with the Gaussian-smoothed
               kernel erf(r / sqrt(2) sigma) / r — smooth at the origin, so
               the mesh is only asked to represent structure above sigma;
  short-range: s_sr(r) = (r^2+eps^2)^{-3/2} - s_lr(r), where
               s_lr(r) = [erf(u) - (2/sqrt(pi)) u exp(-u^2)] / r^3,
               u = r/(sqrt(2) sigma) — decays like exp(-u^2), truncated at
               r_cut = 4 sigma (relative truncation ~1e-7).

The short-range sum uses a SORTED CELL LIST laid out for the TPU's
contiguity preferences (random-index gathers measured 100x slower):
particles sort into cell order once, each cell's bodies become one
contiguous row range, a cell's 27 neighbor ranges are fetched with
``dynamic_slice`` (capacity-padded, masked), and the pair math runs on
dense (capacity, 27*capacity) VPU tiles batched through ``lax.map``.
Everything is static-shaped, jit- and vmap-friendly. Cells holding more
than ``capacity`` bodies overflow: excess bodies drop out of the
short-range sums, so ``p3m_accel`` returns the overflow count for the
caller to act on (BodySystem raises at state-set; standalone callers
should check). Sizing rule: pick ``grid`` so the mean occupancy
N/(grid/6)^3 stays a few times below ``capacity``.

All-pairs kernels remain the exactness anchor; P3M is the production fast
mode for N where O(N^2) is unaffordable. Measured (PARITY.md): ~0.4%
median force error (10-30x tighter than plain PM on the same mesh),
~1.4 s per force evaluation at N=1M/G=128 on one v5e — 3.5x the exact
kernel — with the gap growing quadratically in N.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from nbody_tpu.ops.pm import (
    ASSIGNMENT_COMPONENTS,
    ASSIGNMENTS,
    _deposit,
    _deposit_slab,
    _fit_box,
    _gather,
    _gather_slab,
    _solve_force_grids,
    _solve_force_grids_slab,
)

# Gaussian split scale, in PM-mesh cells. Measured tradeoff (PARITY.md):
# bigger sigma shrinks mesh error but grows rcut = 4*sigma and with it the
# neighbor-cell occupancy (cost ~ rcut^3), so production P3M keeps sigma
# near the cell scale and buys accuracy back with CIC deconvolution.
SIGMA_CELLS = 1.5
RCUT_SIGMAS = 4.0    # short-range truncation radius, in sigmas (err ~1e-7)


def _s_lr(r2, sigma):
    """Long-range force shape s_lr(r) with F_lr = m * s_lr * r_vec.

    The closed form [erf(u) - (2/sqrt(pi)) u exp(-u^2)] / r^3 cancels
    CATASTROPHICALLY in float32 for u = r/(sqrt2 sigma) << 1 (both terms
    ~u, difference ~u^3: at r=1e-5, sigma=0.1 the f32 formula returns
    -7276 vs the true +266 — an order-of-magnitude spurious force).
    Below u=0.25 use the Taylor series instead,
        s_lr = (2/sqrt(pi)) / (sqrt2 sigma)^3 * (2/3 - 2u^2/5 + u^4/7),
    whose truncation error there is <2e-4 relative; above it the closed
    form's cancellation is <u^-2 * eps_f32 ~ 1e-6 relative. Crossover at
    u^2 = 0.0625.
    """
    f32 = jnp.float32
    sq2s = jnp.sqrt(2.0).astype(f32) * sigma
    u2 = r2 / (sq2s * sq2s)
    u = jnp.sqrt(jnp.maximum(u2, 1e-30))
    r3 = jnp.maximum(r2 * jnp.sqrt(jnp.maximum(r2, 1e-30)), 1e-30)
    two_over_sqrtpi = jnp.asarray(2.0 / math.sqrt(math.pi), f32)
    closed = (jax.scipy.special.erf(u)
              - two_over_sqrtpi * u * jnp.exp(-u2)) / r3
    series = (two_over_sqrtpi / (sq2s * sq2s * sq2s)
              * (2.0 / 3.0 - (2.0 / 5.0) * u2 + (1.0 / 7.0) * u2 * u2))
    return jnp.where(u2 < 0.0625, series, closed)


def _cell_rcut(h):
    """Short-range cell edge — ONE formula everywhere (probes and engines
    must bin identically; 6*h vs 4*(1.5*h) differ in the last ulp)."""
    f32 = jnp.float32
    return f32(RCUT_SIGMAS) * (f32(SIGMA_CELLS) * h)


def _bin_cells(pos3, lo, rcut, gc: int):
    """Per-body short-range cell ids on the gc^3 lattice (clipped)."""
    ci = jnp.clip(jnp.floor((pos3 - lo[None, :]) / rcut).astype(jnp.int32),
                  0, gc - 1)
    return (ci[:, 0] * gc + ci[:, 1]) * gc + ci[:, 2]


def _neighbor_stencil(gc: int):
    """The static 27-stencil over the cell grid: (nid, nvalid), each
    (ncell, 27) — out-of-lattice neighbors flagged invalid."""
    ncell = gc * gc * gc
    cc = jnp.arange(ncell, dtype=jnp.int32)
    cx, cy, cz = cc // (gc * gc), (cc // gc) % gc, cc % gc
    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)], jnp.int32)  # (27, 3)
    nx = cx[:, None] + offs[None, :, 0]
    ny = cy[:, None] + offs[None, :, 1]
    nz = cz[:, None] + offs[None, :, 2]
    nvalid = ((nx >= 0) & (nx < gc) & (ny >= 0) & (ny < gc)
              & (nz >= 0) & (nz < gc))
    return jnp.where(nvalid, (nx * gc + ny) * gc + nz, 0), nvalid


def _massive_occupancy(pos, grid: int):
    """Per-cell count of MASSIVE bodies (zero-mass padding is inert)."""
    f32 = jnp.float32
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    lo, h = _fit_box(pos3, grid)
    gc = _cell_grid_size(grid)
    cell = _bin_cells(pos3, lo, _cell_rcut(h), gc)
    return jnp.zeros(gc * gc * gc, jnp.int32).at[cell].add(
        (mass > 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("grid",))
def p3m_max_occupancy(pos, *, grid: int = 64):
    """Largest number of MASSIVE bodies in any short-range cell — the
    occupancy statistic capacity auto-sizing needs (one bincount)."""
    return jnp.max(_massive_occupancy(pos, grid))


@functools.partial(jax.jit, static_argnames=("grid", "capacity"))
def p3m_overflow_count(pos, *, grid: int = 64, capacity: int = 128):
    """Occupancy-only overflow check — how many MASSIVE bodies exceed their
    cell's capacity. No FFT, no pair math: one bincount, so callers (e.g.
    BodySystem's state-set probe) can validate sizing in milliseconds."""
    return jnp.sum(jnp.maximum(_massive_occupancy(pos, grid) - capacity, 0))


def _cell_grid_size(grid: int) -> int:
    """Short-range cells per axis — STATIC because rcut is a fixed multiple
    of the mesh cell h (rcut = RCUT_SIGMAS*SIGMA_CELLS mesh cells)."""
    return max(1, math.ceil(grid / (RCUT_SIGMAS * SIGMA_CELLS)))


def _sorted_cell_tables(pos3, mass, lo, rcut, gc: int, cap: int):
    """Sort bodies into rcut-sized cells; build the contiguous range tables
    the dense-tile short-range pass consumes.

    Random-index gathers are TPU-hostile (measured 35 s at N=262k), so the
    short-range pass is laid out for contiguity instead: particles SORT
    into cell order once, each cell's bodies become one contiguous row
    range, and a cell's 27 neighbor ranges are fetched with dynamic_slice
    (contiguous, capacity-padded, masked).

    Returns (order, sorted_pos4, starts, counts, n_starts, n_counts,
    overflow): `sorted_pos4` is (N+cap, 4) — cap inert pad rows (far away,
    zero mass) so any (start, cap) slice stays in bounds; `n_starts` /
    `n_counts` are the (ncell, 27) neighbor-range tables; `overflow` counts
    MASSIVE bodies beyond their cell's cap slots.
    """
    f32 = jnp.float32
    n = pos3.shape[0]
    ncell = gc * gc * gc
    cell = _bin_cells(pos3, lo, rcut, gc)

    # sort key puts MASSIVE bodies first within each cell, so zero-mass
    # padding (tipsy/BodySystem pads pile up at the origin cell) fills the
    # trailing capacity slots and drops first — a dropped massless body
    # neither exerts nor (physically) needs force, so only dropped massive
    # bodies count as overflow
    massive = mass > 0
    order = jnp.argsort(cell * 2 + (~massive).astype(jnp.int32))
    sorted_cell = cell[order]
    # int32 throughout: under jax_enable_x64 searchsorted/arange default to
    # int64 and dynamic_slice then rejects mixed-dtype start indices
    bounds = jnp.searchsorted(sorted_cell, jnp.arange(ncell + 1)).astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cell]
    overflow = jnp.sum((rank >= cap) & massive[order])

    sorted_pos4 = jnp.concatenate(
        [pos3[order], mass[order][:, None]], axis=1)
    pad_rows = jnp.concatenate(
        [jnp.full((cap, 3), 1e30, f32), jnp.zeros((cap, 1), f32)], axis=1)
    sorted_pos4 = jnp.concatenate([sorted_pos4, pad_rows], axis=0)

    # per-cell neighbor cell ids (static 27-stencil over the cell grid)
    nid, nvalid = _neighbor_stencil(gc)
    n_starts = jnp.where(nvalid, starts[nid], n).astype(jnp.int32)
    n_counts = jnp.where(nvalid, counts[nid], 0).astype(jnp.int32)
    return order, sorted_pos4, starts, counts, n_starts, n_counts, overflow


def _short_range_cells(sorted_pos4, starts, counts, n_starts, n_counts, *,
                       eps2, sigma, rcut, cap: int, chunk: int, n: int,
                       i_tile: int = 128):
    """Dense-tile short-range pass over the given per-cell range tables.

    The tables may cover ANY static number of cells — the single-device
    path passes all of them, the sharded path passes its device's slice
    (padded cells are inert: start=n lands on the pad rows, count=0 masks
    everything). Returns accelerations scattered into the SORTED frame,
    shape (n, 3) — rows of cells outside the given tables are zero.

    Work is organized for occupancy SKEW (real states have collapsed
    cores: one cell forcing cap=1000 while the median holds ~100 bodies)
    instead of one (cap, 27*cap) tile per cell:

    * **i-subtile worklist** — each cell's (up to cap) i-rows split into
      ceil/``i_tile``-row subtiles; the worklist length is statically
      bounded by ncell + ceil(n/i_tile) (sum of ceils) and entries beyond
      the live count are inert, so sparse cells stop paying the core's
      i-row count.
    * **j-capacity classes** — each entry is classed by the largest of its
      27 neighbor occupancies (powers of two up to cap); entries sort by
      class and one ``fori_loop`` with a DYNAMIC trip count runs per class
      with that class's STATIC j-slice width, so sparse neighborhoods stop
      paying the core's j-columns too.

    Cost scales with occupancy sums instead of ncell·cap·27·cap
    (measured 10.06 s → 1.90 s, 5.3×, at N=1M on a collapsed shell with
    cap=1000: 4.4× from i-subtiles, 1.2× from j-classes — the state is
    dense enough that most entries neighbor a big cell); uniform states
    resolve to one class and the original batching. Per i-row the
    j-reduction runs the same 27 neighbor slices in the same order
    (padding columns contribute exact zeros), so forces match the
    per-cell layout to reduction-order rounding.
    """
    f32 = jnp.float32
    cap_s = min(i_tile, cap)
    lane_i = jnp.arange(cap_s, dtype=jnp.int32)
    ncl = starts.shape[0]

    # ---- build the i-subtile worklist (static length L, live prefix T) ----
    # i-rows beyond cap are dropped here exactly as in the per-cell layout
    # (the overflow contract): subtiles cover min(count, cap) rows
    rows_c = jnp.minimum(counts, cap)
    t_c = -(-rows_c // cap_s)                      # subtiles per cell
    L = ncl + -(-n // cap_s)                       # static bound on sum(t_c)
    cum = jnp.cumsum(t_c).astype(jnp.int32)        # inclusive
    T = cum[-1]                                    # live entries (dynamic)
    slot = jnp.arange(L, dtype=jnp.int32)
    cell = jnp.clip(
        jnp.searchsorted(cum, slot, side="right").astype(jnp.int32),
        0, ncl - 1)
    t_within = slot - (cum[cell] - t_c[cell])
    live = slot < T
    e_start = jnp.where(live, starts[cell] + t_within * cap_s, n)
    e_count = jnp.where(live, rows_c[cell] - t_within * cap_s, 0)
    e_nst = jnp.where(live[:, None], n_starts[cell], n)
    e_nct = jnp.where(live[:, None], n_counts[cell], 0)

    # ---- class each entry by its largest neighbor occupancy ----
    classes = []
    jc = min(128, cap)
    while jc < cap:
        classes.append(jc)
        jc *= 2
    classes.append(cap)                            # last class = full cap
    jmax = jnp.max(jnp.minimum(e_nct, cap), axis=1).astype(jnp.int32)
    ecls = jnp.searchsorted(
        jnp.asarray(classes, jnp.int32), jmax, side="left").astype(jnp.int32)
    ecls = jnp.where(live, ecls, len(classes))     # inert entries last
    eorder = jnp.argsort(ecls)
    e_start, e_count = e_start[eorder], e_count[eorder]
    e_nst, e_nct = e_nst[eorder], e_nct[eorder]
    bounds = jnp.searchsorted(
        ecls[eorder], jnp.arange(len(classes) + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    def make_one_tile(jcap):
        lane_j = jnp.arange(jcap, dtype=jnp.int32)

        def one_tile(i_start, i_count, nst, nct):
            zero = jnp.int32(0)
            rows = jax.lax.dynamic_slice(
                sorted_pos4, (i_start, zero), (cap_s, 4))
            ivalid = lane_i < jnp.minimum(i_count, cap_s)

            def neighbor(st, ct):
                blk = jax.lax.dynamic_slice(
                    sorted_pos4, (st, zero), (jcap, 4))
                mj = jnp.where(lane_j < jnp.minimum(ct, jcap), blk[:, 3], 0.0)
                return blk[:, :3], mj

            pj, mj = jax.vmap(neighbor)(nst, nct)        # (27, jcap, 3/..)
            pj = pj.reshape(27 * jcap, 3)
            mj = mj.reshape(27 * jcap)
            d = pj[None, :, :] - rows[:, None, :3]       # (cap_s, 27jcap, 3)
            r2 = jnp.sum(d * d, axis=-1)
            inv_full = jax.lax.rsqrt(r2 + eps2)
            s_full = inv_full * inv_full * inv_full
            s = jnp.where(r2 < rcut * rcut, s_full - _s_lr(r2, sigma), 0.0)
            acc = jnp.einsum("mk,mkj->mj", mj[None, :] * s, d)
            return jnp.where(ivalid[:, None], acc, 0.0)

        return one_tile

    # per-class batch sizes keep the dense-tile footprint ~constant
    # (b*cap_s*27*jcap ≈ chunk*27*cap, the old per-cell batching bound)
    b_of = {jc: max(1, min(L, (chunk * cap) // (cap_s * jc)))
            for jc in classes}
    b_max = max(b_of.values())

    def pade(x):
        # pad so any in-segment dynamic_slice stays in bounds; padded values
        # never survive (the ok-mask in batch_body overrides them)
        return jnp.concatenate(
            [x, jnp.zeros((b_max,) + x.shape[1:], x.dtype)])

    w_start, w_count = pade(e_start), pade(e_count)
    w_nst, w_nct = pade(e_nst), pade(e_nct)
    buf = jnp.zeros((n + 1, 3), f32)

    for k, jcap in enumerate(classes):
        one_tile = make_one_tile(jcap)
        b = b_of[jcap]
        seg_lo, seg_hi = bounds[k], bounds[k + 1]

        def batch_body(i, acc_buf, *, b=b, one_tile=one_tile,
                       seg_lo=seg_lo, seg_hi=seg_hi):
            o = seg_lo + i * b
            ok = (o + jnp.arange(b, dtype=jnp.int32)) < seg_hi
            bs = jnp.where(ok, jax.lax.dynamic_slice_in_dim(w_start, o, b), n)
            bc = jnp.where(ok, jax.lax.dynamic_slice_in_dim(w_count, o, b), 0)
            bnst = jnp.where(ok[:, None],
                             jax.lax.dynamic_slice_in_dim(w_nst, o, b), n)
            bnct = jnp.where(ok[:, None],
                             jax.lax.dynamic_slice_in_dim(w_nct, o, b), 0)
            acc = jax.vmap(one_tile)(bs, bc, bnst, bnct)  # (b, cap_s, 3)
            dest = bs[:, None] + lane_i[None, :]
            within = lane_i[None, :] < jnp.minimum(bc, cap_s)[:, None]
            dest = jnp.where(within, dest, n)             # sacrificial row
            return acc_buf.at[dest.reshape(-1)].add(acc.reshape(-1, 3))

        nb = (seg_hi - seg_lo + b - 1) // b               # dynamic trip count
        buf = jax.lax.fori_loop(0, nb, batch_body, buf)

    return buf[:n]


# canonical home is the kernel module; re-exported here for callers that
# think in solver terms (probe and engine both default blk through it)
from nbody_tpu.ops.p3m_kernel import p3m_kernel_blk  # noqa: E402,F401


@functools.partial(
    jax.jit,
    static_argnames=("grid", "capacity", "chunk", "assignment",
                     "short_range", "pair_budget", "influence", "blk",
                     "interpret"),
)
def p3m_accel(pos, softening, *, grid: int = 64, capacity: int = 128,
              chunk: int = 2048, assignment: str = "cic",
              short_range: str = "xla", pair_budget: int | None = None,
              influence: str = "optimal", blk: int | None = None,
              interpret: bool = False):
    """(N, 4) [x,y,z,m] -> ((N, 3) accelerations, overflow count).

    Equals the softened all-pairs Plummer force up to mesh error of the
    SMOOTH field (sub-percent). `overflow` counts bodies that did not fit
    their cell's `capacity` slots; nonzero overflow means some short-range
    pairs were dropped — callers should treat it like a failed assertion.

    short_range="pallas" runs the block-sparse Pallas pair kernel
    (ops/p3m_kernel.py — 2.3x the XLA pass at N=1M on-chip); it requires
    `pair_budget` >= the state's p3m_kernel_blk-tile pair count (probe
    with p3m_pair_count; BodySystem does this at state-set — pairs beyond
    the budget are silently dropped, the same contract as capacity).
    """
    if pos.shape[-1] != 4:
        raise ValueError("p3m_accel expects (N, 4) [x,y,z,m]")
    if influence not in ("naive", "optimal"):
        raise ValueError(f"unknown influence {influence!r}")
    deconv = "optimal" if influence == "optimal" else True
    f32 = jnp.float32
    n = pos.shape[0]
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    eps2 = jnp.asarray(softening, f32) ** 2

    lo, h = _fit_box(pos3, grid)
    sigma = f32(SIGMA_CELLS) * h
    rcut = f32(RCUT_SIGMAS) * sigma

    # ---- long-range: PM with the smoothed kernel ----
    assign, wexp = ASSIGNMENTS[assignment]
    idx, w = assign(pos3, lo, h, grid)
    rho = _deposit(idx, w, mass, grid)
    # influence="optimal": H&E alias-aware optimal influence function
    # (pm._optimal_influence_factor); "naive" keeps the plain 1/W^2
    # deconvolution. Measured error table: scripts/tpu_influence_error.py.
    acc_lr = _gather(
        _solve_force_grids(rho, h, grid, sigma=sigma, deconvolve=deconv,
                           window_exp=wexp, sigma_cells=SIGMA_CELLS),
        idx, w,
    )

    if short_range == "pallas":
        from nbody_tpu.ops.p3m_kernel import p3m_short_range_pallas

        if pair_budget is None:
            raise ValueError(
                "short_range='pallas' needs pair_budget (probe with "
                "p3m_pair_count)")
        acc_sr, overflow, _ = p3m_short_range_pallas(
            pos, softening, grid=grid, capacity=capacity,
            pair_budget=pair_budget,
            blk=p3m_kernel_blk(capacity) if blk is None else blk,
            interpret=interpret)
        return acc_lr + acc_sr, overflow
    if short_range != "xla":
        raise ValueError(f"unknown short_range {short_range!r}")

    # ---- short-range: sorted cell list, processed as dense tiles ----
    gc = _cell_grid_size(grid)
    (order, sorted_pos4, starts, counts,
     n_starts, n_counts, overflow) = _sorted_cell_tables(
        pos3, mass, lo, rcut, gc, capacity)
    acc_sorted = _short_range_cells(
        sorted_pos4, starts, counts, n_starts, n_counts,
        eps2=eps2, sigma=sigma, rcut=rcut, cap=capacity, chunk=chunk, n=n)
    acc_sr = jnp.zeros((n, 3), f32).at[order].set(acc_sorted)

    return acc_lr + acc_sr, overflow


def nbody_step_p3m(pos, vel, dt, softening, damping, *, grid: int = 64,
                   capacity: int = 128, chunk: int = 2048,
                   assignment: str = "cic", short_range: str = "xla",
                   pair_budget: int | None = None,
                   influence: str = "optimal", blk: int | None = None,
                   interpret: bool = False):
    """P3M step with the reference's damped semi-implicit Euler update.

    Returns (pos, vel, overflow); callers doing long rollouts should probe
    overflow on their initial state (see BodySystem) — a clustered core
    outgrowing `capacity` degrades the short-range sum silently.
    """
    from nbody_tpu.ops.reference import integrate

    a, overflow = p3m_accel(pos, softening, grid=grid, capacity=capacity,
                            chunk=chunk, assignment=assignment,
                            short_range=short_range, pair_budget=pair_budget,
                            influence=influence, blk=blk,
                            interpret=interpret)
    new_pos, new_vel = integrate(pos, vel, a, dt, damping)
    return new_pos, new_vel, overflow


def _p3m_accel_local_factory(*, axis: str, ndev: int, grid: int,
                             capacity: int, chunk: int, assignment: str,
                             fft: str, short_range: str,
                             pair_budget: int | None, influence: str,
                             interpret: bool):
    """Shared shard_map-local P3M force evaluation: `accel_local(pos_sh,
    soft) -> (nloc, 3)` — the long-range (replicated or slab FFT) +
    short-range (round-robin cells or block-sparse Pallas chunk range)
    decomposition documented on make_sharded_p3m_step, factored so the
    fixed-dt sharded step and the sharded adaptive rollout drive ONE
    force implementation."""
    deconv = "optimal" if influence == "optimal" else True
    assign, wexp = ASSIGNMENTS[assignment]
    comp, _ = ASSIGNMENT_COMPONENTS[assignment]
    gc = _cell_grid_size(grid)
    ncell = gc * gc * gc
    ncell_loc = -(-ncell // ndev)       # cells per chip (static)
    ncell_pad = ncell_loc * ndev
    if short_range == "pallas":
        from nbody_tpu.ops.p3m_kernel import PAIR_CHUNK

        # pad so every device runs the same static chunk count
        pair_budget = -(-pair_budget // (PAIR_CHUNK * ndev)) * (
            PAIR_CHUNK * ndev)
        nchunk_dev = pair_budget // PAIR_CHUNK // ndev

    def accel_local(pos_sh, soft):
        f32 = jnp.float32
        nloc = pos_sh.shape[0]
        n = nloc * ndev
        pos3_sh = pos_sh[:, :3].astype(f32)
        mass_sh = pos_sh[:, 3].astype(f32)
        eps2 = jnp.asarray(soft, f32) ** 2
        lo, h = _fit_box(pos3_sh, grid, axis=axis)  # pmin/pmax → global box
        sigma = f32(SIGMA_CELLS) * h
        rcut = f32(RCUT_SIGMAS) * sigma

        pos_all = jax.lax.all_gather(pos_sh, axis, axis=0, tiled=True)
        pos3 = pos_all[:, :3].astype(f32)
        mass = pos_all[:, 3].astype(f32)
        d = jax.lax.axis_index(axis)

        if fft == "slab":
            # long-range on the distributed-FFT x-slab pipeline: gathered
            # bodies deposit into this chip's slab (masked), the solve
            # never materializes the padded grid, and the partial gather
            # joins the short-range partials in ONE (N, 3) psum below
            ixc, iyc, izc, wc = comp(pos3, lo, h, grid)
            gl = 2 * grid // ndev
            x0 = (d * gl).astype(jnp.int32)
            rho_slab = _deposit_slab(ixc, iyc, izc, wc, mass, grid, x0, gl)
            grids = _solve_force_grids_slab(
                rho_slab, h, grid, axis=axis, ndev=ndev, sigma=sigma,
                deconvolve=deconv, window_exp=wexp,
                sigma_cells=SIGMA_CELLS)
            acc_lr_partial = _gather_slab(grids, ixc, iyc, izc, wc, x0, gl,
                                          grid)
        else:
            # long-range: local deposit, grid psum, redundant solve,
            # local gather
            idx, w = assign(pos3_sh, lo, h, grid)
            rho = jax.lax.psum(_deposit(idx, w, mass_sh, grid), axis)
            acc_lr = _gather(
                _solve_force_grids(rho, h, grid, sigma=sigma,
                                   deconvolve=deconv, window_exp=wexp,
                                   sigma_cells=SIGMA_CELLS),
                idx, w,
            )

        if short_range == "pallas":
            # block-sparse pair kernel over THIS chip's chunk range of the
            # (redundantly built) pair worklist; range-straddling i-blocks
            # start from zero here and complete in the psum below
            from nbody_tpu.ops.p3m_kernel import _short_range_pallas_impl

            acc_sr_part, _, _, _ = _short_range_pallas_impl(
                pos_all, soft, grid=grid, capacity=capacity,
                pair_budget=pair_budget, interpret=interpret,
                blk=p3m_kernel_blk(capacity),
                chunk_lo=(d * nchunk_dev).astype(jnp.int32),
                nchunk_local=nchunk_dev)
            if fft == "slab":
                acc_full = jax.lax.psum(acc_sr_part + acc_lr_partial, axis)
                return jax.lax.dynamic_slice_in_dim(
                    acc_full, (d * nloc).astype(jnp.int32), nloc, axis=0)
            acc_sr_full = jax.lax.psum(acc_sr_part, axis)
            return acc_lr + jax.lax.dynamic_slice_in_dim(
                acc_sr_full, (d * nloc).astype(jnp.int32), nloc, axis=0)

        # short-range: redundant sort of the gathered set, slice of cells
        (order, sorted_pos4, starts, counts,
         n_starts, n_counts, _) = _sorted_cell_tables(
            pos3, mass, lo, rcut, gc, capacity)

        def padc(x, fill):
            return jnp.concatenate(
                [x, jnp.full((ncell_pad - ncell,) + x.shape[1:], fill,
                             x.dtype)])

        # round-robin cell assignment: chip d takes cells d, d+D, d+2D, …
        # (a strided gather of the per-cell tables) — spreads heavy cells
        # across chips so dynamic per-cell cost balances in expectation
        cell_ids = (d + ndev * jnp.arange(ncell_loc, dtype=jnp.int32))

        def sl(x):
            return x[cell_ids]

        acc_sorted = _short_range_cells(
            sorted_pos4, sl(padc(starts, n)), sl(padc(counts, 0)),
            sl(padc(n_starts, n)), sl(padc(n_counts, 0)),
            eps2=eps2, sigma=sigma, rcut=rcut, cap=capacity, chunk=chunk,
            n=n)
        if fft == "slab":
            # unsorting is a permutation, valid per partial; one combined
            # psum covers both force halves
            acc_partial = (jnp.zeros((n, 3), f32).at[order].set(acc_sorted)
                           + acc_lr_partial)
            acc_full = jax.lax.psum(acc_partial, axis)
            return jax.lax.dynamic_slice_in_dim(
                acc_full, (d * nloc).astype(jnp.int32), nloc, axis=0)
        acc_sorted = jax.lax.psum(acc_sorted, axis)
        acc_sr = jnp.zeros((n, 3), f32).at[order].set(acc_sorted)
        acc_sr_local = jax.lax.dynamic_slice_in_dim(
            acc_sr, (d * nloc).astype(jnp.int32), nloc, axis=0)
        return acc_lr + acc_sr_local

    return accel_local


def make_sharded_p3m_accel(mesh, *, grid: int = 64, capacity: int = 128,
                           chunk: int = 2048, axis: str = "bodies",
                           assignment: str = "cic", fft: str = "replicated",
                           short_range: str = "xla",
                           pair_budget: int | None = None,
                           influence: str = "optimal",
                           interpret: bool = False):
    """Jitted sharded P3M force evaluation: `(pos4 sharded P(axis, None),
    soft) -> (N, 3)` with the same sharding — the building block for the
    sharded adaptive rollout's jit-level scan (see make_sharded_pm_accel)."""
    from jax.sharding import PartitionSpec as P

    if fft not in ("replicated", "slab"):
        raise ValueError(f"unknown fft {fft!r}")
    if short_range not in ("xla", "pallas"):
        raise ValueError(f"unknown short_range {short_range!r}")
    if influence not in ("naive", "optimal"):
        raise ValueError(f"unknown influence {influence!r}")
    if short_range == "pallas" and pair_budget is None:
        raise ValueError(
            "short_range='pallas' needs pair_budget (probe with "
            "p3m_pair_count at blk=p3m_kernel_blk(capacity))")
    ndev = mesh.shape[axis]
    if fft == "slab" and (2 * grid) % ndev:
        raise ValueError(
            f"fft='slab' needs the device count ({ndev}) to divide the "
            f"padded grid 2*{grid}")
    accel_local = _p3m_accel_local_factory(
        axis=axis, ndev=ndev, grid=grid, capacity=capacity, chunk=chunk,
        assignment=assignment, fft=fft, short_range=short_range,
        pair_budget=pair_budget, influence=influence, interpret=interpret)
    return jax.shard_map(
        accel_local, mesh=mesh, in_specs=(P(axis, None), P()),
        out_specs=P(axis, None), check_vma=False)


def make_sharded_p3m_step(mesh, *, grid: int = 64, capacity: int = 128,
                          chunk: int = 2048, axis: str = "bodies",
                          integrator: str = "euler",
                          assignment: str = "cic",
                          fft: str = "replicated",
                          short_range: str = "xla",
                          pair_budget: int | None = None,
                          influence: str = "optimal",
                          interpret: bool = False):
    """Body-sharded P3M step over a mesh: (pos, vel, dt, soft, damp) ->
    (pos, vel), pos/vel sharded P(axis, None).

    Multi-chip structure (TPU-first — no halo bookkeeping):

    * **long-range**: exactly the sharded-PM shape — each chip deposits its
      body shard locally, ONE ``psum`` of the G^3 density grid over ICI,
      a redundant (cheap) per-chip FFT solve with the smoothed kernel, and
      a local gather for its own shard.
    * **short-range**: the shards ``all_gather`` positions (N·16 B — the
      same collective the exact allgather strategy pays), every chip sorts
      the full set into cells REDUNDANTLY (one O(N log N) XLA sort, a few
      ms — far cheaper than exchanging halo cells and rebalancing), then
      computes only ITS 1/D subset of the cells — assigned round-robin
      (cells d, d+D, d+2D, …), so the occupancy-adaptive worklist's
      per-cell cost variation (i-subtiles + j-classes scale with LOCAL
      occupancy) spreads statistically instead of concentrating a dense
      core's cells on one chip. One ``psum`` of the (N, 3) short-range
      accelerations (each sorted row is written by exactly one chip)
      completes the field, and each chip keeps its body rows.

    Per-step ICI traffic: N·16 B gather + N·12 B psum + G^3·4 B psum
    (~29 MB at N=1M, G=64) — comparable to the exact allgather strategy.

    ``fft="slab"`` switches the long-range solve to the distributed-FFT
    x-slab pipeline (see make_sharded_pm_step / _solve_force_grids_slab):
    the padded (2G)^3 grid is never materialized on any single chip, so
    the mesh resolution scales past one chip's HBM (needs ndev | 2*grid).

    Overflow is NOT returned (shard_map outputs are the stepped state);
    callers must validate `capacity` against their initial state with
    ``p3m_overflow_count`` / ``p3m_max_occupancy`` — BodySystem does this
    at every state-set.
    """
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.ops.reference import integrate, nbody_step_leapfrog

    if integrator not in ("euler", "leapfrog"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if fft not in ("replicated", "slab"):
        raise ValueError(f"unknown fft {fft!r}")
    if short_range not in ("xla", "pallas"):
        raise ValueError(f"unknown short_range {short_range!r}")
    if influence not in ("naive", "optimal"):
        raise ValueError(f"unknown influence {influence!r}")
    ndev = mesh.shape[axis]
    if short_range == "pallas" and pair_budget is None:
        raise ValueError(
            "short_range='pallas' needs pair_budget (probe with "
            "p3m_pair_count at blk=p3m_kernel_blk(capacity))")
    if fft == "slab" and (2 * grid) % ndev:
        raise ValueError(
            f"fft='slab' needs the device count ({ndev}) to divide the "
            f"padded grid 2*{grid}")
    accel_local = _p3m_accel_local_factory(
        axis=axis, ndev=ndev, grid=grid, capacity=capacity, chunk=chunk,
        assignment=assignment, fft=fft, short_range=short_range,
        pair_budget=pair_budget, influence=influence, interpret=interpret)

    def local(pos_sh, vel_sh, dt, soft, damp):
        if integrator == "leapfrog":
            return nbody_step_leapfrog(
                pos_sh, vel_sh, dt, 0.0, damp,
                accel_fn=lambda p4: accel_local(p4, soft))
        return integrate(pos_sh, vel_sh, accel_local(pos_sh, soft), dt, damp)

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
