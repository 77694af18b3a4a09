"""Block-sparse Pallas kernel for the P3M short-range sum.

The XLA short-range pass (ops/p3m.py::_short_range_cells) runs dense
(i_tile, 27*cap) neighbor tiles through dynamic_slice + vmap — correct and
occupancy-adaptive, but it reaches only ~20% of the VPU's measured
throughput (intermediates stream through HBM). This module re-lays the
same math as the TPU's favorite sparse pattern: **block-sparse pair
tiles** with scalar-prefetch-driven block index maps (the megablox/MoE
pattern), so the Pallas grid pipeline double-buffers all DMAs
automatically:

* the sorted bodies are re-laid into a CELL-ALIGNED padded array — each
  cell's (<= capacity) rows start at a 128-row block boundary, inert pad
  rows in between (static size: 128*(ncell + ceil(N/128)) rows),
* every (i-cell-subtile, j-neighbor-subtile) pair becomes one (128, 128)
  interaction tile; the pair worklist (block ids, grouped by i-block) is
  built with the same cumsum/searchsorted machinery as the XLA worklist,
* the kernel's in/out BlockSpecs read their block indices from prefetched
  scalar arrays: i-blocks stream from the padded AoS array, j-blocks from
  its transposed copy, and the OUTPUT block doubles as the accumulator —
  zeroed when a new i-block begins, written back by Pallas when the
  out-index changes (consecutive pairs share the i-block by
  construction).

The pair count is data-dependent (occupancy products), so it carries the
same contract as the cell capacity: ``p3m_pair_count`` probes the exact
count, callers size ``pair_budget`` with headroom (BodySystem re-probes at
every state-set), and the builder reports when the budget is exceeded
(dropped pairs = wrong forces, same failure mode as capacity overflow).

The erf-based long-range shape s_lr is evaluated as a degree-10
polynomial fitted over the kernel's whole masked domain (see _SLR_POLY) —
both XLA and Pallas paths are transcendental-bound with the exact erf,
and the fit error (<= 7e-6 absolute) sits three orders below the split's
force error.

Measured at N=1M / G=128 / capacity=1000 (collapsed shell, one v5e):
the XLA worklist pass runs ~1.5 s per short-range eval, this kernel
888/661/769 ms at blk = 128/256/512 — DMA-issue-bound (one small j-block
DMA per grid step), which is why the mid-size block wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.p3m import RCUT_SIGMAS, SIGMA_CELLS, _cell_grid_size
from nbody_tpu.ops.pm import _fit_box

BLK = 128   # default pair-tile edge; p3m_short_range_pallas takes blk=


# s_lr(r2) = f(y) / (sqrt2 sigma)^3 with y = u^2 = r2/(2 sigma^2) and
# f(y) = [erf(sqrt y) - (2/sqrt pi) sqrt(y) e^-y] / y^{3/2} — SMOOTH on the
# kernel's whole masked domain y in [0, 8] (rcut = 4 sigma), so instead of
# paying erf + 2 exp + sqrt + divides per element, the kernel evaluates a
# degree-10 Chebyshev-fitted polynomial (10 FMAs; |abs err| <= 7e-6 vs
# f(0)=0.752 — three orders below the split's force error). Fit recipe in
# scripts/ commentary; coefficients lowest-order first.
_SLR_POLY = (
    0.7522514718300537,
    -0.4513297496782609,
    0.1611063215380149,
    -0.04162870626770713,
    0.008389008230325833,
    -0.0013517520799301759,
    0.0001720653915474035,
    -1.6553017193590822e-05,
    1.1152261980593794e-06,
    -4.625102305643162e-08,
    8.792217886009483e-10,
)


def _s_lr_kernel(r2, sigma):
    """In-kernel long-range force shape via the fitted polynomial (valid
    for r <= rcut = 4 sigma, i.e. y <= 8 — callers mask beyond)."""
    f32 = jnp.float32
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    y = r2 * inv_2s2
    g = jnp.full_like(y, f32(_SLR_POLY[-1]))
    for c in _SLR_POLY[-2::-1]:
        g = g * y + f32(c)
    sq2s = f32(1.4142135623730951) * sigma
    return g / (sq2s * sq2s * sq2s)


def _cells_and_neighbors(pos3, lo, rcut, gc: int):
    """Per-body cell ids + per-cell 27-stencil neighbor ids (nid, nvalid)
    — the SHARED binning/stencil helpers, so probes and engines cannot
    drift apart."""
    from nbody_tpu.ops.p3m import _bin_cells, _neighbor_stencil

    cell = _bin_cells(pos3, lo, rcut, gc)
    nid, nvalid = _neighbor_stencil(gc)
    return cell, nid, nvalid


def p3m_kernel_blk(capacity: int) -> int:
    """Pair-tile edge for the Pallas short-range. Probe (p3m_pair_count)
    and engine (p3m_short_range_pallas / p3m_accel) both default blk
    through this, so a budget sized by the probe can never be measured
    against a different tile count than the engine runs.

    An autotuner winner (``nbody-tune --family p3m``, cached per
    CAPACITY bucket) overrides the compile-time heuristic — and because
    every probe and engine resolves blk HERE, the override keeps them
    consistent by construction.

    The compile-time fallback ladder freezes the r5 on-chip sweep
    (scripts/tpu_r5_p3m_tune.py, SHELL at grid=64, G interactions/s for
    blk 128/256/512 per capacity bucket):

        cap bucket  128:  13.7 /  9.1 /  4.0   -> 128
        cap bucket  512:  90.4 / 90.8 / 50.4   -> 256
        cap bucket 2048: 256.8 / 350.4 / 321.8 -> 256
        cap bucket 8192: 414.4 / 729.7 / 817.3 -> 512

    Wider tiles amortize DMA issue once cells span many blocks but pad
    small cells to waste; the crossovers sit near cap 192 and cap 4096
    (geometric midpoint of the measured 2048->256 / 8192->512 flip).
    This supersedes the r4 hand note (N=1M/cap=1000: 888/661/769 ms for
    128/256/512), which the bucket-2048 row reproduces."""
    tuned = _tuned_blk(int(capacity))
    if tuned is not None:
        return tuned
    if capacity > 4096:
        return 512
    return 256 if capacity > 192 else 128


@functools.lru_cache(maxsize=64)
def _tuned_blk(capacity: int):
    try:
        from nbody_tpu.tune import best_config

        winner = best_config(capacity, family="p3m")
    except Exception:
        return None
    return int(winner["blk"]) if winner and "blk" in winner else None


@functools.partial(jax.jit, static_argnames=("grid", "capacity", "blk"))
def p3m_pair_count(pos, *, grid: int = 64, capacity: int = 128,
                   blk: int | None = None):
    """(blk, blk) pair-tile count for the current state — the probe that
    sizes ``pair_budget`` (one bincount + cumsums, no pair math).
    blk=None derives the tile edge from capacity via p3m_kernel_blk —
    identical to the engine's default, by construction.

    Approximate at cell boundaries: the box fit's min/max reductions can
    reassociate differently under different jit contexts, shifting h by
    an ulp and reassigning ~1%% of bodies — size budgets with headroom
    (BodySystem uses 1.5x), never exactly."""
    if blk is None:
        blk = p3m_kernel_blk(capacity)
    f32 = jnp.float32
    from nbody_tpu.ops.p3m import _cell_rcut

    pos3 = pos[:, :3].astype(f32)
    lo, h = _fit_box(pos3, grid)
    rcut = _cell_rcut(h)
    gc = _cell_grid_size(grid)
    cell, nid, nvalid = _cells_and_neighbors(pos3, lo, rcut, gc)
    counts = jnp.zeros(gc * gc * gc, jnp.int32).at[cell].add(1)
    kept = jnp.minimum(counts, capacity)
    tpc = -(-kept // blk)
    jt = jnp.where(nvalid, tpc[nid], 0)
    return jnp.sum(tpc * jt.sum(axis=1))


def _build_pair_tables(pos3, mass, lo, rcut, gc: int, cap: int,
                       pair_budget: int, blk: int = BLK):
    """Cell-aligned padded layout + block-pair worklist.

    Returns (padded (M+BLK, 4), padded_t (4, M+BLK), ib, jb, newi,
    body_row (N,), order, pair_count, overflow) — ib/jb are BLOCK indices
    into the padded arrays (the last block is the inert/sacrificial one),
    grouped so equal i-blocks are consecutive.
    """
    f32 = jnp.float32
    n = pos3.shape[0]
    ncell = gc * gc * gc
    cell, nid, nvalid = _cells_and_neighbors(pos3, lo, rcut, gc)

    massive = mass > 0
    order = jnp.argsort(cell * 2 + (~massive).astype(jnp.int32))
    sorted_cell = cell[order]
    bounds = jnp.searchsorted(sorted_cell,
                              jnp.arange(ncell + 1)).astype(jnp.int32)
    starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cell]
    overflow = jnp.sum((rank >= cap) & massive[order])

    kept = jnp.minimum(counts, cap)
    tpc = -(-kept // blk)                                # blocks per cell
    mb_bound = ncell + -(-n // blk)                      # static block bound
    m_pad = mb_bound * blk
    ablk = (jnp.cumsum(tpc) - tpc).astype(jnp.int32)     # exclusive, blocks

    # place kept sorted rows at their aligned positions; base is inert
    body_row = jnp.where(
        rank < cap, ablk[sorted_cell] * blk + rank, m_pad + blk)
    base = jnp.concatenate(
        [jnp.full((m_pad + blk, 3), 1e30, f32),
         jnp.zeros((m_pad + blk, 1), f32)], axis=1)
    rows = jnp.concatenate([pos3[order], mass[order][:, None]], axis=1)
    padded = base.at[jnp.minimum(body_row, m_pad + blk - 1)].set(
        jnp.where((rank < cap)[:, None], rows, base[0]))
    padded_t = padded.T

    # pair enumeration: cell-major, i-subtile-major, then (neighbor, u)
    jt = jnp.where(nvalid, tpc[nid], 0).astype(jnp.int32)  # (ncell, 27)
    jcum = jnp.cumsum(jt, axis=1).astype(jnp.int32)        # inclusive
    jtot = jcum[:, -1]
    pc = tpc * jtot
    pair_cum = jnp.cumsum(pc).astype(jnp.int32)
    pair_count = pair_cum[-1]

    slot = jnp.arange(pair_budget, dtype=jnp.int32)
    c = jnp.clip(jnp.searchsorted(pair_cum, slot, side="right")
                 .astype(jnp.int32), 0, ncell - 1)
    within = slot - (pair_cum[c] - pc[c])
    jtot_c = jnp.maximum(jtot[c], 1)
    t = within // jtot_c
    rem = within % jtot_c
    k = jnp.sum(rem[:, None] >= jcum[c], axis=1).astype(jnp.int32)
    k = jnp.minimum(k, 26)
    u = rem - (jcum[c, k] - jt[c, k])
    live = slot < pair_count
    ib = jnp.where(live, ablk[c] + t, mb_bound).astype(jnp.int32)
    jb = jnp.where(live, ablk[nid[c, k]] + u, mb_bound).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ib[:-1]])
    newi = (ib != prev).astype(jnp.int32)
    return (padded, padded_t, ib, jb, newi, body_row, order,
            pair_count, overflow)


# pairs per kernel call: the pair metadata is scalar-prefetched into SMEM
# (~1 MB total), so the worklist streams through in chunks of PAIR_CHUNK,
# with the accumulator carried across calls via input/output aliasing
PAIR_CHUNK = 8192


def _sr_pair_kernel(meta_ref, ib_ref, jb_ref, init_ref,
                    iblk_ref, jblk_ref, accin_ref, out_ref):
    p = pl.program_id(0)

    # init codes (computed outside): 0 = same i-block as the previous pair
    # in this call (VMEM accumulator persists), 1 = new i-block (zero),
    # 2 = chunk boundary continuing a block from the previous call (load
    # the carried partial)
    @pl.when(init_ref[p] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(init_ref[p] == 2)
    def _carry():
        out_ref[:] = accin_ref[:]

    eps2 = meta_ref[0]
    sigma = meta_ref[1]
    rcut2 = meta_ref[2]
    xi = iblk_ref[:, 0:1]                    # (BLK, 1)
    yi = iblk_ref[:, 1:2]
    zi = iblk_ref[:, 2:3]
    xj = jblk_ref[0:1, :]                    # (1, BLK)
    yj = jblk_ref[1:2, :]
    zj = jblk_ref[2:3, :]
    mj = jblk_ref[3:4, :]
    dx = xj - xi                             # (BLK, BLK)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    inv = jax.lax.rsqrt(r2 + eps2)
    s_full = inv * inv * inv
    s = jnp.where(r2 < rcut2, s_full - _s_lr_kernel(r2, sigma), 0.0) * mj
    out_ref[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
    out_ref[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
    out_ref[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("grid", "capacity", "pair_budget", "interpret", "blk"),
)
def p3m_short_range_pallas(pos, softening, *, grid: int = 64,
                           capacity: int = 128, pair_budget: int,
                           interpret: bool = False, blk: int | None = None):
    """(N, 4) -> ((N, 3) short-range accelerations, overflow, pair_count).

    Same physics as the XLA short-range pass (erf split at sigma =
    SIGMA_CELLS mesh cells, truncation at RCUT_SIGMAS sigmas), laid out as
    block-sparse (blk, blk) Pallas pair tiles (blk=None -> derived from
    capacity via p3m_kernel_blk, matching the p3m_pair_count probe).
    ``pair_count`` must be checked <= pair_budget by the caller — excess
    pairs are silently dropped (probe with p3m_pair_count; BodySystem
    re-probes per state-set).
    """
    if blk is None:
        blk = p3m_kernel_blk(capacity)
    acc, overflow, pair_count, _ = _short_range_pallas_impl(
        pos, softening, grid=grid, capacity=capacity,
        pair_budget=pair_budget, interpret=interpret, blk=blk)
    return acc, overflow, pair_count


def _short_range_pallas_impl(pos, softening, *, grid, capacity, pair_budget,
                             interpret, blk, chunk_lo=None,
                             nchunk_local=None):
    """Shared core: builds the pair tables and runs the chunk scan over
    [chunk_lo, chunk_lo + nchunk_local) (defaults: the whole worklist).

    The sharded step passes each device's chunk range: an i-block whose
    pair run straddles a range boundary starts from ZERO on the next
    device (the chunk-boundary init==2 load reads the zero-initialized
    carry), so the per-device results are PARTIAL sums that the caller's
    (N, 3) psum completes — no cross-device carry needed.
    """
    f32 = jnp.float32
    n = pos.shape[0]
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    lo, h = _fit_box(pos3, grid)
    sigma = f32(SIGMA_CELLS) * h
    rcut = f32(RCUT_SIGMAS) * sigma
    gc = _cell_grid_size(grid)

    pair_budget = -(-pair_budget // PAIR_CHUNK) * PAIR_CHUNK
    (padded, padded_t, ib, jb, newi, body_row, order,
     pair_count, overflow) = _build_pair_tables(
        pos3, mass, lo, rcut, gc, capacity, pair_budget, blk)
    mb1 = padded.shape[0] // blk             # blocks incl. the inert one

    meta = jnp.stack([jnp.asarray(softening, f32) ** 2, sigma, rcut * rcut])

    # init codes: 1 = zero (new i-block), 2 = load carried partial (chunk
    # boundary inside an i-block run), 0 = accumulator already in VMEM
    chunk_start = (jnp.arange(pair_budget, dtype=jnp.int32)
                   % PAIR_CHUNK) == 0
    init = jnp.where(newi == 1, 1, jnp.where(chunk_start, 2, 0)).astype(
        jnp.int32)
    nchunk = pair_budget // PAIR_CHUNK

    io_spec = pl.BlockSpec((blk, 4),
                           lambda p, meta, ib, jb, init: (ib[p], 0))
    call = pl.pallas_call(
        _sr_pair_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(PAIR_CHUNK,),
            in_specs=[
                pl.BlockSpec((blk, 4),
                             lambda p, meta, ib, jb, init: (ib[p], 0)),
                pl.BlockSpec((4, blk),
                             lambda p, meta, ib, jb, init: (0, jb[p])),
                io_spec,
            ],
            out_specs=io_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((mb1 * blk, 4), f32),
        # acc carry aliased into the output so blocks untouched by a chunk
        # persist (flattened operand index incl. the 4 prefetch args)
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * PAIR_CHUNK * blk * blk,
            bytes_accessed=PAIR_CHUNK * (3 * blk * 4 * 4),
            transcendentals=2 * PAIR_CHUNK * blk * blk,
        ),
        interpret=interpret,
    )

    ib2 = ib.reshape(nchunk, PAIR_CHUNK)
    jb2 = jb.reshape(nchunk, PAIR_CHUNK)
    init2 = init.reshape(nchunk, PAIR_CHUNK)
    if chunk_lo is not None:
        sl = functools.partial(jax.lax.dynamic_slice_in_dim,
                               start_index=chunk_lo, slice_size=nchunk_local,
                               axis=0)
        ib2, jb2, init2 = sl(ib2), sl(jb2), sl(init2)

    def chunk_body(acc, args):
        ibc, jbc, initc = args
        return call(meta, ibc, jbc, initc, padded, padded_t, acc), None

    acc0 = jnp.zeros((mb1 * blk, 4), f32)
    acc_pad, _ = jax.lax.scan(chunk_body, acc0, (ib2, jb2, init2))

    # padded rows -> sorted bodies -> original order
    acc_sorted = jnp.where(
        (body_row < mb1 * blk)[:, None],
        acc_pad[jnp.minimum(body_row, mb1 * blk - 1), :3], 0.0)
    acc = jnp.zeros((n, 3), f32).at[order].set(acc_sorted)
    return acc, overflow, pair_count, pair_budget
