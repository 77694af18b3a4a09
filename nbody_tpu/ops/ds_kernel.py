"""Double-single ("ds") precision N-body kernel: fp64-class forces from
pairs of float32s on the VPU.

Why: genuine fp64 on TPU v5e is software-emulated through XLA and runs the
all-pairs force at 0.32 G interactions/s (851 ms/step at N=16384 —
PARITY.md). The classic alternative — each value carried as an unevaluated
sum hi + lo of two float32s (~49-bit significand) — runs every operation
on the fp32 VPU at a fixed op-count multiple, giving fp64-GRADE accuracy
at a double-digit multiple of the emulated-f64 speed. SURVEY.md §7 ("Hard
parts") explicitly plans this mode for the accuracy-anchor configs.

Arithmetic (error-free transformations, all plain jnp ops so the same
code runs under Mosaic and in interpret mode):

  * two_sum (Knuth): exact a+b -> (s, err), 6 flops, no branch.
  * split (Dekker): exact f32 -> hi+lo halves via the 2^12+1 trick.
  * two_prod (Dekker): exact a*b -> (p, err) via split, 17 flops (no
    hardware-fma primitive is exposed through jnp; Dekker is branchless
    and exact for |a|,|b| < 2^115).
  * ds_add / ds_mul: double-single +, x (Dekker/Bailey renormalized).
  * ds_rsqrt: f32 rsqrt seed + one ds Newton step (y(3 - x y^2)/2):
    doubles the seed's ~24 accurate bits to the full ds ~49.

The force kernel mirrors the vpu layout (i-tile resident, j-tiles
streamed 128 lanes at a time; hi and lo planes of the transposed j-set)
with hi/lo accumulators, and fuses the same damped semi-implicit Euler
update in ds arithmetic. The reference's QA criterion for the fp64 path
(energy-drift equality with the fp64 oracle) is the acceptance test
(/root/reference/src/nbody/compute_cuda.cpp:294-333 extended per
SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.pallas_kernel import LANES, _ix, _round_up

_SPLITTER = 4097.0  # 2^12 + 1 (Dekker split constant; Python
# float so kernels do not capture a device array)


# ---- error-free transformations (element-wise, any shape) ----

# Error-free transformations assume every op ROUNDS to f32. Under jit,
# XLA:CPU rematerializes products/sums inside fusions and lets LLVM
# contract `a*b + c` into fma — e.g. quick_two_sum's s = p + e became
# fma(xh, xh, e), so s no longer derives from the ROUNDED p and the error
# identity err = b - (s - a) collapses (measured: ds_mul(A, A) degrades
# 1.3e-14 -> 5.8e-8 relative, hi AND lo both off; the optimized HLO shows
# the recomputed multiply feeding the add). Guarding the rounded anchor
# values (s, and the split's c) with jax.lax.optimization_barrier pins
# them as materialized f32 values; the barrier is free at runtime.


# Mosaic has no lowering for optimization_barrier, so anchors are active
# only outside compiled-kernel tracing (the XLA/interpret path, where the
# LLVM contraction hazard lives). Whether Mosaic's own codegen contracts
# inconsistently is measured directly on hardware
# (scripts/tpu_ds_validate.py) — the accuracy numbers ARE the test.
_ANCHORS = True


def _anchor(v):
    if not _ANCHORS:
        return v
    return jax.lax.optimization_barrier(v)


def _two_sum(a, b):
    s = _anchor(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Exact a+b assuming |a| >= |b|."""
    s = _anchor(a + b)
    err = b - (s - a)
    return s, err


def _split(a):
    c = _anchor(_SPLITTER * a)
    hi = _anchor(c - (c - a))
    return hi, a - hi


def _two_prod(a, b):
    p = _anchor(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---- double-single arithmetic on (hi, lo) pairs ----

def ds_add(x, y):
    xh, xl = x
    yh, yl = y
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    return _quick_two_sum(s, e)


def ds_sub(x, y):
    yh, yl = y
    return ds_add(x, (-yh, -yl))


def ds_mul(x, y):
    xh, xl = x
    yh, yl = y
    p, e = _two_prod(xh, yh)
    e = e + xh * yl + xl * yh
    return _quick_two_sum(p, e)


def ds_mul_f32(x, c):
    """ds * plain-f32 scalar/array."""
    xh, xl = x
    p, e = _two_prod(xh, c)
    e = e + xl * c
    return _quick_two_sum(p, e)


def ds_rsqrt(x):
    """Double-single 1/sqrt(x): f32 rsqrt seed + one ds Newton step.

    y1 = y0 * (3 - x*y0^2) / 2 doubles the accurate bits (~24 -> ~48);
    the step is evaluated in ds so the correction itself is not truncated.
    """
    xh, xl = x
    y0 = jax.lax.rsqrt(xh)  # ~24-bit seed
    # CRITICAL: hide the seed's provenance from XLA's algebraic
    # simplifier. Without the barrier, jit rewrites rsqrt(x)*rsqrt(x)
    # -> 1/x inside the Newton step, making t == 1 exactly and the whole
    # refinement a no-op (measured: jit error 6e-8 = the raw seed, eager
    # 5e-15). The barrier costs nothing at runtime.
    y0 = _anchor(y0)
    y0ds = (y0, jnp.zeros_like(y0))
    t = ds_mul(x, ds_mul(y0ds, y0ds))            # x*y0^2 ~= 1
    three = (jnp.float32(3.0), jnp.float32(0.0))
    corr = ds_sub(three, t)                      # 3 - x*y0^2
    y1 = ds_mul_f32(ds_mul(y0ds, corr), jnp.float32(0.5))
    return y1


def ds_from_f64(arr64):
    """NumPy/JAX float64 array -> (hi, lo) float32 pair (exact to ds)."""
    import numpy as np

    a = np.asarray(arr64, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def ds_to_f64(hi, lo):
    import numpy as np

    return (np.asarray(hi, np.float64) + np.asarray(lo, np.float64))


def reduce_ds_lanes(ah_ref, al_ref):
    """Cross-lane reduction IN ds of a (rows, LANES) hi/lo accumulator
    pair -> (rows, 1): a plain f32 sum of the hi plane would reintroduce
    ~1e-7-relative summation error — the exact thing the ds kernels exist
    to avoid. Pairwise tree of ds_adds (log2 levels). Pure jnp on the
    loaded values, so every kernel's finalize can share it."""
    acc = (ah_ref[:, :], al_ref[:, :])
    width = acc[0].shape[1]
    while width > 1:
        half = width // 2
        acc = ds_add((acc[0][:, :half], acc[1][:, :half]),
                     (acc[0][:, half:width], acc[1][:, half:width]))
        width = half
    return acc


# ---- the fused ds force + integrate kernel ----

def _ds_accumulate_tile(pihi_ref, pilo_ref, pthi_ref, ptlo_ref, eps2,
                        axh, axl, ayh, ayl, azh, azl, tile_j):
    """ds partial forces for one (TILE_I, TILE_J) block of pairs."""

    def col(ref_h, ref_l, c):
        return (ref_h[:, c:c + 1], ref_l[:, c:c + 1])  # (TILE_I, 1)

    xi = col(pihi_ref, pilo_ref, 0)
    yi = col(pihi_ref, pilo_ref, 1)
    zi = col(pihi_ref, pilo_ref, 2)
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)

        def row(r):
            return (pthi_ref[r:r + 1, sl], ptlo_ref[r:r + 1, sl])  # (1, 128)

        dx = ds_sub(row(0), xi)
        dy = ds_sub(row(1), yi)
        dz = ds_sub(row(2), zi)
        r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                    ds_add(ds_mul(dz, dz), eps2))
        inv = ds_rsqrt(r2)
        inv3 = ds_mul(ds_mul(inv, inv), inv)
        s = ds_mul(row(3), inv3)  # m_j / r^3 (masses are exact in hi)

        for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                            ((azh, azl), dz)):
            acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
            ah[:, :] = acc[0]
            al[:, :] = acc[1]


def _ds_step_kernel(scal_ref, pihi_ref, pilo_ref, vihi_ref, vilo_ref,
                    pthi_ref, ptlo_ref,
                    nph_ref, npl_ref, nvh_ref, nvl_ref,
                    axh, axl, ayh, ayl, azh, azl, *, tile_j: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl):
            r[:, :] = zeros

    eps2 = (scal_ref[0, 1], scal_ref[1, 1])
    _ds_accumulate_tile(pihi_ref, pilo_ref, pthi_ref, ptlo_ref, eps2,
                        axh, axl, ayh, ayl, azh, azl, tile_j)

    @pl.when(j == nj - 1)
    def _finalize():
        dt = (scal_ref[0, 0], scal_ref[1, 0])
        damping = (scal_ref[0, 2], scal_ref[1, 2])

        acc = (reduce_ds_lanes(axh, axl), reduce_ds_lanes(ayh, ayl), reduce_ds_lanes(azh, azl))
        for c in range(3):
            vc = (vihi_ref[:, c:c + 1], vilo_ref[:, c:c + 1])
            vnew = ds_mul(ds_add(vc, ds_mul(acc[c], dt)), damping)
            nvh_ref[:, c:c + 1] = vnew[0]
            nvl_ref[:, c:c + 1] = vnew[1]
            pc = (pihi_ref[:, c:c + 1], pilo_ref[:, c:c + 1])
            pnew = ds_add(pc, ds_mul(vnew, dt))
            nph_ref[:, c:c + 1] = pnew[0]
            npl_ref[:, c:c + 1] = pnew[1]
        nph_ref[:, 3:4] = pihi_ref[:, 3:4]
        npl_ref[:, 3:4] = pilo_ref[:, 3:4]
        nvh_ref[:, 3:4] = vihi_ref[:, 3:4]
        nvl_ref[:, 3:4] = vilo_ref[:, 3:4]


# ds kernels carry ~20x the f32 op count per interaction, so the compile-
# size-limited j-tile is much smaller than the vpu kernel's 32768.
# r3 sweep at N=16384 (G int/s): tj 1024/2048/4096/8192 = 15.2/15.4/
# 15.7/15.3, ti 32/64/128 = 15.0/15.7/11.4 -> (64, 4096)
DS_TILE_I = 64
DS_TILE_J = 4096


def _scal_ds(dt, softening, damping):
    """(2, 4) SMEM block: row 0 = hi, row 1 = lo of [dt, eps^2, damping]."""
    import numpy as np

    vals = np.zeros((2, 4), np.float32)
    for c, v in enumerate((dt, float(softening) ** 2, damping)):
        hi = np.float32(v)
        vals[0, c] = hi
        vals[1, c] = np.float32(np.float64(v) - np.float64(hi))
    return jnp.asarray(vals)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_pallas_ds(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                         *, tile_i: int = DS_TILE_I,
                         tile_j: int | None = None,
                         interpret: bool = False):
    """One fused double-single step (self-vs-self).

    pos/vel are (N, 4) float32 hi/lo pairs (AoS [x,y,z,m]); `scal` is the
    (2, 4) hi/lo parameter block from `_scal_ds(dt, softening, damping)`
    (built on the host so the f64->ds split is exact). Returns the four
    updated arrays. Self pair contributes zero exactly as in the f32
    kernel (softened r^2 > 0)."""
    return nbody_step_pallas_ds_vs(pos_hi, pos_lo, vel_hi, vel_lo,
                                   pos_hi, pos_lo, scal, tile_i=tile_i,
                                   tile_j=tile_j, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_pallas_ds_vs(pos_hi, pos_lo, vel_hi, vel_lo,
                            jpos_hi, jpos_lo, scal,
                            *, tile_i: int = DS_TILE_I,
                            tile_j: int | None = None,
                            interpret: bool = False):
    """ds step of the i-set under forces from the j-set — the same
    i-vs-j form every other kernel family exposes, so the body-sharded
    strategies compose with it (the sharded step passes the local shard
    as i and the all-gathered global positions as j)."""
    n = pos_hi.shape[0]
    tile_i = min(tile_i, _round_up(n, 8))
    if tile_j is None:
        tile_j = DS_TILE_J
    tile_j = min(tile_j, _round_up(jpos_hi.shape[0], LANES))

    def pad(a, m):
        p = _round_up(a.shape[0], m)
        return jnp.pad(a, ((0, p - a.shape[0]), (0, 0))) if p != a.shape[0] else a

    ph, plo = pad(pos_hi, tile_i), pad(pos_lo, tile_i)
    vh, vlo = pad(vel_hi, tile_i), pad(vel_lo, tile_i)
    jh = pad(jpos_hi, tile_j).T
    jl = pad(jpos_lo, tile_j).T
    m_pad, n_pad = ph.shape[0], jh.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)

    smem = pl.BlockSpec((2, 4), lambda i, j: _ix(0, 0),
                        memory_space=pltpu.SMEM)
    i_tile = pl.BlockSpec((tile_i, 4), lambda i, j: _ix(i, 0),
                          memory_space=pltpu.VMEM)
    j_tile = pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m_pad, 4), jnp.float32)] * 4
    scratch = [pltpu.VMEM((tile_i, LANES), jnp.float32) for _ in range(6)]

    def kernel_entry(*args):
        # compiled (Mosaic) tracing must not emit barrier primitives
        global _ANCHORS
        prev = _ANCHORS
        _ANCHORS = bool(interpret)
        try:
            return _ds_step_kernel(*args, tile_j=tile_j)
        finally:
            _ANCHORS = prev

    nph, npl, nvh, nvl = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[smem, i_tile, i_tile, i_tile, i_tile, j_tile, j_tile],
        out_specs=[i_tile] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=400 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 6) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(scal, ph, plo, vh, vlo, jh, jl)
    return nph[:n], npl[:n], nvh[:n], nvl[:n]


def _ds_accel_kernel(scal_ref, pihi_ref, pilo_ref, pthi_ref, ptlo_ref,
                     ah_ref, al_ref,
                     axh, axl, ayh, ayl, azh, azl, *, tile_j: int):
    """Accel-ONLY variant of `_ds_step_kernel`: same pair arithmetic, but
    the finalize emits the lane-reduced ds acceleration instead of
    integrating. This is the building block the ring strategy needs —
    partial forces from a rotating j-shard must accumulate ACROSS kernel
    calls (one per ppermute hop), so integration happens once at the XLA
    level after the last hop (`_ds_integrate` / `ds_leapfrog_finish`)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl):
            r[:, :] = zeros

    eps2 = (scal_ref[0, 1], scal_ref[1, 1])
    _ds_accumulate_tile(pihi_ref, pilo_ref, pthi_ref, ptlo_ref, eps2,
                        axh, axl, ayh, ayl, azh, azl, tile_j)

    @pl.when(j == nj - 1)
    def _finalize():
        acc = (reduce_ds_lanes(axh, axl), reduce_ds_lanes(ayh, ayl),
               reduce_ds_lanes(azh, azl))
        for c in range(3):
            ah_ref[:, c:c + 1] = acc[c][0]
            al_ref[:, c:c + 1] = acc[c][1]
        ah_ref[:, 3:4] = jnp.zeros_like(ah_ref[:, 3:4])
        al_ref[:, 3:4] = jnp.zeros_like(al_ref[:, 3:4])


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_pallas_ds(pos_hi, pos_lo, jpos_hi, jpos_lo, scal,
                            *, tile_i: int = DS_TILE_I,
                            tile_j: int | None = None,
                            interpret: bool = False):
    """(acc_hi, acc_lo), each (N, 3): ds accelerations of the i-set under
    the j-set. Same per-pair arithmetic as the fused `_ds_step_kernel`
    (results agree to the last ds bit for the same j-set); `scal` is any
    (2, >=2) hi/lo block with eps² in column 1."""
    n = pos_hi.shape[0]
    tile_i = min(tile_i, _round_up(n, 8))
    if tile_j is None:
        tile_j = DS_TILE_J
    tile_j = min(tile_j, _round_up(jpos_hi.shape[0], LANES))

    def pad(a, m):
        p = _round_up(a.shape[0], m)
        return jnp.pad(a, ((0, p - a.shape[0]), (0, 0))) if p != a.shape[0] else a

    ph, plo = pad(pos_hi, tile_i), pad(pos_lo, tile_i)
    jh = pad(jpos_hi, tile_j).T
    jl = pad(jpos_lo, tile_j).T
    m_pad, n_pad = ph.shape[0], jh.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)

    smem = pl.BlockSpec(scal.shape, lambda i, j: _ix(0, 0),
                        memory_space=pltpu.SMEM)
    i_tile = pl.BlockSpec((tile_i, 4), lambda i, j: _ix(i, 0),
                          memory_space=pltpu.VMEM)
    j_tile = pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m_pad, 4), jnp.float32)] * 2
    scratch = [pltpu.VMEM((tile_i, LANES), jnp.float32) for _ in range(6)]

    def kernel_entry(*args):
        # compiled (Mosaic) tracing must not emit barrier primitives
        global _ANCHORS
        prev = _ANCHORS
        _ANCHORS = bool(interpret)
        try:
            return _ds_accel_kernel(*args, tile_j=tile_j)
        finally:
            _ANCHORS = prev

    ah, al = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[smem, i_tile, i_tile, j_tile, j_tile],
        out_specs=[i_tile] * 2,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=380 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 4) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(scal, ph, plo, jh, jl)
    return ah[:n, :3], al[:n, :3]


def ds_half_drift(pos_hi, pos_lo, vel_hi, vel_lo, scal):
    """XLA-level ds half-drift: pos + vel·(dt/2) on the coordinate
    columns, mass column carried through. `scal` from `_scal_ds_leapfrog`
    (dt/2 hi/lo in column 3). The op sequence is identical to the fused
    DKD kernel's in-kernel drift (`_ds_leapfrog_kernel`), so the values
    match bit-for-bit — the ring strategy drifts every shard ONCE here
    and rotates the drifted planes instead of re-drifting per chunk."""
    dt_half = (scal[0, 3], scal[1, 3])
    cols_h, cols_l = [], []
    for c in range(3):
        pc = ds_add((pos_hi[:, c], pos_lo[:, c]),
                    ds_mul((vel_hi[:, c], vel_lo[:, c]), dt_half))
        cols_h.append(pc[0])
        cols_l.append(pc[1])
    cols_h.append(pos_hi[:, 3])
    cols_l.append(pos_lo[:, 3])
    return jnp.stack(cols_h, axis=1), jnp.stack(cols_l, axis=1)


def ds_leapfrog_finish(half_hi, half_lo, vel_hi, vel_lo, acc, scal):
    """Kick + second half-drift of the DKD step in anchored XLA-level ds,
    mirroring `_ds_leapfrog_kernel`'s finalize exactly: v' = (v + a·dt)·
    damping, p' = p_half + v'·(dt/2). `acc` = (acc_hi, acc_lo), each
    (N, 3) at the half-step positions."""
    return _ds_kick_drift(half_hi, half_lo, vel_hi, vel_lo, acc,
                          dt=(scal[0, 0], scal[1, 0]),
                          damping=(scal[0, 2], scal[1, 2]),
                          dt_pos=(scal[0, 3], scal[1, 3]))


def nbody_step_ds(pos64, vel64, dt, softening, damping,
                  *, tile_i: int = DS_TILE_I, tile_j: int = DS_TILE_J,
                  interpret: bool = False):
    """Convenience wrapper: float64 state in, float64 state out (one step).

    For rollouts, split once with `ds_from_f64`, scan
    `nbody_step_pallas_ds`, and recombine with `ds_to_f64` — the split is
    exact, so chaining wrappers loses nothing either."""
    ph, plo = ds_from_f64(pos64)
    vh, vlo = ds_from_f64(vel64)
    scal = _scal_ds(dt, softening, damping)
    nph, npl, nvh, nvl = nbody_step_pallas_ds(
        ph, plo, vh, vlo, scal, tile_i=tile_i, tile_j=tile_j,
        interpret=interpret)
    return ds_to_f64(nph, npl), ds_to_f64(nvh, nvl)


@functools.partial(jax.jit,
                   static_argnames=("steps", "tile_i", "tile_j", "interpret",
                                    "integrator", "sym", "block_cap"),
                   donate_argnums=(0, 1, 2, 3))
def rollout_pallas_ds(pos_hi, pos_lo, vel_hi, vel_lo, scal, *, steps: int,
                      tile_i: int = DS_TILE_I, tile_j: int | None = None,
                      interpret: bool = False, integrator: str = "euler",
                      sym: bool = False, block_cap: int | None = None):
    """`steps` ds steps under one compiled lax.scan (donated hi/lo buffers).
    integrator="leapfrog" scans the fused DKD step (scal from
    _scal_ds_leapfrog); "hermite" scans the two-dispatch P(EC) step
    (scal from _scal_ds_hermite)."""
    if sym and integrator == "hermite":
        # any-N like the euler branch below; the blocked accel+jerk
        # composition takes over above the cap (None = production
        # DS_AJ_SYM_MAX_N, resolved inside the step)
        step_fn = functools.partial(nbody_step_pallas_ds_hermite, sym=True,
                                    block_cap=block_cap)
    elif sym and integrator == "euler":
        # any-N: delegates to the single triangle below the cap, the
        # blockwise composition above it. The cap is a STATIC jit arg of
        # this rollout (None = the production DS_SYM_MAX_N) so a changed
        # cap can never reuse a stale compiled rollout.
        step_fn = functools.partial(
            nbody_step_pallas_ds_sym_blocked,
            block_cap=DS_SYM_MAX_N if block_cap is None else block_cap)
    elif sym:
        raise ValueError("sym=True applies to the euler/hermite ds steps")
    else:
        step_fn = {"euler": nbody_step_pallas_ds,
                   "leapfrog": nbody_step_pallas_ds_leapfrog,
                   "hermite": nbody_step_pallas_ds_hermite}[integrator]

    def body(state, _):
        return step_fn(*state, scal, tile_i=tile_i,
                       tile_j=tile_j, interpret=interpret), None

    state, _ = jax.lax.scan(body, (pos_hi, pos_lo, vel_hi, vel_lo), None,
                            length=steps)
    return state


def rollout_ds(pos64, vel64, dt, softening, damping, *, steps: int,
               tile_i: int = DS_TILE_I, tile_j: int = DS_TILE_J,
               interpret: bool = False, segment: int | None = None):
    """float64 in/out ds rollout: split once, scan in work-bounded
    compiled chunks (the attached worker kills multi-minute dispatches —
    see BodySystem._segment_steps), recombine once."""
    n = pos64.shape[0]
    if segment is None:
        # ~4e11 pair-interactions per dispatch keeps ds segments well
        # under the observed ~90 s dispatch-kill threshold
        segment = max(1, min(1000, int(4e11 / max(float(n) ** 2, 1.0))))
    ph, plo = ds_from_f64(pos64)
    vh, vlo = ds_from_f64(vel64)
    scal = _scal_ds(dt, softening, damping)
    done = 0
    while done < steps:
        seg = min(steps - done, segment)
        ph, plo, vh, vlo = rollout_pallas_ds(
            ph, plo, vh, vlo, scal, steps=seg, tile_i=tile_i, tile_j=tile_j,
            interpret=interpret)
        done += seg
    return ds_to_f64(ph, plo), ds_to_f64(vh, vlo)


# ---- fused ds leapfrog (symplectic DKD) ----

def _ds_leapfrog_kernel(scal_ref, pihi_ref, pilo_ref, vihi_ref, vilo_ref,
                        pthi_ref, ptlo_ref, vthi_ref, vtlo_ref,
                        nph_ref, npl_ref, nvh_ref, nvl_ref,
                        axh, axl, ayh, ayl, azh, azl, *, tile_j: int):
    """One fused drift-kick-drift step in ds arithmetic.

    The force must be evaluated at the HALF-step positions on BOTH sides
    of the pair, so the j-stream carries velocities too (like the hermite
    kernel) and each chunk half-drifts its j-columns in-kernel — ~6 ds
    ops per j-element per i-block visit, negligible against the ~30 ds
    ops per interaction. The i-tile half-drifts once per grid row."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl):
            r[:, :] = zeros

    eps2 = (scal_ref[0, 1], scal_ref[1, 1])
    dt_half = (scal_ref[0, 3], scal_ref[1, 3])

    def icol(h_ref, l_ref, c):
        return (h_ref[:, c:c + 1], l_ref[:, c:c + 1])

    # i-side half-drift (recomputed per grid step; 9 ds ops on (TILE_I, 1))
    xi = ds_add(icol(pihi_ref, pilo_ref, 0),
                ds_mul(icol(vihi_ref, vilo_ref, 0), dt_half))
    yi = ds_add(icol(pihi_ref, pilo_ref, 1),
                ds_mul(icol(vihi_ref, vilo_ref, 1), dt_half))
    zi = ds_add(icol(pihi_ref, pilo_ref, 2),
                ds_mul(icol(vihi_ref, vilo_ref, 2), dt_half))

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)

        def jrow(h_ref, l_ref, r):
            return (h_ref[r:r + 1, sl], l_ref[r:r + 1, sl])

        # j-side half-drift per chunk
        xj = ds_add(jrow(pthi_ref, ptlo_ref, 0),
                    ds_mul(jrow(vthi_ref, vtlo_ref, 0), dt_half))
        yj = ds_add(jrow(pthi_ref, ptlo_ref, 1),
                    ds_mul(jrow(vthi_ref, vtlo_ref, 1), dt_half))
        zj = ds_add(jrow(pthi_ref, ptlo_ref, 2),
                    ds_mul(jrow(vthi_ref, vtlo_ref, 2), dt_half))
        dx = ds_sub(xj, xi)
        dy = ds_sub(yj, yi)
        dz = ds_sub(zj, zi)
        r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                    ds_add(ds_mul(dz, dz), eps2))
        inv = ds_rsqrt(r2)
        inv3 = ds_mul(ds_mul(inv, inv), inv)
        s = ds_mul(jrow(pthi_ref, ptlo_ref, 3), inv3)

        for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                            ((azh, azl), dz)):
            acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
            ah[:, :] = acc[0]
            al[:, :] = acc[1]

    @pl.when(j == nj - 1)
    def _finalize():
        dt = (scal_ref[0, 0], scal_ref[1, 0])
        damping = (scal_ref[0, 2], scal_ref[1, 2])

        acc = (reduce_ds_lanes(axh, axl), reduce_ds_lanes(ayh, ayl), reduce_ds_lanes(azh, azl))
        halves = (xi, yi, zi)
        for c in range(3):
            vc = (vihi_ref[:, c:c + 1], vilo_ref[:, c:c + 1])
            vnew = ds_mul(ds_add(vc, ds_mul(acc[c], dt)), damping)
            nvh_ref[:, c:c + 1] = vnew[0]
            nvl_ref[:, c:c + 1] = vnew[1]
            pnew = ds_add(halves[c], ds_mul(vnew, dt_half))
            nph_ref[:, c:c + 1] = pnew[0]
            npl_ref[:, c:c + 1] = pnew[1]
        nph_ref[:, 3:4] = pihi_ref[:, 3:4]
        npl_ref[:, 3:4] = pilo_ref[:, 3:4]
        nvh_ref[:, 3:4] = vihi_ref[:, 3:4]
        nvl_ref[:, 3:4] = vilo_ref[:, 3:4]


def _scal_ds_leapfrog(dt, softening, damping):
    """(2, 4) hi/lo block: [dt, eps^2, damping, dt/2]."""
    import numpy as np

    vals = np.zeros((2, 4), np.float32)
    for c, v in enumerate((dt, float(softening) ** 2, damping,
                           float(dt) / 2.0)):
        hi = np.float32(v)
        vals[0, c] = hi
        vals[1, c] = np.float32(np.float64(v) - np.float64(hi))
    return jnp.asarray(vals)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_pallas_ds_leapfrog(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                                  *, tile_i: int = DS_TILE_I,
                                  tile_j: int | None = None,
                                  interpret: bool = False):
    """One fused ds drift-kick-drift step (self-vs-self). `scal` from
    `_scal_ds_leapfrog`. Symplectic: bounded energy drift on long
    horizons, at ds (fp64-grade) force accuracy."""
    return nbody_step_pallas_ds_leapfrog_vs(
        pos_hi, pos_lo, vel_hi, vel_lo, pos_hi, pos_lo, vel_hi, vel_lo,
        scal, tile_i=tile_i, tile_j=tile_j, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_pallas_ds_leapfrog_vs(pos_hi, pos_lo, vel_hi, vel_lo,
                                     jpos_hi, jpos_lo, jvel_hi, jvel_lo,
                                     scal, *, tile_i: int = DS_TILE_I,
                                     tile_j: int | None = None,
                                     interpret: bool = False):
    """Fused ds DKD step of the i-set under forces from the j-set — the
    i-vs-j form the body-sharded strategies compose with. The kernel
    half-drifts BOTH sides from start-of-step state in-kernel, so a
    sharded step that all-gathers (jpos, jvel) at step start runs the
    same per-shard arithmetic as the single-device step (exact under
    Mosaic; the CPU interpret path carries the module's FMA-contraction
    caveat, ~1e-9)."""
    n = pos_hi.shape[0]
    tile_i = min(tile_i, _round_up(n, 8))
    if tile_j is None:
        tile_j = DS_TILE_J
    tile_j = min(tile_j, _round_up(jpos_hi.shape[0], LANES))

    def pad(a, m):
        p = _round_up(a.shape[0], m)
        return jnp.pad(a, ((0, p - a.shape[0]), (0, 0))) if p != a.shape[0] else a

    ph, plo = pad(pos_hi, tile_i), pad(pos_lo, tile_i)
    vh, vlo = pad(vel_hi, tile_i), pad(vel_lo, tile_i)
    jh = pad(jpos_hi, tile_j).T
    jl = pad(jpos_lo, tile_j).T
    jvh = pad(jvel_hi, tile_j).T
    jvl = pad(jvel_lo, tile_j).T
    m_pad, n_pad = ph.shape[0], jh.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)

    smem = pl.BlockSpec((2, 4), lambda i, j: _ix(0, 0),
                        memory_space=pltpu.SMEM)
    i_tile = pl.BlockSpec((tile_i, 4), lambda i, j: _ix(i, 0),
                          memory_space=pltpu.VMEM)
    j_tile = pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m_pad, 4), jnp.float32)] * 4
    scratch = [pltpu.VMEM((tile_i, LANES), jnp.float32) for _ in range(6)]

    def kernel_entry(*args):
        global _ANCHORS
        prev = _ANCHORS
        _ANCHORS = bool(interpret)
        try:
            return _ds_leapfrog_kernel(*args, tile_j=tile_j)
        finally:
            _ANCHORS = prev

    nph, npl, nvh, nvl = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[smem] + [i_tile] * 4 + [j_tile] * 4,
        out_specs=[i_tile] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=450 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 10) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(scal, ph, plo, vh, vlo, jh, jl, jvh, jvl)
    return nph[:n], npl[:n], nvh[:n], nvl[:n]


# ---- ds Hermite (4th-order predictor-corrector) ----

def _ds_accel_jerk_kernel(scal_ref, pihi_ref, pilo_ref, vihi_ref, vilo_ref,
                          pthi_ref, ptlo_ref, vthi_ref, vtlo_ref,
                          ah_ref, al_ref, jh_ref, jl_ref,
                          axh, axl, ayh, ayl, azh, azl,
                          gxh, gxl, gyh, gyl, gzh, gzl, *, tile_j: int):
    """ds acceleration AND jerk on the i-tile due to the streamed j-set.

    jerk = sum_j m_j [ dv/r^3 - 3 (dr.dv) dr/r^5 ]  (softened r^2; the
    fp32 analogue is pallas_kernel._accel_jerk_kernel, the formulation
    ops/reference.py::_accel_jerk_rows). ~2x the ds ops of the force-only
    kernel: the extra inv2/rv/c3 chain plus three jerk accumulators."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl,
                  gxh, gxl, gyh, gyl, gzh, gzl):
            r[:, :] = zeros

    eps2 = (scal_ref[0, 1], scal_ref[1, 1])

    def icol(h_ref, l_ref, c):
        return (h_ref[:, c:c + 1], l_ref[:, c:c + 1])

    xi = icol(pihi_ref, pilo_ref, 0)
    yi = icol(pihi_ref, pilo_ref, 1)
    zi = icol(pihi_ref, pilo_ref, 2)
    vxi = icol(vihi_ref, vilo_ref, 0)
    vyi = icol(vihi_ref, vilo_ref, 1)
    vzi = icol(vihi_ref, vilo_ref, 2)

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)

        def jrow(h_ref, l_ref, r):
            return (h_ref[r:r + 1, sl], l_ref[r:r + 1, sl])

        dx = ds_sub(jrow(pthi_ref, ptlo_ref, 0), xi)
        dy = ds_sub(jrow(pthi_ref, ptlo_ref, 1), yi)
        dz = ds_sub(jrow(pthi_ref, ptlo_ref, 2), zi)
        dvx = ds_sub(jrow(vthi_ref, vtlo_ref, 0), vxi)
        dvy = ds_sub(jrow(vthi_ref, vtlo_ref, 1), vyi)
        dvz = ds_sub(jrow(vthi_ref, vtlo_ref, 2), vzi)
        r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                    ds_add(ds_mul(dz, dz), eps2))
        inv = ds_rsqrt(r2)
        inv2 = ds_mul(inv, inv)
        inv3 = ds_mul(inv2, inv)
        s = ds_mul(jrow(pthi_ref, ptlo_ref, 3), inv3)  # m_j / r^3
        rv = ds_add(ds_add(ds_mul(dx, dvx), ds_mul(dy, dvy)),
                    ds_mul(dz, dvz))
        c3 = ds_mul_f32(ds_mul(ds_mul(s, rv), inv2),
                        jnp.float32(3.0))  # 3 m_j (dr.dv) / r^5

        for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                            ((azh, azl), dz)):
            acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
            ah[:, :] = acc[0]
            al[:, :] = acc[1]
        for (gh, gl), dv, d in (((gxh, gxl), dvx, dx),
                                ((gyh, gyl), dvy, dy),
                                ((gzh, gzl), dvz, dz)):
            jrk = ds_add((gh[:, :], gl[:, :]),
                         ds_sub(ds_mul(s, dv), ds_mul(c3, d)))
            gh[:, :] = jrk[0]
            gl[:, :] = jrk[1]

    @pl.when(j == nj - 1)
    def _finalize():
        for c, (sh, slo) in enumerate(((axh, axl), (ayh, ayl), (azh, azl))):
            red = reduce_ds_lanes(sh, slo)
            ah_ref[:, c:c + 1] = red[0]
            al_ref[:, c:c + 1] = red[1]
        for c, (sh, slo) in enumerate(((gxh, gxl), (gyh, gyl), (gzh, gzl))):
            red = reduce_ds_lanes(sh, slo)
            jh_ref[:, c:c + 1] = red[0]
            jl_ref[:, c:c + 1] = red[1]
        zero = jnp.zeros_like(ah_ref[:, 3:4])
        ah_ref[:, 3:4] = zero
        al_ref[:, 3:4] = zero
        jh_ref[:, 3:4] = zero
        jl_ref[:, 3:4] = zero


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_jerk_pallas_ds(pos_hi, pos_lo, vel_hi, vel_lo,
                                 jpos_hi, jpos_lo, jvel_hi, jvel_lo,
                                 scal, *, tile_i: int = DS_TILE_I,
                                 tile_j: int | None = None,
                                 interpret: bool = False):
    """(acc_hi, acc_lo, jerk_hi, jerk_lo), each (N, 4) with column 3 zero,
    for the i-set under the j-set — the Hermite scheme's ds force
    evaluation in the i-vs-j form the sharded strategies compose with.
    `scal` is any (2, >=2) hi/lo block with eps^2 in column 1 (`_scal_ds`
    and `_scal_ds_hermite` both qualify)."""
    if tile_j is None:
        tile_j = DS_HERMITE_TILE_J
    n = pos_hi.shape[0]
    tile_i = min(tile_i, _round_up(n, 8))
    tile_j = min(tile_j, _round_up(jpos_hi.shape[0], LANES))

    def pad(a, m):
        p = _round_up(a.shape[0], m)
        return jnp.pad(a, ((0, p - a.shape[0]), (0, 0))) if p != a.shape[0] else a

    ph, plo = pad(pos_hi, tile_i), pad(pos_lo, tile_i)
    vh, vlo = pad(vel_hi, tile_i), pad(vel_lo, tile_i)
    jh = pad(jpos_hi, tile_j).T
    jl = pad(jpos_lo, tile_j).T
    jvh = pad(jvel_hi, tile_j).T
    jvl = pad(jvel_lo, tile_j).T
    m_pad, n_pad = ph.shape[0], jh.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)

    smem = pl.BlockSpec(scal.shape, lambda i, j: _ix(0, 0),
                        memory_space=pltpu.SMEM)
    i_tile = pl.BlockSpec((tile_i, 4), lambda i, j: _ix(i, 0),
                          memory_space=pltpu.VMEM)
    j_tile = pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m_pad, 4), jnp.float32)] * 4
    scratch = [pltpu.VMEM((tile_i, LANES), jnp.float32) for _ in range(12)]

    def kernel_entry(*args):
        global _ANCHORS
        prev = _ANCHORS
        _ANCHORS = bool(interpret)
        try:
            return _ds_accel_jerk_kernel(*args, tile_j=tile_j)
        finally:
            _ANCHORS = prev

    ah, al, jrh, jrl = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[smem] + [i_tile] * 4 + [j_tile] * 4,
        out_specs=[i_tile] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=800 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 10) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(scal, ph, plo, vh, vlo, jh, jl, jvh, jvl)
    return ah[:n], al[:n], jrh[:n], jrl[:n]


# the accel+jerk kernel carries ~2x the live ds intermediates of the
# force-only kernel (dv, rv, c3 chains + 12 accumulators): tile_j=4096
# exceeds the 16 MB scoped-vmem limit (measured: 23.7 MB requested).
# r3 on-chip sweep at N=16384: tj 1024 and 2048 both measure 71.2
# ms/step delta-timed (3.77 G int/s) — tile-insensitive in this range
DS_HERMITE_TILE_J = 2048


def _scal_ds_hermite(dt, softening, damping):
    """(2, 8) hi/lo block: [dt, eps^2, damping, dt/2, dt^2/2, dt^3/6,
    dt^2/12, 0] — every dt power computed in f64 on the host and split
    exactly, so the ds predictor/corrector polynomials see full-precision
    coefficients."""
    import numpy as np

    d = np.float64(dt)
    vals = np.zeros((2, 8), np.float32)
    for c, v in enumerate((d, np.float64(softening) ** 2,
                           np.float64(damping), d / 2.0, d * d / 2.0,
                           d * d * d / 6.0, d * d / 12.0)):
        hi = np.float32(v)
        vals[0, c] = hi
        vals[1, c] = np.float32(np.float64(v) - np.float64(hi))
    return jnp.asarray(vals)


def hermite_planes(hi, lo):
    """(N, 4) hi/lo AoS -> the (N, 3) coordinate planes as a ds pair."""
    return (hi[:, :3], lo[:, :3])


def hermite_assemble(vec, mass_hi, mass_lo):
    """ds (N, 3) planes + the carried mass column -> (N, 4) hi/lo AoS."""
    return (jnp.concatenate([vec[0], mass_hi], axis=1),
            jnp.concatenate([vec[1], mass_lo], axis=1))


def _hermite_sc(scal, c):
    return (scal[0, c], scal[1, c])


def hermite_predict(x0, v0, a0, j0, scal):
    """ds Hermite predictor: x_p = x + v dt + a0 dt^2/2 + j0 dt^3/6 and
    v_p = v + a0 dt + j0 dt^2/2, on ds (N, 3) plane pairs. `scal` from
    `_scal_ds_hermite` (exact f64-split dt powers). O(N) XLA-level ds
    arithmetic — anchors active (module docstring)."""
    dt = _hermite_sc(scal, 0)
    dt2_2, dt3_6 = _hermite_sc(scal, 4), _hermite_sc(scal, 5)
    xp = ds_add(ds_add(x0, ds_mul(v0, dt)),
                ds_add(ds_mul(a0, dt2_2), ds_mul(j0, dt3_6)))
    vp = ds_add(v0, ds_add(ds_mul(a0, dt), ds_mul(j0, dt2_2)))
    return xp, vp


def hermite_correct(x0, v0, a0, j0, a1, j1, scal):
    """ds Hermite corrector:
    v1 = (v + dt/2 (a0+a1) + dt^2/12 (j0-j1)) * damping,
    x1 = x + dt/2 (v+v1) + dt^2/12 (a0-a1). Returns (x1, v1)."""
    damping = _hermite_sc(scal, 2)
    dt_half, dt2_12 = _hermite_sc(scal, 3), _hermite_sc(scal, 6)
    v1 = ds_mul(ds_add(v0, ds_add(ds_mul(ds_add(a0, a1), dt_half),
                                  ds_mul(ds_sub(j0, j1), dt2_12))),
                damping)
    x1 = ds_add(x0, ds_add(ds_mul(ds_add(v0, v1), dt_half),
                           ds_mul(ds_sub(a0, a1), dt2_12)))
    return x1, v1


@functools.partial(jax.jit,
                   static_argnames=("tile_i", "tile_j", "interpret", "sym",
                                    "block_cap"))
def nbody_step_pallas_ds_hermite(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                                 *, tile_i: int = DS_TILE_I,
                                 tile_j: int | None = None,
                                 interpret: bool = False,
                                 sym: bool = False,
                                 block_cap: int | None = None):
    """One 4th-order Hermite P(EC) step in ds arithmetic (self-vs-self).

    Two ds accel+jerk kernel dispatches (start state, predicted state)
    around an O(N) ds predictor/corrector evaluated at the XLA level with
    anchors active (the EFT chains there face the same LLVM contraction
    hazard the kernels do in interpret mode — module docstring). `scal`
    from `_scal_ds_hermite`. Same P(EC) form as
    ops/reference.py::nbody_step_hermite (Makino & Aarseth 1992)."""
    n = pos_hi.shape[0]

    fscal = scal[:, :4]
    if sym:  # Newton's-third-law accel+jerk (each pair once, any N via
        # the blocked composition above the cap; block_cap is a STATIC
        # jit arg so a changed cap never reuses a stale compiled step)
        aj_tj = DS_AJ_SYM_TILE_J if tile_j is None else tile_j
        aj_cap = DS_AJ_SYM_MAX_N if block_cap is None else block_cap

        def aj(ph, plo, vh, vlo, *_ignored_j):
            return compute_accel_jerk_pallas_ds_sym_blocked(
                ph, plo, vh, vlo, fscal, tile_i=tile_i, tile_j=aj_tj,
                interpret=interpret, block_cap=aj_cap)
    else:
        def aj(ph, plo, vh, vlo, jph, jplo, jvh, jvlo):
            return compute_accel_jerk_pallas_ds(
                ph, plo, vh, vlo, jph, jplo, jvh, jvlo,
                fscal, tile_i=tile_i, tile_j=tile_j, interpret=interpret)

    a0h, a0l, j0h, j0l = aj(
        pos_hi, pos_lo, vel_hi, vel_lo, pos_hi, pos_lo, vel_hi, vel_lo)

    x0, v0 = hermite_planes(pos_hi, pos_lo), hermite_planes(vel_hi, vel_lo)
    a0, j0 = hermite_planes(a0h, a0l), hermite_planes(j0h, j0l)

    xp, vp = hermite_predict(x0, v0, a0, j0, scal)
    pph, ppl = hermite_assemble(xp, pos_hi[:, 3:4], pos_lo[:, 3:4])
    vph, vpl = hermite_assemble(vp, vel_hi[:, 3:4], vel_lo[:, 3:4])

    a1h, a1l, j1h, j1l = aj(
        pph, ppl, vph, vpl, pph, ppl, vph, vpl)
    a1, j1 = hermite_planes(a1h, a1l), hermite_planes(j1h, j1l)

    x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, scal)

    nph, npl = hermite_assemble(x1, pos_hi[:, 3:4], pos_lo[:, 3:4])
    nvh, nvl = hermite_assemble(v1, vel_hi[:, 3:4], vel_lo[:, 3:4])
    return nph[:n], npl[:n], nvh[:n], nvl[:n]


# ---- Newton's-third-law ds kernel (each pair once, fp64-grade) ----
#
# The f32 symmetric kernel (ops/symmetric_kernel.py) measured 1.29x the
# one-sided champion by sharing the expensive per-pair work (d, r², rsqrt,
# inv³) between both sides of every pair. In ds arithmetic that shared
# fraction is even larger (ds_rsqrt alone is ~90 flops), so the same
# upper-triangle walk + VMEM reaction scratch pays more. Reactions are
# accumulated IN ds (hi/lo scratch pairs; a plain-f32 reaction would
# reintroduce exactly the summation error this kernel exists to avoid).
# The final merge acc = i_side ⊕ reaction and the Euler update run at the
# XLA level in anchored ds — integration cannot fuse in-kernel because the
# reaction is only complete at the last grid step.

DS_SYM_MAX_N = 32768     # 6 (8, n_pad) f32 reaction scratches must fit VMEM
# measured on v5e at N=16384 (one-sided ds same day: 15.77 G int/s):
# (ti, tj) -> G int/s: (64,1024) 21.51 | (64,512) 21.67 | (64,2048) 20.77
# | (64,4096) 10.41 (program/vreg blowup) | (32,1024) 20.64 | (128,1024)
# 17.33 -> (64, 1024): 1.36x the one-sided ds kernel, on-chip |dpos| vs
# the f64 oracle 3.5e-14 (ds grade; bit-identical to one-sided in
# interpret mode at small N)
DS_SYM_TILE_J = 1024
_SYM_SUB = 8


def _ds_sym_kernel(meta_ref, rows_ref, cols_ref, first_ref, last_ref,
                   pih_ref, pil_ref, pth_ref, ptl_ref,
                   ah_ref, al_ref, rh_ref, rl_ref,
                   axh, axl, ayh, ayl, azh, azl,
                   rxh, rxl, ryh, ryl, rzh, rzl,
                   *, tile_i: int, tile_j: int, n_steps: int):
    p = pl.program_id(0)
    eps2 = (meta_ref[0], meta_ref[1])
    first = first_ref[p]

    @pl.when(p == 0)
    def _zero_reaction():
        zeros = jnp.zeros_like(rxh)
        for r in (rxh, rxl, ryh, ryl, rzh, rzl):
            r[:] = zeros

    @pl.when(first == 1)
    def _zero_row_acc():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl):
            r[:, :] = zeros

    def icol(c):
        return (pih_ref[:, c:c + 1], pil_ref[:, c:c + 1])  # (TI, 1)

    xi, yi, zi, mi = icol(0), icol(1), icol(2), icol(3)
    j_base = cols_ref[p] * tile_j

    def chunk_loop(masked: bool):
        if masked:
            ig = rows_ref[p] * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, 1), 0)
        for k in range(tile_j // LANES):
            sl = slice(k * LANES, (k + 1) * LANES)

            def row(r):
                return (pth_ref[r:r + 1, sl], ptl_ref[r:r + 1, sl])

            dx = ds_sub(row(0), xi)
            dy = ds_sub(row(1), yi)
            dz = ds_sub(row(2), zi)
            r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                        ds_add(ds_mul(dz, dz), eps2))
            inv = ds_rsqrt(r2)
            inv3 = ds_mul(ds_mul(inv, inv), inv)
            s = ds_mul(row(3), inv3)   # m_j / r^3: accel of i per unit d
            t = ds_mul(mi, inv3)       # m_i / r^3: reaction magnitude on j
            if masked:
                jg = j_base + k * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                keep = jg > ig  # strict upper triangle (drops self pair)
                s = (jnp.where(keep, s[0], 0.0), jnp.where(keep, s[1], 0.0))
                t = (jnp.where(keep, t[0], 0.0), jnp.where(keep, t[1], 0.0))

            for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                                ((azh, azl), dz)):
                acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
                ah[:, :] = acc[0]
                al[:, :] = acc[1]

            # reaction: ds-reduce TI -> 8 sublane rows by slice adds (no
            # relayout), then ds-RMW the persistent scratch columns
            for (rh_s, rl_s), d in (((rxh, rxl), dx), ((ryh, ryl), dy),
                                    ((rzh, rzl), dz)):
                uh, ul = ds_mul(t, d)  # (TI, LANES)
                u8 = (uh[0:_SYM_SUB], ul[0:_SYM_SUB])
                for q in range(1, tile_i // _SYM_SUB):
                    u8 = ds_add(u8, (uh[q * _SYM_SUB:(q + 1) * _SYM_SUB],
                                     ul[q * _SYM_SUB:(q + 1) * _SYM_SUB]))
                idx = (slice(0, _SYM_SUB), pl.ds(j_base + k * LANES, LANES))
                cur = ds_sub((rh_s[idx], rl_s[idx]), u8)
                rh_s[idx] = cur[0]
                rl_s[idx] = cur[1]

    @pl.when(first == 1)
    def _diag_block():
        chunk_loop(masked=True)

    @pl.when(first == 0)
    def _off_diag_block():
        chunk_loop(masked=False)

    @pl.when(last_ref[p] == 1)
    def _finalize_row():
        for c, (ah, al) in enumerate(((axh, axl), (ayh, ayl), (azh, azl))):
            hi, lo = reduce_ds_lanes(ah, al)
            ah_ref[:, c:c + 1] = hi
            al_ref[:, c:c + 1] = lo
        ah_ref[:, 3:4] = jnp.zeros_like(ah_ref[:, 3:4])
        al_ref[:, 3:4] = jnp.zeros_like(al_ref[:, 3:4])

    @pl.when(p == n_steps - 1)
    def _emit_reaction():
        for c, (rh_s, rl_s) in enumerate(((rxh, rxl), (ryh, ryl),
                                          (rzh, rzl))):
            v = (rh_s[0:1, :], rl_s[0:1, :])
            for q in range(1, _SYM_SUB):
                v = ds_add(v, (rh_s[q:q + 1, :], rl_s[q:q + 1, :]))
            rh_ref[c:c + 1, :] = v[0]
            rl_ref[c:c + 1, :] = v[1]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_pallas_ds_sym(pos_hi, pos_lo, scal,
                                *, tile_i: int = DS_TILE_I,
                                tile_j: int | None = None,
                                interpret: bool = False):
    """ds accelerations of the set on itself, each pair evaluated ONCE
    (self-vs-self only — the reaction accumulator is whole-set).
    N ≤ DS_SYM_MAX_N. Returns (acc_hi, acc_lo), each (N, 3): the kernel
    emits the i-side sums and the ds reaction planes, merged here at the
    XLA level in anchored ds. `scal` supplies the eps² hi/lo column
    (_scal_ds layout); its dt/damping columns are not consumed."""
    from nbody_tpu.ops.symmetric_kernel import _pair_tables

    n = pos_hi.shape[0]
    if n > DS_SYM_MAX_N:
        raise ValueError(
            f"ds symmetric kernel holds 6 (8, N) reaction scratches in "
            f"VMEM: N={n} > {DS_SYM_MAX_N}; use "
            f"compute_accel_pallas_ds_sym_blocked")
    if tile_j is None:
        tile_j = DS_SYM_TILE_J
    tile_j = min(tile_j, _round_up(n, LANES))
    if tile_i % _SYM_SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {_SYM_SUB} | tile_i, {LANES} | tile_j and tile_i | "
            f"tile_j; got ({tile_i}, {tile_j})")
    n_pad = _round_up(n, tile_j)

    def pad(a):
        return (jnp.pad(a, ((0, n_pad - n), (0, 0)))
                if n_pad != n else a)

    ph, plo = pad(pos_hi), pad(pos_lo)
    pth, ptl = ph.T, plo.T

    import numpy as np

    rows, cols, first, last = _pair_tables(n_pad, tile_i, tile_j)
    n_steps = int(rows.shape[0])
    # eps2 hi/lo from the scal block (host-exact split)
    meta = jnp.stack([scal[0, 1], scal[1, 1]])

    f32 = jnp.float32
    ah, al, rh, rl = pl.pallas_call(
        functools.partial(_ds_sym_kernel_entry, tile_i=tile_i,
                          tile_j=tile_j, n_steps=n_steps,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((4, tile_j),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, cols[p])),
                pl.BlockSpec((4, tile_j),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, cols[p])),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((tile_i, 4),
                             lambda p, meta, rows, cols, first, last:
                             _ix(rows[p], 0)),
                pl.BlockSpec((3, n_pad),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, 0)),
                pl.BlockSpec((3, n_pad),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, 0)),
            ],
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(6)]
                + [pltpu.VMEM((_SYM_SUB, n_pad), f32) for _ in range(6)]
            ),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 4), f32),
            jax.ShapeDtypeStruct((n_pad, 4), f32),
            jax.ShapeDtypeStruct((3, n_pad), f32),
            jax.ShapeDtypeStruct((3, n_pad), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential triangle walk
        ),
        cost_estimate=pl.CostEstimate(
            flops=250 * n_pad * n_pad,
            bytes_accessed=n_steps * (tile_i + tile_j) * 32,
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(meta, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(first),
      jnp.asarray(last), ph, plo, pth, ptl)

    # merge i-side + reaction at the XLA level in anchored ds
    acc_h, acc_l = [], []
    for c in range(3):
        a_c = ds_add((ah[:n, c], al[:n, c]), (rh[c, :n], rl[c, :n]))
        acc_h.append(a_c[0])
        acc_l.append(a_c[1])
    return jnp.stack(acc_h, axis=1), jnp.stack(acc_l, axis=1)


def _ds_kick_drift(pos_hi, pos_lo, vel_hi, vel_lo, acc, *, dt, damping,
                   dt_pos):
    """The shared ds kick+drift scaffolding: per coordinate column,
    v' = (v + a·dt)·damping and p' = pos + v'·dt_pos (anchored ds),
    mass columns carried through. The Euler update is the dt_pos=dt
    case; the DKD finalize drifts the HALF-step positions by dt/2."""
    nph, npl = [], []
    nvh, nvl = [], []
    for c in range(3):
        a_c = (acc[0][:, c], acc[1][:, c])
        v_c = (vel_hi[:, c], vel_lo[:, c])
        vnew = ds_mul(ds_add(v_c, ds_mul(a_c, dt)), damping)
        pnew = ds_add((pos_hi[:, c], pos_lo[:, c]), ds_mul(vnew, dt_pos))
        nph.append(pnew[0])
        npl.append(pnew[1])
        nvh.append(vnew[0])
        nvl.append(vnew[1])
    nph.append(pos_hi[:, 3])
    npl.append(pos_lo[:, 3])
    nvh.append(vel_hi[:, 3])
    nvl.append(vel_lo[:, 3])
    stack = lambda cols_: jnp.stack(cols_, axis=1)  # noqa: E731
    return stack(nph), stack(npl), stack(nvh), stack(nvl)


def _ds_integrate(pos_hi, pos_lo, vel_hi, vel_lo, acc, scal):
    """Damped semi-implicit Euler in anchored XLA-level ds.
    `acc` = (acc_hi, acc_lo), each (N, 3)."""
    dt = (scal[0, 0], scal[1, 0])
    return _ds_kick_drift(pos_hi, pos_lo, vel_hi, vel_lo, acc, dt=dt,
                          damping=(scal[0, 2], scal[1, 2]), dt_pos=dt)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_pallas_ds_sym(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                             *, tile_i: int = DS_TILE_I,
                             tile_j: int | None = None,
                             interpret: bool = False):
    """One ds Euler step with each pair evaluated ONCE (self-vs-self only).
    N ≤ DS_SYM_MAX_N; the any-N form is nbody_step_pallas_ds_sym_blocked.
    Force merge and the Euler update run at the XLA level in anchored ds
    (O(N) next to the O(N²/2) kernel)."""
    acc = compute_accel_pallas_ds_sym(pos_hi, pos_lo, scal, tile_i=tile_i,
                                      tile_j=tile_j, interpret=interpret)
    return _ds_integrate(pos_hi, pos_lo, vel_hi, vel_lo, acc, scal)


def _ds_sym_kernel_entry(*args, tile_i, tile_j, n_steps, interpret):
    # compiled (Mosaic) tracing must not emit barrier primitives
    global _ANCHORS
    prev = _ANCHORS
    _ANCHORS = bool(interpret)
    try:
        return _ds_sym_kernel(*args, tile_i=tile_i, tile_j=tile_j,
                              n_steps=n_steps)
    finally:
        _ANCHORS = prev


# ---- blockwise ds composition: each-pair-once above DS_SYM_MAX_N ----
#
# The f32 analogue lives in ops/symmetric_kernel.py: decompose the global
# pair triangle into superblocks of B ≤ DS_SYM_MAX_N bodies — per-block
# self triangles (the kernel above) plus mask-free CROSS rectangles whose
# ds reaction scratch spans one block — and ds-add the O(N) partial sums
# at the XLA level. Two compiled kernels cover every N.


def _ds_sym_cross_kernel(meta_ref, pih_ref, pil_ref, pth_ref, ptl_ref,
                         ah_ref, al_ref, rh_ref, rl_ref,
                         axh, axl, ayh, ayl, azh, azl,
                         rxh, rxl, ryh, ryl, rzh, rzl,
                         *, tile_i: int, tile_j: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    eps2 = (meta_ref[0], meta_ref[1])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_reaction():
        zeros = jnp.zeros_like(rxh)
        for r in (rxh, rxl, ryh, ryl, rzh, rzl):
            r[:] = zeros

    @pl.when(j == 0)
    def _zero_row_acc():
        zeros = jnp.zeros_like(axh)
        for r in (axh, axl, ayh, ayl, azh, azl):
            r[:, :] = zeros

    def icol(c):
        return (pih_ref[:, c:c + 1], pil_ref[:, c:c + 1])  # (TI, 1)

    xi, yi, zi, mi = icol(0), icol(1), icol(2), icol(3)
    j_base = j * tile_j

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)

        def row(r):
            return (pth_ref[r:r + 1, sl], ptl_ref[r:r + 1, sl])

        dx = ds_sub(row(0), xi)
        dy = ds_sub(row(1), yi)
        dz = ds_sub(row(2), zi)
        r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                    ds_add(ds_mul(dz, dz), eps2))
        inv = ds_rsqrt(r2)
        inv3 = ds_mul(ds_mul(inv, inv), inv)
        s = ds_mul(row(3), inv3)   # m_j / r^3: accel of i per unit d
        t = ds_mul(mi, inv3)       # m_i / r^3: reaction magnitude on j

        for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                            ((azh, azl), dz)):
            acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
            ah[:, :] = acc[0]
            al[:, :] = acc[1]

        for (rh_s, rl_s), d in (((rxh, rxl), dx), ((ryh, ryl), dy),
                                ((rzh, rzl), dz)):
            uh, ul = ds_mul(t, d)  # (TI, LANES)
            u8 = (uh[0:_SYM_SUB], ul[0:_SYM_SUB])
            for q in range(1, tile_i // _SYM_SUB):
                u8 = ds_add(u8, (uh[q * _SYM_SUB:(q + 1) * _SYM_SUB],
                                 ul[q * _SYM_SUB:(q + 1) * _SYM_SUB]))
            idx = (slice(0, _SYM_SUB), pl.ds(j_base + k * LANES, LANES))
            cur = ds_sub((rh_s[idx], rl_s[idx]), u8)
            rh_s[idx] = cur[0]
            rl_s[idx] = cur[1]

    @pl.when(j == nj - 1)
    def _finalize_row():
        for c, (ah, al) in enumerate(((axh, axl), (ayh, ayl), (azh, azl))):
            hi, lo = reduce_ds_lanes(ah, al)
            ah_ref[:, c:c + 1] = hi
            al_ref[:, c:c + 1] = lo
        ah_ref[:, 3:4] = jnp.zeros_like(ah_ref[:, 3:4])
        al_ref[:, 3:4] = jnp.zeros_like(al_ref[:, 3:4])

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1, j == nj - 1))
    def _emit_reaction():
        for c, (rh_s, rl_s) in enumerate(((rxh, rxl), (ryh, ryl),
                                          (rzh, rzl))):
            v = (rh_s[0:1, :], rl_s[0:1, :])
            for q in range(1, _SYM_SUB):
                v = ds_add(v, (rh_s[q:q + 1, :], rl_s[q:q + 1, :]))
            rh_ref[c:c + 1, :] = v[0]
            rl_ref[c:c + 1, :] = v[1]


def _ds_sym_cross_entry(*args, tile_i, tile_j, interpret):
    # compiled (Mosaic) tracing must not emit barrier primitives
    global _ANCHORS
    prev = _ANCHORS
    _ANCHORS = bool(interpret)
    try:
        return _ds_sym_cross_kernel(*args, tile_i=tile_i, tile_j=tile_j)
    finally:
        _ANCHORS = prev


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def _ds_sym_cross(pih, pil, pth, ptl, meta, *, tile_i: int, tile_j: int,
                  interpret: bool = False):
    """One Bi×Bj ds cross block pair: i-set AoS hi/lo (Bi, 4), j-set
    transposed hi/lo (4, Bj), meta = eps² (hi, lo). Returns
    (acc_hi, acc_lo) (Bi, 4) and (react_hi, react_lo) (3, Bj)."""
    f32 = jnp.float32
    bi = pih.shape[0]
    bj = pth.shape[1]
    row_spec = pl.BlockSpec((tile_i, 4), lambda i, j, meta: _ix(i, 0))
    col_spec = pl.BlockSpec((4, tile_j), lambda i, j, meta: _ix(0, j))
    full_spec = pl.BlockSpec((3, bj), lambda i, j, meta: _ix(0, 0))
    return pl.pallas_call(
        functools.partial(_ds_sym_cross_entry, tile_i=tile_i,
                          tile_j=tile_j, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bi // tile_i, bj // tile_j),
            in_specs=[row_spec, row_spec, col_spec, col_spec],
            out_specs=[row_spec, row_spec, full_spec, full_spec],
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(6)]
                + [pltpu.VMEM((_SYM_SUB, bj), f32) for _ in range(6)]
            ),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bi, 4), f32),
            jax.ShapeDtypeStruct((bi, 4), f32),
            jax.ShapeDtypeStruct((3, bj), f32),
            jax.ShapeDtypeStruct((3, bj), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            # rows share the reaction scratch -> sequential walk
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=500 * bi * bj,
            bytes_accessed=(bi // tile_i) * (bj // tile_j)
            * (tile_i + tile_j) * 32,
            transcendentals=bi * bj,
        ),
        interpret=interpret,
    )(meta, pih, pil, pth, ptl)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def compute_accel_pallas_ds_sym_blocked(pos_hi, pos_lo, scal,
                                        *, tile_i: int = DS_TILE_I,
                                        tile_j: int | None = None,
                                        interpret: bool = False,
                                        block_cap: int = DS_SYM_MAX_N):
    """ds accelerations, each pair evaluated once, any N — the blockwise
    composition (see the section comment). Returns (acc_hi, acc_lo),
    each (N, 3). N ≤ block_cap delegates to the single triangle."""
    n = pos_hi.shape[0]
    if n <= block_cap:
        return compute_accel_pallas_ds_sym(pos_hi, pos_lo, scal,
                                           tile_i=tile_i, tile_j=tile_j,
                                           interpret=interpret)
    from nbody_tpu.ops.symmetric_kernel import sym_blocking

    if tile_j is None:
        tile_j = DS_SYM_TILE_J
    if tile_i % _SYM_SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {_SYM_SUB} | tile_i, {LANES} | tile_j and tile_i | "
            f"tile_j; got ({tile_i}, {tile_j})")
    k, blk = sym_blocking(n, tile_j, block_cap)
    if tile_j * 2 > blk:
        # the f32 blocked path's measured Mosaic scoped-vmem hazard (a
        # block-wide j-stream leaves a single-grid-step cross program):
        # clamp to the widest tile dividing the block at <= blk/2; tiny
        # blocks with no such tile compile fine and pass through
        import math

        base = LANES * tile_i // math.gcd(LANES, tile_i)
        fitted = (blk // 2 // base) * base
        while fitted > base and blk % fitted:
            fitted -= base
        if fitted >= base and blk % fitted == 0:
            tile_j = fitted
        elif blk > 4096:
            raise ValueError(
                f"blocked ds sym needs tile_j <= block/2: got "
                f"tile_j={tile_j}, block={blk} (use a smaller tile_j)")
        else:
            tile_j = blk
    n_pad = k * blk

    def pad(a):
        return jnp.pad(a, ((0, n_pad - n), (0, 0)))

    ph, plo = pad(pos_hi), pad(pos_lo)
    blocks = [(ph[a * blk:(a + 1) * blk], plo[a * blk:(a + 1) * blk])
              for a in range(k)]
    blocksT = [(bh.T, bl.T) for bh, bl in blocks]
    meta = jnp.stack([scal[0, 1], scal[1, 1]])

    contrib = [
        [compute_accel_pallas_ds_sym(bh, bl, scal, tile_i=tile_i,
                                     tile_j=tile_j, interpret=interpret)]
        for bh, bl in blocks
    ]
    for a in range(k):
        for b in range(a + 1, k):
            acc_h, acc_l, r_h, r_l = _ds_sym_cross(
                blocks[a][0], blocks[a][1], blocksT[b][0], blocksT[b][1],
                meta, tile_i=tile_i, tile_j=tile_j, interpret=interpret)
            contrib[a].append((acc_h[:, :3], acc_l[:, :3]))
            contrib[b].append((r_h.T, r_l.T))

    acc_h, acc_l = [], []
    for parts in contrib:
        total = parts[0]
        for p_ in parts[1:]:
            total = ds_add(total, p_)
        acc_h.append(total[0])
        acc_l.append(total[1])
    return (jnp.concatenate(acc_h)[:n], jnp.concatenate(acc_l)[:n])


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def nbody_step_pallas_ds_sym_blocked(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                                     *, tile_i: int = DS_TILE_I,
                                     tile_j: int | None = None,
                                     interpret: bool = False,
                                     block_cap: int = DS_SYM_MAX_N):
    """One each-pair-once ds Euler step at any N — the blocked form of
    nbody_step_pallas_ds_sym (bit-identical delegation under the cap)."""
    acc = compute_accel_pallas_ds_sym_blocked(
        pos_hi, pos_lo, scal, tile_i=tile_i, tile_j=tile_j,
        interpret=interpret, block_cap=block_cap)
    return _ds_integrate(pos_hi, pos_lo, vel_hi, vel_lo, acc, scal)


# ---- Newton's-third-law ds accel+jerk (the Hermite force evaluation) ----
#
# Same upper-triangle walk as the ds euler sym kernel, emitting BOTH force
# quantities both ways: acc uses the mass-folded s/t scalings, jerk uses
# the mass-free bracket q = inv3*dv - 3(dr.dv)/r^5 * dr (antisymmetric
# under i<->j like the force, so the reaction is -m_i*q). 12 i-side
# accumulators + 12 (8, n_pad) reaction scratches cap this kernel at
# N <= DS_AJ_SYM_MAX_N — exactly the ds Hermite showcase shape.

DS_AJ_SYM_MAX_N = 16384
# measured on v5e at N=16384 (one-sided ds hermite same day: 3.82 G int/s
# per step = 2 evals): sym tj=1024 -> 5.17, tj=512 -> 5.22 (tie) — 1.36x;
# on-chip |dpos| vs the f64 oracle hermite 3.5e-14 (ds grade)
DS_AJ_SYM_TILE_J = 1024


def _ds_aj_sym_kernel(meta_ref, rows_ref, cols_ref, first_ref, last_ref,
                      pih_ref, pil_ref, vih_ref, vil_ref,
                      pth_ref, ptl_ref, vth_ref, vtl_ref,
                      ah_ref, al_ref, jh_ref, jl_ref,
                      rah_ref, ral_ref, rjh_ref, rjl_ref,
                      *scratches, tile_i: int, tile_j: int, n_steps: int):
    # scratches: 12 i-side (tile_i, LANES) [axh..azl, gxh..gzl] then 12
    # reaction (8, n_pad) [raxh..razl, rjxh..rjzl]
    iacc = scratches[:12]
    react = scratches[12:]
    p = pl.program_id(0)
    eps2 = (meta_ref[0], meta_ref[1])
    first = first_ref[p]

    @pl.when(p == 0)
    def _zero_reaction():
        zeros = jnp.zeros_like(react[0])
        for r in react:
            r[:] = zeros

    @pl.when(first == 1)
    def _zero_row_acc():
        zeros = jnp.zeros_like(iacc[0])
        for r in iacc:
            r[:, :] = zeros

    def icol(h_ref, l_ref, c):
        return (h_ref[:, c:c + 1], l_ref[:, c:c + 1])

    xi, yi, zi = (icol(pih_ref, pil_ref, c) for c in range(3))
    vxi, vyi, vzi = (icol(vih_ref, vil_ref, c) for c in range(3))
    mi = icol(pih_ref, pil_ref, 3)
    j_base = cols_ref[p] * tile_j

    def chunk_loop(masked: bool):
        if masked:
            ig = rows_ref[p] * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, 1), 0)
        for k in range(tile_j // LANES):
            sl = slice(k * LANES, (k + 1) * LANES)

            def jrow(h_ref, l_ref, r):
                return (h_ref[r:r + 1, sl], l_ref[r:r + 1, sl])

            dx = ds_sub(jrow(pth_ref, ptl_ref, 0), xi)
            dy = ds_sub(jrow(pth_ref, ptl_ref, 1), yi)
            dz = ds_sub(jrow(pth_ref, ptl_ref, 2), zi)
            dvx = ds_sub(jrow(vth_ref, vtl_ref, 0), vxi)
            dvy = ds_sub(jrow(vth_ref, vtl_ref, 1), vyi)
            dvz = ds_sub(jrow(vth_ref, vtl_ref, 2), vzi)
            r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                        ds_add(ds_mul(dz, dz), eps2))
            inv = ds_rsqrt(r2)
            inv2 = ds_mul(inv, inv)
            inv3 = ds_mul(inv2, inv)
            rv = ds_add(ds_add(ds_mul(dx, dvx), ds_mul(dy, dvy)),
                        ds_mul(dz, dvz))
            c3p = ds_mul_f32(ds_mul(ds_mul(rv, inv2), inv3),
                             jnp.float32(3.0))  # 3 (dr.dv)/r^5, mass-free
            mj = jrow(pth_ref, ptl_ref, 3)
            mik = mi
            if masked:
                jg = j_base + k * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                keep = jg > ig  # strict upper triangle (drops self pair)
                z = jnp.float32(0.0)
                mj = (jnp.where(keep, mj[0], z), jnp.where(keep, mj[1], z))
                mik = (jnp.where(keep, mik[0], z),
                       jnp.where(keep, mik[1], z))
            s = ds_mul(mj, inv3)   # acc scale toward j, on i
            t = ds_mul(mik, inv3)  # reaction acc scale on j

            qx = ds_sub(ds_mul(inv3, dvx), ds_mul(c3p, dx))
            qy = ds_sub(ds_mul(inv3, dvy), ds_mul(c3p, dy))
            qz = ds_sub(ds_mul(inv3, dvz), ds_mul(c3p, dz))

            axh, axl, ayh, ayl, azh, azl = iacc[:6]
            gxh, gxl, gyh, gyl, gzh, gzl = iacc[6:]
            for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                                ((azh, azl), dz)):
                acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
                ah[:, :] = acc[0]
                al[:, :] = acc[1]
            for (gh, gl), q in (((gxh, gxl), qx), ((gyh, gyl), qy),
                                ((gzh, gzl), qz)):
                jrk = ds_add((gh[:, :], gl[:, :]), ds_mul(mj, q))
                gh[:, :] = jrk[0]
                gl[:, :] = jrk[1]

            # reactions: -t*d (acc) and -m_i*q (jerk), ds-reduced TI->8
            def rmw(rh_s, rl_s, u):
                uh, ul = u
                u8 = (uh[0:_SYM_SUB], ul[0:_SYM_SUB])
                for q_ in range(1, tile_i // _SYM_SUB):
                    u8 = ds_add(u8,
                                (uh[q_ * _SYM_SUB:(q_ + 1) * _SYM_SUB],
                                 ul[q_ * _SYM_SUB:(q_ + 1) * _SYM_SUB]))
                idx = (slice(0, _SYM_SUB),
                       pl.ds(j_base + k * LANES, LANES))
                cur = ds_sub((rh_s[idx], rl_s[idx]), u8)
                rh_s[idx] = cur[0]
                rl_s[idx] = cur[1]

            for c, d in enumerate((dx, dy, dz)):
                rmw(react[2 * c], react[2 * c + 1], ds_mul(t, d))
            for c, q in enumerate((qx, qy, qz)):
                rmw(react[6 + 2 * c], react[7 + 2 * c], ds_mul(mik, q))

    @pl.when(first == 1)
    def _diag_block():
        chunk_loop(masked=True)

    @pl.when(first == 0)
    def _off_diag_block():
        chunk_loop(masked=False)

    @pl.when(last_ref[p] == 1)
    def _finalize_row():
        for c in range(3):
            hi, lo = reduce_ds_lanes(iacc[2 * c], iacc[2 * c + 1])
            ah_ref[:, c:c + 1] = hi
            al_ref[:, c:c + 1] = lo
            hi, lo = reduce_ds_lanes(iacc[6 + 2 * c], iacc[7 + 2 * c])
            jh_ref[:, c:c + 1] = hi
            jl_ref[:, c:c + 1] = lo
        for ref in (ah_ref, al_ref, jh_ref, jl_ref):
            ref[:, 3:4] = jnp.zeros_like(ref[:, 3:4])

    @pl.when(p == n_steps - 1)
    def _emit_reaction():
        for c in range(3):
            for (rh_s, rl_s), (oh, ol) in (
                ((react[2 * c], react[2 * c + 1]), (rah_ref, ral_ref)),
                ((react[6 + 2 * c], react[7 + 2 * c]), (rjh_ref, rjl_ref)),
            ):
                v = (rh_s[0:1, :], rl_s[0:1, :])
                for q_ in range(1, _SYM_SUB):
                    v = ds_add(v, (rh_s[q_:q_ + 1, :], rl_s[q_:q_ + 1, :]))
                oh[c:c + 1, :] = v[0]
                ol[c:c + 1, :] = v[1]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_jerk_pallas_ds_sym(pos_hi, pos_lo, vel_hi, vel_lo, scal,
                                     *, tile_i: int = DS_TILE_I,
                                     tile_j: int = DS_AJ_SYM_TILE_J,
                                     interpret: bool = False):
    """ds (acc_hi, acc_lo, jerk_hi, jerk_lo), each (N, 4) with column 3
    zero, each pair evaluated ONCE (self-vs-self only). N ≤ DS_AJ_SYM_MAX_N.
    Drop-in for compute_accel_jerk_pallas_ds in the self case."""
    from nbody_tpu.ops.symmetric_kernel import _pair_tables

    n = pos_hi.shape[0]
    if n > DS_AJ_SYM_MAX_N:
        raise ValueError(
            f"ds symmetric accel+jerk holds 12 (8, N) reaction scratches "
            f"in VMEM: N={n} > {DS_AJ_SYM_MAX_N}; use the one-sided kernel")
    tile_j = min(tile_j, _round_up(n, LANES))
    if tile_i % _SYM_SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {_SYM_SUB} | tile_i, {LANES} | tile_j and tile_i | "
            f"tile_j; got ({tile_i}, {tile_j})")
    n_pad = _round_up(n, tile_j)

    def pad(a):
        return (jnp.pad(a, ((0, n_pad - n), (0, 0)))
                if n_pad != n else a)

    ph, plo = pad(pos_hi), pad(pos_lo)
    vh, vlo = pad(vel_hi), pad(vel_lo)

    rows, cols, first, last = _pair_tables(n_pad, tile_i, tile_j)
    n_steps = int(rows.shape[0])
    meta = jnp.stack([scal[0, 1], scal[1, 1]])  # eps^2 hi/lo

    f32 = jnp.float32
    row_spec = pl.BlockSpec(
        (tile_i, 4),
        lambda p, meta, rows, cols, first, last: _ix(rows[p], 0))
    col_spec = pl.BlockSpec(
        (4, tile_j),
        lambda p, meta, rows, cols, first, last: _ix(0, cols[p]))
    full_spec = pl.BlockSpec(
        (3, n_pad), lambda p, meta, rows, cols, first, last: _ix(0, 0))

    outs = pl.pallas_call(
        functools.partial(_ds_aj_sym_kernel_entry, tile_i=tile_i,
                          tile_j=tile_j, n_steps=n_steps,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=[row_spec] * 4 + [col_spec] * 4,
            out_specs=[row_spec] * 4 + [full_spec] * 4,
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(12)]
                + [pltpu.VMEM((_SYM_SUB, n_pad), f32) for _ in range(12)]
            ),
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_pad, 4), f32)] * 4
            + [jax.ShapeDtypeStruct((3, n_pad), f32)] * 4
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential triangle walk
        ),
        cost_estimate=pl.CostEstimate(
            flops=500 * n_pad * n_pad,
            bytes_accessed=n_steps * (tile_i + tile_j) * 64,
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(meta, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(first),
      jnp.asarray(last), ph, plo, vh, vlo, ph.T, plo.T, vh.T, vlo.T)
    ah, al, jh, jl, rah, ral, rjh, rjl = outs

    # merge i-side + reaction at the XLA level in anchored ds
    def merged(side_h, side_l, rh, rl):
        hs, ls = [], []
        for c in range(3):
            hi, lo = ds_add((side_h[:n, c], side_l[:n, c]),
                            (rh[c, :n], rl[c, :n]))
            hs.append(hi)
            ls.append(lo)
        hs.append(jnp.zeros_like(hs[0]))
        ls.append(jnp.zeros_like(ls[0]))
        return jnp.stack(hs, axis=1), jnp.stack(ls, axis=1)

    acc_h, acc_l = merged(ah, al, rah, ral)
    jrk_h, jrk_l = merged(jh, jl, rjh, rjl)
    return acc_h, acc_l, jrk_h, jrk_l


def _ds_aj_sym_kernel_entry(*args, tile_i, tile_j, n_steps, interpret):
    # compiled (Mosaic) tracing must not emit barrier primitives
    global _ANCHORS
    prev = _ANCHORS
    _ANCHORS = bool(interpret)
    try:
        return _ds_aj_sym_kernel(*args, tile_i=tile_i, tile_j=tile_j,
                                 n_steps=n_steps)
    finally:
        _ANCHORS = prev


# ---- blockwise ds accel+jerk: ds Hermite each-pair-once above the cap ----
#
# The 12-reaction-scratch triangle above caps at DS_AJ_SYM_MAX_N. The same
# blockwise composition as the ds force path lifts it: per-superblock self
# triangles (the kernel above) + mask-free CROSS rectangles whose 12
# reaction scratches span one block, partial sums ds-added at the XLA
# level. Two compiled kernels cover every N.


def _ds_aj_sym_cross_kernel(meta_ref, pih_ref, pil_ref, vih_ref, vil_ref,
                            pth_ref, ptl_ref, vth_ref, vtl_ref,
                            ah_ref, al_ref, jh_ref, jl_ref,
                            rah_ref, ral_ref, rjh_ref, rjl_ref,
                            *scratches, tile_i: int, tile_j: int):
    """Mask-free ds accel+jerk over one Bi×Bj cross block pair, each
    (i, j) pair ONCE — _ds_sym_cross_kernel extended with the jerk
    bracket of _ds_aj_sym_kernel (q antisymmetric under i↔j, reaction
    −m_i·q accumulated like the force reaction, all in ds arithmetic)."""
    iacc = scratches[:12]
    react = scratches[12:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    eps2 = (meta_ref[0], meta_ref[1])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_reaction():
        zeros = jnp.zeros_like(react[0])
        for r in react:
            r[:] = zeros

    @pl.when(j == 0)
    def _zero_row_acc():
        zeros = jnp.zeros_like(iacc[0])
        for r in iacc:
            r[:, :] = zeros

    def icol(h_ref, l_ref, c):
        return (h_ref[:, c:c + 1], l_ref[:, c:c + 1])

    xi, yi, zi = (icol(pih_ref, pil_ref, c) for c in range(3))
    vxi, vyi, vzi = (icol(vih_ref, vil_ref, c) for c in range(3))
    mi = icol(pih_ref, pil_ref, 3)
    j_base = j * tile_j

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)

        def jrow(h_ref, l_ref, r):
            return (h_ref[r:r + 1, sl], l_ref[r:r + 1, sl])

        dx = ds_sub(jrow(pth_ref, ptl_ref, 0), xi)
        dy = ds_sub(jrow(pth_ref, ptl_ref, 1), yi)
        dz = ds_sub(jrow(pth_ref, ptl_ref, 2), zi)
        dvx = ds_sub(jrow(vth_ref, vtl_ref, 0), vxi)
        dvy = ds_sub(jrow(vth_ref, vtl_ref, 1), vyi)
        dvz = ds_sub(jrow(vth_ref, vtl_ref, 2), vzi)
        r2 = ds_add(ds_add(ds_mul(dx, dx), ds_mul(dy, dy)),
                    ds_add(ds_mul(dz, dz), eps2))
        inv = ds_rsqrt(r2)
        inv2 = ds_mul(inv, inv)
        inv3 = ds_mul(inv2, inv)
        rv = ds_add(ds_add(ds_mul(dx, dvx), ds_mul(dy, dvy)),
                    ds_mul(dz, dvz))
        c3p = ds_mul_f32(ds_mul(ds_mul(rv, inv2), inv3),
                         jnp.float32(3.0))  # 3 (dr.dv)/r^5, mass-free
        mj = jrow(pth_ref, ptl_ref, 3)
        s = ds_mul(mj, inv3)   # acc scale toward j, on i
        t = ds_mul(mi, inv3)   # reaction acc scale on j

        qx = ds_sub(ds_mul(inv3, dvx), ds_mul(c3p, dx))
        qy = ds_sub(ds_mul(inv3, dvy), ds_mul(c3p, dy))
        qz = ds_sub(ds_mul(inv3, dvz), ds_mul(c3p, dz))

        axh, axl, ayh, ayl, azh, azl = iacc[:6]
        gxh, gxl, gyh, gyl, gzh, gzl = iacc[6:]
        for (ah, al), d in (((axh, axl), dx), ((ayh, ayl), dy),
                            ((azh, azl), dz)):
            acc = ds_add((ah[:, :], al[:, :]), ds_mul(s, d))
            ah[:, :] = acc[0]
            al[:, :] = acc[1]
        for (gh, gl), q in (((gxh, gxl), qx), ((gyh, gyl), qy),
                            ((gzh, gzl), qz)):
            jrk = ds_add((gh[:, :], gl[:, :]), ds_mul(mj, q))
            gh[:, :] = jrk[0]
            gl[:, :] = jrk[1]

        # reactions: -t*d (acc) and -m_i*q (jerk), ds-reduced TI->8
        def rmw(rh_s, rl_s, u):
            uh, ul = u
            u8 = (uh[0:_SYM_SUB], ul[0:_SYM_SUB])
            for q_ in range(1, tile_i // _SYM_SUB):
                u8 = ds_add(u8,
                            (uh[q_ * _SYM_SUB:(q_ + 1) * _SYM_SUB],
                             ul[q_ * _SYM_SUB:(q_ + 1) * _SYM_SUB]))
            idx = (slice(0, _SYM_SUB),
                   pl.ds(j_base + k * LANES, LANES))
            cur = ds_sub((rh_s[idx], rl_s[idx]), u8)
            rh_s[idx] = cur[0]
            rl_s[idx] = cur[1]

        for c, d in enumerate((dx, dy, dz)):
            rmw(react[2 * c], react[2 * c + 1], ds_mul(t, d))
        for c, q in enumerate((qx, qy, qz)):
            rmw(react[6 + 2 * c], react[7 + 2 * c], ds_mul(mi, q))

    @pl.when(j == nj - 1)
    def _finalize_row():
        for c in range(3):
            hi, lo = reduce_ds_lanes(iacc[2 * c], iacc[2 * c + 1])
            ah_ref[:, c:c + 1] = hi
            al_ref[:, c:c + 1] = lo
            hi, lo = reduce_ds_lanes(iacc[6 + 2 * c], iacc[7 + 2 * c])
            jh_ref[:, c:c + 1] = hi
            jl_ref[:, c:c + 1] = lo
        for ref in (ah_ref, al_ref, jh_ref, jl_ref):
            ref[:, 3:4] = jnp.zeros_like(ref[:, 3:4])

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1, j == nj - 1))
    def _emit_reaction():
        for c in range(3):
            for (rh_s, rl_s), (oh, ol) in (
                ((react[2 * c], react[2 * c + 1]), (rah_ref, ral_ref)),
                ((react[6 + 2 * c], react[7 + 2 * c]), (rjh_ref, rjl_ref)),
            ):
                v = (rh_s[0:1, :], rl_s[0:1, :])
                for q_ in range(1, _SYM_SUB):
                    v = ds_add(v, (rh_s[q_:q_ + 1, :], rl_s[q_:q_ + 1, :]))
                oh[c:c + 1, :] = v[0]
                ol[c:c + 1, :] = v[1]


def _ds_aj_sym_cross_entry(*args, tile_i, tile_j, interpret):
    # compiled (Mosaic) tracing must not emit barrier primitives
    global _ANCHORS
    prev = _ANCHORS
    _ANCHORS = bool(interpret)
    try:
        return _ds_aj_sym_cross_kernel(*args, tile_i=tile_i, tile_j=tile_j)
    finally:
        _ANCHORS = prev


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def _ds_aj_sym_cross(pih, pil, vih, vil, pth, ptl, vth, vtl, meta,
                     *, tile_i: int, tile_j: int, interpret: bool = False):
    """One Bi×Bj ds accel+jerk cross block pair: i-set AoS hi/lo (Bi, 4)
    pos+vel, j-set transposed hi/lo (4, Bj), meta = eps² (hi, lo).
    Returns (acc_hi, acc_lo, jerk_hi, jerk_lo) (Bi, 4) and
    (react_acc_hi/lo, react_jerk_hi/lo) (3, Bj)."""
    f32 = jnp.float32
    bi = pih.shape[0]
    bj = pth.shape[1]
    row_spec = pl.BlockSpec((tile_i, 4), lambda i, j, meta: _ix(i, 0))
    col_spec = pl.BlockSpec((4, tile_j), lambda i, j, meta: _ix(0, j))
    full_spec = pl.BlockSpec((3, bj), lambda i, j, meta: _ix(0, 0))
    return pl.pallas_call(
        functools.partial(_ds_aj_sym_cross_entry, tile_i=tile_i,
                          tile_j=tile_j, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bi // tile_i, bj // tile_j),
            in_specs=[row_spec] * 4 + [col_spec] * 4,
            out_specs=[row_spec] * 4 + [full_spec] * 4,
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(12)]
                + [pltpu.VMEM((_SYM_SUB, bj), f32) for _ in range(12)]
            ),
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((bi, 4), f32)] * 4
            + [jax.ShapeDtypeStruct((3, bj), f32)] * 4
        ),
        compiler_params=pltpu.CompilerParams(
            # rows share the reaction scratch -> sequential walk
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=1000 * bi * bj,
            bytes_accessed=(bi // tile_i) * (bj // tile_j)
            * (tile_i + tile_j) * 64,
            transcendentals=bi * bj,
        ),
        interpret=interpret,
    )(meta, pih, pil, vih, vil, pth, ptl, vth, vtl)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def compute_accel_jerk_pallas_ds_sym_blocked(
        pos_hi, pos_lo, vel_hi, vel_lo, scal, *, tile_i: int = DS_TILE_I,
        tile_j: int | None = None, interpret: bool = False,
        block_cap: int = DS_AJ_SYM_MAX_N):
    """ds (acc_hi, acc_lo, jerk_hi, jerk_lo), each (N, 4) with column 3
    zero, each pair evaluated once, ANY N — the blockwise composition of
    the ds accel+jerk triangle. N ≤ block_cap delegates to the
    single-triangle kernel bit-exactly."""
    n = pos_hi.shape[0]
    kw = dict(tile_i=tile_i, interpret=interpret)
    if n <= block_cap:
        return compute_accel_jerk_pallas_ds_sym(
            pos_hi, pos_lo, vel_hi, vel_lo, scal,
            **kw, **({} if tile_j is None else {"tile_j": tile_j}))
    from nbody_tpu.ops.symmetric_kernel import sym_blocking

    if tile_j is None:
        tile_j = DS_AJ_SYM_TILE_J
    if tile_i % _SYM_SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {_SYM_SUB} | tile_i, {LANES} | tile_j and tile_i | "
            f"tile_j; got ({tile_i}, {tile_j})")
    k, blk = sym_blocking(n, tile_j, block_cap)
    if tile_j * 2 > blk:
        # the measured Mosaic scoped-vmem hazard of the blocked paths (a
        # block-wide j-stream leaves a single-grid-step cross program):
        # clamp to the widest tile dividing the block at <= blk/2
        import math

        base = LANES * tile_i // math.gcd(LANES, tile_i)
        fitted = (blk // 2 // base) * base
        while fitted > base and blk % fitted:
            fitted -= base
        if fitted >= base and blk % fitted == 0:
            tile_j = fitted
        elif blk > 4096:
            raise ValueError(
                f"blocked ds sym aj needs tile_j <= block/2: got "
                f"tile_j={tile_j}, block={blk} (use a smaller tile_j)")
        else:
            tile_j = blk
    n_pad = k * blk

    def pad(a):
        return jnp.pad(a, ((0, n_pad - n), (0, 0)))

    planes = [pad(a) for a in (pos_hi, pos_lo, vel_hi, vel_lo)]
    blocks = [tuple(p[a * blk:(a + 1) * blk] for p in planes)
              for a in range(k)]
    meta = jnp.stack([scal[0, 1], scal[1, 1]])

    acc_parts = [[] for _ in range(k)]
    jerk_parts = [[] for _ in range(k)]
    for a in range(k):
        ah, al, jh, jl = compute_accel_jerk_pallas_ds_sym(
            *blocks[a], scal, tile_i=tile_i, tile_j=tile_j,
            interpret=interpret)
        acc_parts[a].append((ah[:, :3], al[:, :3]))
        jerk_parts[a].append((jh[:, :3], jl[:, :3]))
    for a in range(k):
        for b in range(a + 1, k):
            bT = tuple(p.T for p in blocks[b])
            ah, al, jh, jl, rah, ral, rjh, rjl = _ds_aj_sym_cross(
                *blocks[a], *bT, meta, tile_i=tile_i, tile_j=tile_j,
                interpret=interpret)
            acc_parts[a].append((ah[:, :3], al[:, :3]))
            jerk_parts[a].append((jh[:, :3], jl[:, :3]))
            acc_parts[b].append((rah.T, ral.T))
            jerk_parts[b].append((rjh.T, rjl.T))

    def merge(parts_per_block):
        hs, ls = [], []
        for parts in parts_per_block:
            total = parts[0]
            for p_ in parts[1:]:
                total = ds_add(total, p_)
            hs.append(total[0])
            ls.append(total[1])
        h = jnp.concatenate(hs)[:n]
        lo = jnp.concatenate(ls)[:n]
        z = jnp.zeros((n, 1), h.dtype)
        return (jnp.concatenate([h, z], axis=1),
                jnp.concatenate([lo, z], axis=1))

    acc_h, acc_l = merge(acc_parts)
    jrk_h, jrk_l = merge(jerk_parts)
    return acc_h, acc_l, jrk_h, jrk_l


# ---- adaptive global timestep in ds (the ops/adaptive.py analogue) ----
#
# The fixed-dt ds steps take a host-built scal block whose dt columns are
# exact f64->ds splits. An adaptive rollout picks dt INSIDE the compiled
# scan (ops/adaptive.py's design: zero host round-trips), so the block's
# dt-dependent columns must be rebuilt from a TRACED float32 dt. dt
# itself is exact (hi=dt, lo=0); derived powers are error-free ds
# products, so every coefficient stays ds-grade. The dt CRITERION runs
# in plain f32 on the hi planes — it only picks dt, and the hi plane
# carries the full f32-visible state (VERDICT r3 item 2).

_DS_SIXTH = (jnp.float32(1.0 / 6.0),
             jnp.float32(1.0 / 6.0 - float(jnp.float32(1.0 / 6.0))))


def ds_scal_with_dt(base, dt, *, integrator: str = "euler"):
    """Rebuild a `_scal_ds*` block's dt-dependent columns from a traced
    float32 `dt`. `base` comes from the matching `_scal_ds*` builder
    (its eps²/damping splits stay host-exact)."""
    z = jnp.zeros((), jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)
    out = base.at[0, 0].set(dt).at[1, 0].set(z)
    if integrator == "euler":
        return out
    out = out.at[0, 3].set(dt * 0.5).at[1, 3].set(z)  # dt/2: exact
    if integrator == "leapfrog":
        return out
    # hermite: cols 4..6 = dt²/2, dt³/6, dt²/12
    d2h, d2l = _two_prod(dt, dt)           # exact dt²
    dt2_2 = (d2h * 0.5, d2l * 0.5)         # /2 exact
    dt3 = ds_mul((d2h, d2l), (dt, z))
    dt3_6 = ds_mul(dt3, _DS_SIXTH)
    dt2_12 = ds_mul(dt2_2, _DS_SIXTH)
    for c, (vh, vl) in ((4, dt2_2), (5, dt3_6), (6, dt2_12)):
        out = out.at[0, c].set(vh).at[1, c].set(vl)
    return out


def make_ds_adaptive_rollout(*, integrator: str, softening, damping,
                             eta: float, dt_min: float, dt_max: float,
                             steps: int, tile_i: int = DS_TILE_I,
                             tile_j: int | None = None,
                             interpret: bool = False, sym: bool = False,
                             block_cap: int | None = None):
    """Jitted `(ph, pl, vh, vl) -> (ph, pl, vh, vl, stats)` ds adaptive
    rollout. stats is a (4,) f32 [t_total, dt_last, dt_lo, dt_hi] like
    ops/adaptive.py. Criteria match the f32 path: euler/leapfrog use
    eta·sqrt(eps/max|a|), hermite Aarseth's eta·min|a|/|j| — computed in
    f32 from the hi planes (an O(N²) f32 evaluation next to the ~20×
    ds step is a few percent). Leapfrog here is the fused DKD kernel
    with a per-step dt (dt is chosen before the step from the
    start-of-step forces, so the DKD form needs no carried accel)."""
    from nbody_tpu.ops.adaptive import accel_timestep, aarseth_timestep
    from nbody_tpu.ops.pallas_kernel import (
        compute_accel_jerk_pallas,
        compute_accel_pallas,
    )

    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    base = {"euler": _scal_ds, "leapfrog": _scal_ds_leapfrog,
            "hermite": _scal_ds_hermite}[integrator](0.0, softening, damping)

    def stats_init():
        return jnp.asarray([0.0, 0.0, jnp.inf, 0.0], jnp.float32)

    def stats_update(stats, dt):
        return jnp.stack([stats[0] + dt, dt,
                          jnp.minimum(stats[2], dt),
                          jnp.maximum(stats[3], dt)])

    def ds_step(ph, pl, vh, vl, scal):
        if integrator == "hermite":
            return nbody_step_pallas_ds_hermite(
                ph, pl, vh, vl, scal, tile_i=tile_i, tile_j=tile_j,
                interpret=interpret, sym=sym, block_cap=block_cap)
        if integrator == "leapfrog":
            return nbody_step_pallas_ds_leapfrog(
                ph, pl, vh, vl, scal, tile_i=tile_i, tile_j=tile_j,
                interpret=interpret)
        if sym:
            return nbody_step_pallas_ds_sym_blocked(
                ph, pl, vh, vl, scal, tile_i=tile_i, tile_j=tile_j,
                interpret=interpret,
                block_cap=DS_SYM_MAX_N if block_cap is None else block_cap)
        return nbody_step_pallas_ds(ph, pl, vh, vl, scal, tile_i=tile_i,
                                    tile_j=tile_j, interpret=interpret)

    def body(state, _):
        ph, pl, vh, vl, stats = state
        if integrator == "hermite":
            acc, jerk = compute_accel_jerk_pallas(
                ph, vh, ph, vh, softening, interpret=interpret)
            dt = aarseth_timestep(acc, jerk, eta, dt_min, dt_max)
        else:
            acc = compute_accel_pallas(ph, ph, softening,
                                       interpret=interpret)
            dt = accel_timestep(acc, softening, eta, dt_min, dt_max)
        scal = ds_scal_with_dt(base, dt, integrator=integrator)
        ph, pl, vh, vl = ds_step(ph, pl, vh, vl, scal)
        return (ph, pl, vh, vl, stats_update(stats, dt)), None

    def run(ph, pl, vh, vl):
        init = (ph, pl, vh, vl, stats_init())
        (ph, pl, vh, vl, stats), _ = jax.lax.scan(body, init, None,
                                                  length=steps)
        return ph, pl, vh, vl, stats

    return jax.jit(run, donate_argnums=(0, 1, 2, 3))
