"""Newton's-third-law Pallas kernel: each pair computed ONCE.

The production vpu kernel (ops/pallas_kernel.py) evaluates the interaction
matrix twice — body i accumulates m_j/r³·d and, in a later grid step, body
j independently recomputes the same d, r², rsqrt to accumulate m_i/r³·(−d).
The reference's CUDA kernel does the same (one thread per body,
/root/reference/src/nbody/bodysystemcuda.cu:125-146): on a GPU the reaction
write would be a cross-thread scatter. On a single-core TPU the grid is
sequential, so the reaction can be ACCUMULATED IN VMEM with no contention
at all — this kernel walks only the strict upper triangle of the pair-block
matrix and emits both sides of every pair:

* grid: 1-D over live (64-row i-block, tile_j-col j-block) pairs with
  j-block ≥ the block containing the row (scalar-prefetch row/col tables —
  the megablox pattern ops/p3m_kernel.py uses); no wasted grid steps,
* i-side: identical to the production kernel — (64, 128) register-resident
  accumulators, lane-reduced once per row,
* j-side (the new half): reaction −m_i/r³·d reduced 64→8 sublane-rows with
  seven explicit vreg adds (NO cross-lane relayout — the pattern the p3m
  lane-scratch experiment measured 3× slower is avoided) and accumulated
  into a persistent (8, n_pad) f32 VMEM scratch per coordinate; summed 8→1
  and emitted once at the final grid step,
* the diagonal-straddling block (exactly the first block of each row) runs
  a masked copy of the chunk loop (keep = j_global > i_global, which also
  drops the self pair); every other block is mask-free by construction
  (tile_j is a multiple of tile_i, so col > first-col ⇒ all j > all i).

Shared per pair: d (3), r²+ε² (4), rsqrt, inv³ (2) — the expensive half —
plus 4 ops per side instead of 2×(shared+side). The cost is the (8, n_pad)
reaction scratch: 96·n_pad bytes of VMEM, which caps the single-triangle
kernel at N ≤ SYM_MAX_N — covering the official bench shape (N=65536,
BASELINE configs[1]). Larger N uses the BLOCKWISE composition below
(compute_accel_symmetric_blocked): per-superblock self triangles plus
mask-free cross rectangles whose reaction scratch spans one block —
measured 301.7–327.4 G int/s at N=131k–1M vs the one-sided kernel's flat
~222 (1.36–1.47×, PARITY.md).

Exact fp32, same math as the one-sided kernel — results agree to
reduction-order rounding (each body's sum is split into an i-side partial
and a reaction partial added at the end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.pallas_kernel import LANES, _ix, _round_up

TI = 64            # i-rows per block (register-resident accumulators)
SUB = 8            # f32 sublanes per vreg: the reaction's deferred depth
SYM_MAX_N = 65536  # (8, n_pad) f32 reaction scratch ×3 must fit VMEM
# measured champion on v5e at N=65536 (scripts/tpu_r3_symmetric.py):
# (ti, tj) -> G int/s: (64,4096) 285.3 | (64,2048) 272.9 | (64,8192) 277.9
# (64,16384) 252.2 | (128,4096) 262.8 | (256,4096) 223.8 — ti=64 keeps the
# i-accumulators register-resident (as in the one-sided kernel); tj=4096
# balances diagonal-block mask waste (~tj/2 lanes per row) against
# grid-step overhead. One-sided champion on the same day: 221.2.
DEFAULT_TILE_J_SYM = 4096
# blocked composition (N > SYM_MAX_N): the mask-free cross rectangles
# dominate and favor a wider stream — measured (scripts/tpu_r3_sym_blocked
# .py): tj=8192 301.7/315.3 G int/s vs tj=4096 300.4/309.0 at N=131072/
# 262144 (one-sided same day: 221.2/221.7)
DEFAULT_TILE_J_SYM_BLOCKED = 8192


def sym_default_dispatch(n: int):
    """Measured default ``(block_cap, tile_j)`` for the sym force step at
    N bodies.

    In the top half of the single-triangle range (SYM_MAX_N/2 < N ≤
    SYM_MAX_N) the blocked composition at ``block_cap = SYM_MAX_N // 2``
    BEATS the single triangle on its own turf: half the pairs move into
    mask-free cross rectangles that carry none of the triangle-walk
    machinery (measured at the official bench shape N=65536:
    288.7 G int/s at (cap=32768, tj=4096) vs the single triangle's 285.3
    — scripts/tpu_r4_sym_bench_shape.py, 3 rolls). Above SYM_MAX_N the
    full cap wins (cap=65536/tj=8192: 301.9 at 131072, 327.6 at 1M vs
    32768's 301.8/325.7 — scripts/tpu_r4_sym_cap.py), so the half cap is
    strictly a top-of-triangle-range optimization. At or below the half
    cap the single triangle is the only shape (N ≤ cap delegates).

    Reads the module attributes at call time so tests that shrink
    SYM_MAX_N see a consistently scaled policy.

    Euler-force-family only: the same half-cap swap measured 1.0-2.8%
    SLOWER for hermite f32 / ds euler / ds hermite at the top of their
    triangle ranges (scripts/tpu_r4_halfcap_families.py) — heavier
    per-pair kernels amortize the walk tax the cross rectangles shed —
    so the accel+jerk and ds dispatches keep their triangle caps.
    """
    half = SYM_MAX_N // 2
    if half < n <= SYM_MAX_N and DEFAULT_TILE_J_SYM * 2 <= half:
        # the guard keeps shrunken test caps on the plain delegation path
        # (the half cap only exists where the default tile fits it)
        return half, DEFAULT_TILE_J_SYM
    if n <= SYM_MAX_N:
        return SYM_MAX_N, DEFAULT_TILE_J_SYM
    return SYM_MAX_N, DEFAULT_TILE_J_SYM_BLOCKED


def _sym_kernel(meta_ref, rows_ref, cols_ref, first_ref, last_ref,
                posi_ref, post_ref, acc_ref, react_ref,
                ax, ay, az, rx, ry, rz, *, tile_i: int, tile_j: int,
                n_steps: int):
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

    xi = posi_ref[:, 0:1]  # (TI, 1)
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    j_base = cols_ref[p] * tile_j

    def chunk_loop(masked: bool):
        if masked:
            ig = rows_ref[p] * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, 1), 0)
        for k in range(tile_j // LANES):
            sl = slice(k * LANES, (k + 1) * LANES)
            xj = post_ref[0:1, sl]  # (1, LANES)
            yj = post_ref[1:2, sl]
            zj = post_ref[2:3, sl]
            mj = post_ref[3:4, sl]
            dx = xj - xi  # (TI, LANES)
            dy = yj - yi
            dz = zj - zi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            inv = jax.lax.rsqrt(r2)
            c = inv * inv * inv
            s = mj * c  # accel of i per unit of d
            t = mi * c  # reaction magnitude on j
            if masked:
                jg = j_base + k * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                keep = jg > ig  # strict upper triangle (drops self pair)
                s = jnp.where(keep, s, 0.0)
                t = jnp.where(keep, t, 0.0)
            ax[:] += s * dx
            ay[:] += s * dy
            az[:] += s * dz
            # reaction: reduce TI->SUB rows with explicit slice adds (plain
            # vreg adds, no relayout), then RMW the scratch columns
            for rref, d in ((rx, dx), (ry, dy), (rz, dz)):
                u = t * d
                r8 = u[0:SUB]
                for q in range(1, tile_i // SUB):
                    r8 = r8 + u[q * SUB:(q + 1) * SUB]
                idx = (slice(0, SUB), pl.ds(j_base + k * LANES, LANES))
                rref[idx] = rref[idx] - r8

    @pl.when(first == 1)
    def _diag_block():
        chunk_loop(masked=True)

    @pl.when(first == 0)
    def _off_diag_block():
        chunk_loop(masked=False)

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


def _pair_tables(n_pad: int, tile_i: int, tile_j: int):
    """Static upper-triangle worklist: (rows, cols, first, last) int32."""
    nrows = n_pad // tile_i
    njt = n_pad // tile_j
    rows, cols, first, last = [], [], [], []
    for r in range(nrows):
        jb0 = (r * tile_i) // tile_j
        for jb in range(jb0, njt):
            rows.append(r)
            cols.append(jb)
            first.append(1 if jb == jb0 else 0)
            last.append(1 if jb == njt - 1 else 0)
    as_i32 = functools.partial(np.asarray, dtype=np.int32)
    return as_i32(rows), as_i32(cols), as_i32(first), as_i32(last)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_symmetric(pos, softening, *, tile_i: int = TI,
                            tile_j: int = DEFAULT_TILE_J_SYM,
                            interpret: bool = False):
    """(N, 4) -> (N, 3) accelerations of the set on itself, each pair
    evaluated once (see module docstring). N ≤ SYM_MAX_N."""
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    n = pos.shape[0]
    if n > SYM_MAX_N:
        raise ValueError(
            f"symmetric kernel holds an (8, N) reaction scratch in VMEM: "
            f"N={n} > {SYM_MAX_N}; use compute_accel_symmetric_blocked")
    f32 = jnp.float32
    tile_j = min(tile_j, _round_up(n, LANES))
    if tile_i % SUB:
        raise ValueError(f"tile_i must be a multiple of {SUB}, got {tile_i}")
    if tile_j % LANES:
        # the chunk loop walks tile_j in LANES-wide slices; a non-multiple
        # would silently skip the remainder lanes
        raise ValueError(f"tile_j must be a multiple of {LANES}, got {tile_j}")
    if tile_j % tile_i:
        raise ValueError(
            f"tile_j must be a multiple of tile_i, got {tile_i}, {tile_j}")
    n_pad = _round_up(n, tile_j)
    pos_p = jnp.pad(pos.astype(f32), ((0, n_pad - n), (0, 0)))
    post = pos_p.T  # (4, n_pad), like the one-sided kernel

    rows, cols, first, last = _pair_tables(n_pad, tile_i, tile_j)
    n_steps = int(rows.shape[0])
    meta = jnp.asarray(softening, f32).reshape(1) ** 2

    acc, react = pl.pallas_call(
        functools.partial(_sym_kernel, tile_i=tile_i, tile_j=tile_j,
                          n_steps=n_steps),
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
                pl.BlockSpec((3, n_pad),
                             lambda p, meta, rows, cols, first, last:
                             _ix(0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((SUB, n_pad), f32),
                pltpu.VMEM((SUB, n_pad), f32),
                pltpu.VMEM((SUB, n_pad), f32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 4), f32),
            jax.ShapeDtypeStruct((3, n_pad), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the grid is a sequential triangle walk: rows share the
            # reaction scratch, so no dimension is parallelizable
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * n_pad,  # ~half the one-sided 20/pair ×2 sides
            bytes_accessed=n_steps * (tile_i + tile_j) * 16,
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(meta, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(first),
      jnp.asarray(last), pos_p, post)

    return acc[:n, :3] + react[:, :n].T


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def nbody_step_symmetric(pos, vel, dt, softening, damping, *, tile_i: int = TI,
                         tile_j: int = DEFAULT_TILE_J_SYM,
                         interpret: bool = False):
    """One damped semi-implicit Euler step via the symmetric kernel.

    Integration runs at the XLA level: it is O(N) next to the O(N²/2)
    kernel, and fusing it would force the row-finalize to wait for
    reactions that only complete at the last grid step."""
    from nbody_tpu.ops.reference import integrate

    acc = compute_accel_symmetric(pos, softening, tile_i=tile_i,
                                  tile_j=tile_j, interpret=interpret)
    return integrate(pos, vel, acc, dt, damping)


# ---- blockwise composition: the triangle saving for N > SYM_MAX_N ----
#
# The (8, n_pad)×3 reaction scratch caps the triangle kernel at
# N ≤ SYM_MAX_N. Above it, decompose the global pair triangle into
# superblocks of B ≤ SYM_MAX_N bodies:
#
#   triangle(N) = Σ_a triangle(block a)                       [self kernel]
#               + Σ_{a<b} rectangle(block a × block b)        [cross kernel]
#
# The cross kernel below is the triangle kernel stripped of its diagonal
# machinery: a mask-free 2-D (i-rows, j-cols) grid over one B×B block
# pair, evaluating each (i, j) pair ONCE and emitting the action on the
# i-rows plus the accumulated reaction −m_i/r³·d on the j-set. Its
# reaction scratch spans only B, so VMEM is exactly the single-block
# budget regardless of N. Every cross launch shares one compiled shape
# (one Mosaic compile for all k·(k−1)/2 block pairs), the self kernel a
# second; the O(N) partial-sum composition happens at the XLA level.
#
# Total pair evaluations stay N²/2 — the full Newton's-third-law saving
# at any N, where the reference (and the one-sided kernel) evaluate N².


def _sym_cross_kernel(meta_ref, posi_ref, post_ref, acc_ref, react_ref,
                      ax, ay, az, rx, ry, rz, *, tile_i: int, tile_j: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    eps2 = meta_ref[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_reaction():
        zeros = jnp.zeros_like(rx)
        rx[:] = zeros
        ry[:] = zeros
        rz[:] = zeros

    @pl.when(j == 0)
    def _zero_row_acc():
        zeros = jnp.zeros_like(ax)
        ax[:] = zeros
        ay[:] = zeros
        az[:] = zeros

    xi = posi_ref[:, 0:1]  # (TI, 1)
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    j_base = j * tile_j

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        xj = post_ref[0:1, sl]  # (1, LANES)
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]
        dx = xj - xi  # (TI, LANES)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        c = inv * inv * inv
        s = mj * c  # accel of i per unit of d
        t = mi * c  # reaction magnitude on j
        ax[:] += s * dx
        ay[:] += s * dy
        az[:] += s * dz
        for rref, d in ((rx, dx), (ry, dy), (rz, dz)):
            u = t * d
            r8 = u[0:SUB]
            for q in range(1, tile_i // SUB):
                r8 = r8 + u[q * SUB:(q + 1) * SUB]
            idx = (slice(0, SUB), pl.ds(j_base + k * LANES, LANES))
            rref[idx] = rref[idx] - r8

    @pl.when(j == nj - 1)
    def _finalize_row():
        acc_ref[:, 0:1] = jnp.sum(ax[:], axis=1, keepdims=True)
        acc_ref[:, 1:2] = jnp.sum(ay[:], axis=1, keepdims=True)
        acc_ref[:, 2:3] = jnp.sum(az[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1, j == nj - 1))
    def _emit_reaction():
        for c_idx, rref in enumerate((rx, ry, rz)):
            v = rref[0:1, :]
            for q in range(1, SUB):
                v = v + rref[q:q + 1, :]
            react_ref[c_idx:c_idx + 1, :] = v


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def _sym_cross(posi, postT, softening, *, tile_i: int, tile_j: int,
               interpret: bool = False):
    """One Bi×Bj cross block pair: returns (acc_i (Bi, 4), react_j (3, Bj)).
    Inputs pre-padded to tile multiples: posi (Bi, 4) AoS, postT (4, Bj)
    transposed. The two sets may differ in length (the sharded-sym
    antipodal split runs half-shard i-sets against full-shard j-sets)."""
    f32 = jnp.float32
    bi = posi.shape[0]
    bj = postT.shape[1]
    meta = jnp.asarray(softening, f32).reshape(1) ** 2
    acc, react = pl.pallas_call(
        functools.partial(_sym_cross_kernel, tile_i=tile_i, tile_j=tile_j),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bi // tile_i, bj // tile_j),
            in_specs=[
                pl.BlockSpec((tile_i, 4), lambda i, j, meta: _ix(i, 0)),
                pl.BlockSpec((4, tile_j), lambda i, j, meta: _ix(0, j)),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 4), lambda i, j, meta: _ix(i, 0)),
                pl.BlockSpec((3, bj), lambda i, j, meta: _ix(0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((tile_i, LANES), f32),
                pltpu.VMEM((SUB, bj), f32),
                pltpu.VMEM((SUB, bj), f32),
                pltpu.VMEM((SUB, bj), f32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bi, 4), f32),
            jax.ShapeDtypeStruct((3, bj), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            # rows share the reaction scratch -> sequential walk
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=28 * bi * bj,
            bytes_accessed=(bi // tile_i) * (bj // tile_j)
            * (tile_i + tile_j) * 16,
            transcendentals=bi * bj,
        ),
        interpret=interpret,
    )(meta, posi, postT)
    return acc, react


def sym_blocking(n: int, tile_j: int = DEFAULT_TILE_J_SYM,
                 block_cap: int = SYM_MAX_N):
    """(k, B): the superblock count and size the blocked path uses for N
    bodies — the fewest blocks with B ≤ block_cap, B a tile_j multiple.
    The cap is honored even when tile_j does not divide it: blocks size
    against the largest tile_j multiple under the cap, so the VMEM
    budget the cap encodes is never exceeded by tile rounding."""
    cap_t = (block_cap // tile_j) * tile_j
    if cap_t <= 0:
        raise ValueError(
            f"blocked sym needs tile_j <= block_cap: got tile_j={tile_j}, "
            f"block_cap={block_cap}")
    k = -(-n // cap_t)
    return k, _round_up(-(-n // k), tile_j)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def compute_accel_symmetric_blocked(pos, softening, *, tile_i: int = TI,
                                    tile_j: int = DEFAULT_TILE_J_SYM,
                                    interpret: bool = False,
                                    block_cap: int = SYM_MAX_N):
    """(N, 4) -> (N, 3) accelerations, each pair evaluated once, any N.

    N ≤ SYM_MAX_N delegates to the single-triangle kernel; above it the
    blockwise composition runs k self launches + k(k-1)/2 cross launches
    (two compiled kernels total) under this one jit. Zero-mass padding
    rounds N up to k·B (≤ tile_j−1 bodies per block, exact for
    power-of-two N)."""
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    n = pos.shape[0]
    if n <= block_cap:
        return compute_accel_symmetric(pos, softening, tile_i=tile_i,
                                       tile_j=tile_j, interpret=interpret)
    f32 = jnp.float32
    if tile_i % SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {SUB} | tile_i, {LANES} | tile_j and tile_i | tile_j; "
            f"got ({tile_i}, {tile_j})")
    k, blk = sym_blocking(n, tile_j, block_cap)
    if tile_j * 2 > blk:
        # a j-stream as wide as a LARGE block leaves the cross kernel a
        # single-grid-step program whose fused zero+loop+finalize blows
        # the Mosaic scoped-vmem stack (measured: 22.45M > 16M at
        # blk=tj=16384). Clamp to the widest tile that divides the block
        # at <= blk/2; tiny blocks with no such tile compile fine as
        # single-step programs and are allowed through.
        import math

        base = LANES * tile_i // math.gcd(LANES, tile_i)
        fitted = (blk // 2 // base) * base
        while fitted > base and blk % fitted:
            fitted -= base
        if fitted >= base and blk % fitted == 0:
            tile_j = fitted
        elif blk > 4096:
            raise ValueError(
                f"blocked sym needs tile_j <= block/2: got tile_j={tile_j},"
                f" block={blk} (use a smaller tile_j)")
        else:
            tile_j = blk
    n_pad = k * blk
    pos_p = jnp.pad(pos.astype(f32), ((0, n_pad - n), (0, 0)))
    blocks = [pos_p[a * blk:(a + 1) * blk] for a in range(k)]
    blocksT = [b.T for b in blocks]

    # per-block partial sums; the Python loops unroll under jit into a
    # static launch schedule (XLA runs them back to back on-device)
    contrib = [
        [compute_accel_symmetric(blocks[a], softening, tile_i=tile_i,
                                 tile_j=tile_j, interpret=interpret)]
        for a in range(k)
    ]
    for a in range(k):
        for b in range(a + 1, k):
            acc_i, react_j = _sym_cross(blocks[a], blocksT[b], softening,
                                        tile_i=tile_i, tile_j=tile_j,
                                        interpret=interpret)
            contrib[a].append(acc_i[:, :3])
            contrib[b].append(react_j.T)
    acc = jnp.concatenate(
        [functools.reduce(jnp.add, parts) for parts in contrib])
    return acc[:n]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def nbody_step_symmetric_blocked(pos, vel, dt, softening, damping, *,
                                 tile_i: int = TI,
                                 tile_j: int = DEFAULT_TILE_J_SYM,
                                 interpret: bool = False,
                                 block_cap: int = SYM_MAX_N):
    """One damped semi-implicit Euler step via the blocked symmetric
    composition — the any-N form of nbody_step_symmetric."""
    from nbody_tpu.ops.reference import integrate

    acc = compute_accel_symmetric_blocked(pos, softening, tile_i=tile_i,
                                          tile_j=tile_j, interpret=interpret,
                                          block_cap=block_cap)
    return integrate(pos, vel, acc, dt, damping)


# ---- Newton's-third-law accel+jerk (the f32 Hermite force evaluation) ----
#
# Same triangle walk, emitting acc AND jerk both ways: acc via the
# mass-folded s/t scalings, jerk via the mass-free bracket
# q = dv/r³ − 3(d·dv)d/r⁵, which is antisymmetric under i↔j like the
# force (d→−d, dv→−dv, d·dv invariant), so the reaction is −m_i·q.
# 6 reaction scratches (acc xyz + jerk xyz) cap it at N ≤ AJ_SYM_MAX_N.

AJ_SYM_MAX_N = 32768
# measured on v5e at N=16384, hermite STEP rate (= 2 force evals/step;
# one-sided aj champion (32,16384) same day: 51.63 G int/s): sym (64, tj)
# tj=1024 -> 54.58, tj=2048 -> 54.96, tj=4096 -> 53.47 — only **1.06x**:
# unlike the force-only kernel (1.29x) and the ds kernels (1.36x), the
# f32 aj reaction runs SIX reduce+RMW chains per chunk against relatively
# cheap shared math, eating most of the triangle saving. Kept as the
# default under the cap because it is still faster at identical accuracy
# (one-step vs one-sided: 2.4e-7), but the honest gain is marginal.
AJ_SYM_TILE_J = 2048


def _aj_sym_cross_kernel(meta_ref, posi_ref, veli_ref, post_ref, velt_ref,
                         acc_ref, jerk_ref, ra_ref, rj_ref,
                         ax, ay, az, gx, gy, gz,
                         rax, ray, raz, rjx, rjy, rjz,
                         *, tile_i: int, tile_j: int):
    """Mask-free accel+jerk over one Bi×Bj cross block pair, each (i, j)
    pair ONCE: the _sym_cross_kernel pattern extended with the jerk
    bracket of _aj_sym_kernel (q is antisymmetric under i↔j, so the jerk
    reaction is −m_i·q, accumulated like the force reaction)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    eps2 = meta_ref[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_reaction():
        zeros = jnp.zeros_like(rax)
        for r in (rax, ray, raz, rjx, rjy, rjz):
            r[:] = zeros

    @pl.when(j == 0)
    def _zero_row_acc():
        zeros = jnp.zeros_like(ax)
        for r in (ax, ay, az, gx, gy, gz):
            r[:, :] = zeros

    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    vxi = veli_ref[:, 0:1]
    vyi = veli_ref[:, 1:2]
    vzi = veli_ref[:, 2:3]
    j_base = j * tile_j

    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        dx = post_ref[0:1, sl] - xi
        dy = post_ref[1:2, sl] - yi
        dz = post_ref[2:3, sl] - zi
        dvx = velt_ref[0:1, sl] - vxi
        dvy = velt_ref[1:2, sl] - vyi
        dvz = velt_ref[2:3, sl] - vzi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        inv2 = inv * inv
        inv3 = inv2 * inv
        rv = dx * dvx + dy * dvy + dz * dvz
        c3p = 3.0 * rv * inv2 * inv3  # 3 (d·dv)/r⁵, mass-free
        mj = post_ref[3:4, sl]
        s = mj * inv3
        t = mi * inv3
        qx = inv3 * dvx - c3p * dx
        qy = inv3 * dvy - c3p * dy
        qz = inv3 * dvz - c3p * dz
        ax[:] += s * dx
        ay[:] += s * dy
        az[:] += s * dz
        gx[:] += mj * qx
        gy[:] += mj * qy
        gz[:] += mj * qz
        for rref, u in ((rax, t * dx), (ray, t * dy), (raz, t * dz),
                        (rjx, mi * qx), (rjy, mi * qy), (rjz, mi * qz)):
            r8 = u[0:SUB]
            for q_ in range(1, tile_i // SUB):
                r8 = r8 + u[q_ * SUB:(q_ + 1) * SUB]
            idx = (slice(0, SUB), pl.ds(j_base + k * LANES, LANES))
            rref[idx] = rref[idx] - r8

    @pl.when(j == nj - 1)
    def _finalize_row():
        for c, a in enumerate((ax, ay, az)):
            acc_ref[:, c:c + 1] = jnp.sum(a[:], axis=1, keepdims=True)
        for c, g in enumerate((gx, gy, gz)):
            jerk_ref[:, c:c + 1] = jnp.sum(g[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])
        jerk_ref[:, 3:4] = jnp.zeros_like(jerk_ref[:, 3:4])

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1, j == nj - 1))
    def _emit_reaction():
        for c_idx, (rref, oref) in enumerate((
                (rax, ra_ref), (ray, ra_ref), (raz, ra_ref),
                (rjx, rj_ref), (rjy, rj_ref), (rjz, rj_ref))):
            v = rref[0:1, :]
            for q_ in range(1, SUB):
                v = v + rref[q_:q_ + 1, :]
            oref[c_idx % 3:c_idx % 3 + 1, :] = v


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def _aj_sym_cross(posi, veli, postT, veltT, softening, *, tile_i: int,
                  tile_j: int, interpret: bool = False):
    """One Bi×Bj accel+jerk cross block pair: returns (acc_i (Bi, 4),
    jerk_i (Bi, 4), react_acc (3, Bj), react_jerk (3, Bj)). Inputs
    pre-padded to tile multiples; i-set AoS, j-set transposed."""
    f32 = jnp.float32
    bi = posi.shape[0]
    bj = postT.shape[1]
    meta = jnp.asarray(softening, f32).reshape(1) ** 2
    row_spec = pl.BlockSpec((tile_i, 4), lambda i, j, meta: _ix(i, 0))
    col_spec = pl.BlockSpec((4, tile_j), lambda i, j, meta: _ix(0, j))
    full_spec = pl.BlockSpec((3, bj), lambda i, j, meta: _ix(0, 0))
    return pl.pallas_call(
        functools.partial(_aj_sym_cross_kernel, tile_i=tile_i,
                          tile_j=tile_j),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bi // tile_i, bj // tile_j),
            in_specs=[row_spec, row_spec, col_spec, col_spec],
            out_specs=[row_spec, row_spec, full_spec, full_spec],
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(6)]
                + [pltpu.VMEM((SUB, bj), f32) for _ in range(6)]
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
            flops=60 * bi * bj,
            bytes_accessed=(bi // tile_i) * (bj // tile_j)
            * (tile_i + tile_j) * 32,
            transcendentals=bi * bj,
        ),
        interpret=interpret,
    )(meta, posi, veli, postT, veltT)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret",
                                             "block_cap"))
def compute_accel_jerk_symmetric_blocked(pos, vel, softening, *,
                                         tile_i: int = TI,
                                         tile_j: int = AJ_SYM_TILE_J,
                                         interpret: bool = False,
                                         block_cap: int = AJ_SYM_MAX_N):
    """(acc, jerk), each (N, 3), each pair evaluated once, ANY N — the
    blockwise composition of the accel+jerk triangle (self triangles +
    mask-free cross rectangles whose 6 reaction scratches span one block;
    the compute_accel_symmetric_blocked pattern). N ≤ block_cap delegates
    to the single-triangle kernel."""
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    n = pos.shape[0]
    if n <= block_cap:
        return compute_accel_jerk_symmetric(pos, vel, softening,
                                            tile_i=tile_i, tile_j=tile_j,
                                            interpret=interpret)
    f32 = jnp.float32
    if tile_i % SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {SUB} | tile_i, {LANES} | tile_j and tile_i | tile_j; "
            f"got ({tile_i}, {tile_j})")
    k, blk = sym_blocking(n, tile_j, block_cap)
    if tile_j * 2 > blk:
        # the measured Mosaic scoped-vmem hazard of the force path (a
        # block-wide j-stream leaves a single-grid-step fused program):
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
                f"blocked sym aj needs tile_j <= block/2: got "
                f"tile_j={tile_j}, block={blk} (use a smaller tile_j)")
        else:
            tile_j = blk
    n_pad = k * blk

    def pad(a):
        return jnp.pad(a.astype(f32), ((0, n_pad - n), (0, 0)))

    pos_p, vel_p = pad(pos), pad(vel)
    pblocks = [pos_p[a * blk:(a + 1) * blk] for a in range(k)]
    vblocks = [vel_p[a * blk:(a + 1) * blk] for a in range(k)]

    acc_parts = [[] for _ in range(k)]
    jerk_parts = [[] for _ in range(k)]
    for a in range(k):
        sa, sj = compute_accel_jerk_symmetric(
            pblocks[a], vblocks[a], softening, tile_i=tile_i,
            tile_j=tile_j, interpret=interpret)
        acc_parts[a].append(sa)
        jerk_parts[a].append(sj)
    for a in range(k):
        for b in range(a + 1, k):
            acc_i, jerk_i, r_a, r_j = _aj_sym_cross(
                pblocks[a], vblocks[a], pblocks[b].T, vblocks[b].T,
                softening, tile_i=tile_i, tile_j=tile_j,
                interpret=interpret)
            acc_parts[a].append(acc_i[:, :3])
            jerk_parts[a].append(jerk_i[:, :3])
            acc_parts[b].append(r_a.T)
            jerk_parts[b].append(r_j.T)
    acc = jnp.concatenate(
        [functools.reduce(jnp.add, parts) for parts in acc_parts])
    jerk = jnp.concatenate(
        [functools.reduce(jnp.add, parts) for parts in jerk_parts])
    return acc[:n], jerk[:n]


def _aj_sym_kernel(meta_ref, rows_ref, cols_ref, first_ref, last_ref,
                   posi_ref, veli_ref, post_ref, velt_ref,
                   acc_ref, jerk_ref, ra_ref, rj_ref,
                   ax, ay, az, gx, gy, gz,
                   rax, ray, raz, rjx, rjy, rjz,
                   *, tile_i: int, tile_j: int, n_steps: int):
    p = pl.program_id(0)
    eps2 = meta_ref[0]
    first = first_ref[p]

    @pl.when(p == 0)
    def _zero_reaction():
        zeros = jnp.zeros_like(rax)
        for r in (rax, ray, raz, rjx, rjy, rjz):
            r[:] = zeros

    @pl.when(first == 1)
    def _zero_row_acc():
        zeros = jnp.zeros_like(ax)
        for r in (ax, ay, az, gx, gy, gz):
            r[:, :] = zeros

    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    vxi = veli_ref[:, 0:1]
    vyi = veli_ref[:, 1:2]
    vzi = veli_ref[:, 2:3]
    j_base = cols_ref[p] * tile_j

    def chunk_loop(masked: bool):
        if masked:
            ig = rows_ref[p] * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, 1), 0)
        for k in range(tile_j // LANES):
            sl = slice(k * LANES, (k + 1) * LANES)
            dx = post_ref[0:1, sl] - xi
            dy = post_ref[1:2, sl] - yi
            dz = post_ref[2:3, sl] - zi
            dvx = velt_ref[0:1, sl] - vxi
            dvy = velt_ref[1:2, sl] - vyi
            dvz = velt_ref[2:3, sl] - vzi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            inv = jax.lax.rsqrt(r2)
            inv2 = inv * inv
            inv3 = inv2 * inv
            rv = dx * dvx + dy * dvy + dz * dvz
            c3p = 3.0 * rv * inv2 * inv3  # 3 (d·dv)/r⁵, mass-free
            mj = post_ref[3:4, sl]
            mik = mi
            if masked:
                jg = j_base + k * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                keep = jg > ig  # strict upper triangle (drops self pair)
                mj = jnp.where(keep, mj, 0.0)
                mik = jnp.where(keep, mik, 0.0)
            s = mj * inv3
            t = mik * inv3
            qx = inv3 * dvx - c3p * dx
            qy = inv3 * dvy - c3p * dy
            qz = inv3 * dvz - c3p * dz
            ax[:] += s * dx
            ay[:] += s * dy
            az[:] += s * dz
            gx[:] += mj * qx
            gy[:] += mj * qy
            gz[:] += mj * qz
            for rref, u in ((rax, t * dx), (ray, t * dy), (raz, t * dz),
                            (rjx, mik * qx), (rjy, mik * qy),
                            (rjz, mik * qz)):
                r8 = u[0:SUB]
                for q_ in range(1, tile_i // SUB):
                    r8 = r8 + u[q_ * SUB:(q_ + 1) * SUB]
                idx = (slice(0, SUB), pl.ds(j_base + k * LANES, LANES))
                rref[idx] = rref[idx] - r8

    @pl.when(first == 1)
    def _diag_block():
        chunk_loop(masked=True)

    @pl.when(first == 0)
    def _off_diag_block():
        chunk_loop(masked=False)

    @pl.when(last_ref[p] == 1)
    def _finalize_row():
        for c, a in enumerate((ax, ay, az)):
            acc_ref[:, c:c + 1] = jnp.sum(a[:], axis=1, keepdims=True)
        for c, g in enumerate((gx, gy, gz)):
            jerk_ref[:, c:c + 1] = jnp.sum(g[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])
        jerk_ref[:, 3:4] = jnp.zeros_like(jerk_ref[:, 3:4])

    @pl.when(p == n_steps - 1)
    def _emit_reaction():
        for c_idx, (rref, oref) in enumerate((
                (rax, ra_ref), (ray, ra_ref), (raz, ra_ref),
                (rjx, rj_ref), (rjy, rj_ref), (rjz, rj_ref))):
            v = rref[0:1, :]
            for q_ in range(1, SUB):
                v = v + rref[q_:q_ + 1, :]
            oref[c_idx % 3:c_idx % 3 + 1, :] = v


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_jerk_symmetric(pos, vel, softening, *, tile_i: int = TI,
                                 tile_j: int = AJ_SYM_TILE_J,
                                 interpret: bool = False):
    """(acc, jerk), each (N, 3), of the set on itself with each pair
    evaluated once — the Hermite force evaluation. N ≤ AJ_SYM_MAX_N.
    Drop-in for compute_accel_jerk_pallas in the self case."""
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    n = pos.shape[0]
    if n > AJ_SYM_MAX_N:
        raise ValueError(
            f"symmetric accel+jerk holds 6 (8, N) reaction scratches in "
            f"VMEM: N={n} > {AJ_SYM_MAX_N}; use the one-sided kernel")
    f32 = jnp.float32
    tile_j = min(tile_j, _round_up(n, LANES))
    if tile_i % SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"need {SUB} | tile_i, {LANES} | tile_j and tile_i | tile_j; "
            f"got ({tile_i}, {tile_j})")
    n_pad = _round_up(n, tile_j)

    def pad(a):
        return (jnp.pad(a.astype(f32), ((0, n_pad - n), (0, 0)))
                if n_pad != n else a.astype(f32))

    pos_p, vel_p = pad(pos), pad(vel)

    rows, cols, first, last = _pair_tables(n_pad, tile_i, tile_j)
    n_steps = int(rows.shape[0])
    meta = jnp.asarray(softening, f32).reshape(1) ** 2

    row_spec = pl.BlockSpec(
        (tile_i, 4),
        lambda p, meta, rows, cols, first, last: _ix(rows[p], 0))
    col_spec = pl.BlockSpec(
        (4, tile_j),
        lambda p, meta, rows, cols, first, last: _ix(0, cols[p]))
    full_spec = pl.BlockSpec(
        (3, n_pad), lambda p, meta, rows, cols, first, last: _ix(0, 0))

    acc, jerk, ra, rj = pl.pallas_call(
        functools.partial(_aj_sym_kernel, tile_i=tile_i, tile_j=tile_j,
                          n_steps=n_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=[row_spec, row_spec, col_spec, col_spec],
            out_specs=[row_spec, row_spec, full_spec, full_spec],
            scratch_shapes=(
                [pltpu.VMEM((tile_i, LANES), f32) for _ in range(6)]
                + [pltpu.VMEM((SUB, n_pad), f32) for _ in range(6)]
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
            flops=30 * n_pad * n_pad,
            bytes_accessed=n_steps * (tile_i + tile_j) * 32,
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(meta, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(first),
      jnp.asarray(last), pos_p, vel_p, pos_p.T, vel_p.T)

    return (acc[:n, :3] + ra[:, :n].T, jerk[:n, :3] + rj[:, :n].T)
