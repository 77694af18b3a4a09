"""Pallas TPU kernels: fused all-pairs force + integration.

TPU-first redesign of the reference's hot loop (the shared-memory-tiled CUDA
kernel, /root/reference/src/nbody/bodysystemcuda.cu:98-184 — behavior, not
code): instead of one thread per body with j-tiles staged through shared
memory, we tile the interaction matrix for the VPU's (8, 128) lanes:

* the grid is (i_blocks, j_blocks) with j innermost; an i-tile of TILE_I
  bodies stays resident while j-tiles stream through VMEM,
* per 128-lane chunk, the Plummer interaction is evaluated on (TILE_I, 128)
  vectors: dx = x_j[1,128] - x_i[TILE_I,1], r2 = |dx|^2 + eps^2,
  s = m_j * rsqrt(r2)^3, acc += s*dx — all VPU element-wise ops,
* accumulators live in VMEM scratch (persist across the sequential grid),
  zeroed at j==0 and lane-reduced at the final j-step, where the damped
  semi-implicit Euler update (v=(v+a*dt)*damping; p+=v*dt) is fused so a
  step never round-trips through HBM mid-computation — the analogue of the
  reference fusing integrateBodies with computeBodyAccel.

The kernels come in a general i-set-vs-j-set form: forces on `pos_i` due to
`pos_j`. That is exactly the shape the multi-chip step needs (each chip's
local body shard vs the all-gathered or ring-streamed global positions,
SURVEY.md §7), and the single-chip step is the special case pos_j == pos_i.

Layout: the i-side is AoS (M, 4) = [x,y,z,m]; the j-side is transposed
(4, N) so per-coordinate rows are contiguous 128-lane vectors (the O(N)
transpose happens outside the kernel, negligible vs the O(M*N) kernel).
dt/eps^2/damping arrive via SMEM so param changes don't trigger recompiles.

Sets are padded to tile multiples with zero-mass bodies, which exert zero
force — the reference's pad-to-256 trick (/root/reference/src/nbody/tipsy.cpp:111-122).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Measured sweet spot on v5e (scripts/tpu_perf_sweep.py + the r2/r3 tile
# sweeps): SMALL i-tiles with LARGE streamed j-tiles win — the champion
# (64, 32768) delta-times at ~220 G int/s vs ~210 G for (64, 8192) at
# N=65536 (r3 made it the DEFAULT; r2 had left 8192). Small ti shortens
# the per-grid-step dependency chain (3 accumulators of (ti,128) stay
# register-resident), big tj amortizes grid-step overhead; tj auto-clamps
# to N so small problems are unaffected, and tj=65536 exceeds the Mosaic
# program-size limit (r3 sweep).
DEFAULT_TILE_I = 64
DEFAULT_TILE_J = 32768

# experiment hook: override the mxu variant's matmul precision (None =
# production choice). See _mxu_accumulate_tile.
_MXU_PRECISION_OVERRIDE = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _accumulate_tile(posi_ref, post_ref, eps2, ax_ref, ay_ref, az_ref, tile_j,
                     lane_chunk=LANES):
    """Accumulate partial forces for one (TILE_I, TILE_J) block of pairs.

    lane_chunk sets how many j-lanes one unrolled iteration consumes (the
    accumulators are (TILE_I, lane_chunk)); wider chunks mean fewer slice
    ops and a shorter unrolled program for the same tile_j."""
    xi = posi_ref[:, 0:1]  # (TILE_I, 1)
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    for k in range(tile_j // lane_chunk):
        sl = slice(k * lane_chunk, (k + 1) * lane_chunk)
        xj = post_ref[0:1, sl]  # (1, lane_chunk)
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]
        dx = xj - xi  # (TILE_I, lane_chunk)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        s = mj * (inv * inv * inv)
        ax_ref[:] += s * dx
        ay_ref[:] += s * dy
        az_ref[:] += s * dz


def _step_kernel(scal_ref, posi_ref, veli_ref, post_ref, npos_ref, nvel_ref,
                 ax_ref, ay_ref, az_ref, *, tile_j: int, lane_chunk: int = LANES):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        ax_ref[:] = zeros
        ay_ref[:] = zeros
        az_ref[:] = zeros

    _accumulate_tile(posi_ref, post_ref, scal_ref[0, 1], ax_ref, ay_ref, az_ref,
                     tile_j, lane_chunk)

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


def _mxu_accumulate_tile(posi_ref, post_ref, eps2, acc4_ref,
                         tile_j, mxu_dtype):
    """MXU-hybrid partial-force accumulation for one (TILE_I, TILE_J) block.

    The VPU computes only the softened inverse-cube S = rsqrt(r2)^3; the
    reduction sum_j S[i,j] * [m_j*x_j, m_j*y_j, m_j*z_j, m_j] is a matmul on
    the (otherwise idle) MXU. The mass-folded (128, 4) matmul operand is
    derived per chunk from the transposed j-tile (a tiny fold + transpose):
    carrying it as a separate (TILE_J, 4) input would lane-pad 32x in VMEM
    and cap the j-tile size. The final acceleration is
    a_i = SP[:, :3] - p_i * SP[:, 3], computed at the last grid step.
    Cuts the VPU work per interaction by ~40% vs the pure-VPU kernel.
    """
    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    # HIGHEST forces multi-pass bf16 (near-f32) when inputs are f32; the
    # bf16 variant runs single-pass at full MXU rate. The module hook is an
    # experiment override (scripts/tpu_r3_drift_and_mxu.py) — callers must
    # clear the jit cache when setting it
    precision = _MXU_PRECISION_OVERRIDE or (
        jax.lax.Precision.HIGHEST
        if mxu_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        xj = post_ref[0:1, sl]
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]
        dx = xj - xi  # (TILE_I, 128)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        s = (inv * inv * inv).astype(mxu_dtype)
        folded = jnp.concatenate([xj * mj, yj * mj, zj * mj, mj], axis=0)
        pj4 = folded.T.astype(mxu_dtype)  # (128, 4)
        acc4_ref[:] += jnp.dot(
            s, pj4,
            preferred_element_type=jnp.float32,
            precision=precision,
        )


def _mxu_step_kernel(scal_ref, posi_ref, veli_ref, post_ref,
                     npos_ref, nvel_ref, acc4_ref, *, tile_j: int, mxu_dtype):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        acc4_ref[:] = jnp.zeros_like(acc4_ref)

    _mxu_accumulate_tile(posi_ref, post_ref, scal_ref[0, 1],
                         acc4_ref, tile_j, mxu_dtype)

    @pl.when(j == nj - 1)
    def _finalize():
        dt = scal_ref[0, 0]
        damping = scal_ref[0, 2]
        sp = acc4_ref[:]
        ssum = sp[:, 3:4]  # sum_j m_j * inv3
        vx = (veli_ref[:, 0:1] + (sp[:, 0:1] - posi_ref[:, 0:1] * ssum) * dt) * damping
        vy = (veli_ref[:, 1:2] + (sp[:, 1:2] - posi_ref[:, 1:2] * ssum) * dt) * damping
        vz = (veli_ref[:, 2:3] + (sp[:, 2:3] - posi_ref[:, 2:3] * ssum) * dt) * damping
        nvel_ref[:, 0:1] = vx
        nvel_ref[:, 1:2] = vy
        nvel_ref[:, 2:3] = vz
        nvel_ref[:, 3:4] = veli_ref[:, 3:4]
        npos_ref[:, 0:1] = posi_ref[:, 0:1] + vx * dt
        npos_ref[:, 1:2] = posi_ref[:, 1:2] + vy * dt
        npos_ref[:, 2:3] = posi_ref[:, 2:3] + vz * dt
        npos_ref[:, 3:4] = posi_ref[:, 3:4]


def _step_kernel_t(scal_ref, posi_ref, veli_ref, post_ref,
                   npos_ref, nvel_ref, npost_ref,
                   ax_ref, ay_ref, az_ref, *, tile_j: int, tile_i: int,
                   t_blk: int):
    """`_step_kernel` plus a TRANSPOSED new-position output block.

    Rationale: the j-side input layout is (4, N), so a scan-of-steps
    otherwise pays an XLA (N,4)->(4,N) transpose per step (measured 0.61 ms
    at N=65536 — ~3% of the step). Emitting the transposed rows from the
    finalize step (three (TILE_I,1)->(1,TILE_I) in-register transposes per
    i-block) lets the rollout carry the transposed array instead.

    Mosaic requires output lane dims >= 128, so the transposed block spans
    t_blk = max(128, tile_i) lanes and is shared by t_blk/tile_i
    consecutive i-blocks; each writes its tile_i-lane slice under a
    parity predicate (consecutive same-index visits keep the block
    resident, so all lanes are filled before copy-out)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    sub = t_blk // tile_i
    sub_r = i % sub if sub > 1 else None

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        ax_ref[:] = zeros
        ay_ref[:] = zeros
        az_ref[:] = zeros

    _accumulate_tile(posi_ref, post_ref, scal_ref[0, 1], ax_ref, ay_ref, az_ref,
                     tile_j)

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
        px = posi_ref[:, 0:1] + vx * dt
        py = posi_ref[:, 1:2] + vy * dt
        pz = posi_ref[:, 2:3] + vz * dt
        npos_ref[:, 0:1] = px
        npos_ref[:, 1:2] = py
        npos_ref[:, 2:3] = pz
        npos_ref[:, 3:4] = posi_ref[:, 3:4]

        def _write(r):
            off = r * tile_i
            sl = slice(off, off + tile_i)
            npost_ref[0:1, sl] = px.T
            npost_ref[1:2, sl] = py.T
            npost_ref[2:3, sl] = pz.T
            npost_ref[3:4, sl] = posi_ref[:, 3:4].T

        if sub == 1:
            _write(0)
        else:
            for r in range(sub):
                pl.when(sub_r == r)(lambda r=r: _write(r))


def _accel_kernel(scal_ref, posi_ref, post_ref, acc_ref,
                  ax_ref, ay_ref, az_ref, *, tile_j: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        ax_ref[:] = zeros
        ay_ref[:] = zeros
        az_ref[:] = zeros

    _accumulate_tile(posi_ref, post_ref, scal_ref[0, 1], ax_ref, ay_ref, az_ref, tile_j)

    @pl.when(j == nj - 1)
    def _finalize():
        acc_ref[:, 0:1] = jnp.sum(ax_ref[:], axis=1, keepdims=True)
        acc_ref[:, 1:2] = jnp.sum(ay_ref[:], axis=1, keepdims=True)
        acc_ref[:, 2:3] = jnp.sum(az_ref[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])


def _check_tiles(tile_i: int, tile_j: int) -> None:
    if tile_i % 8 or tile_j % LANES:
        raise ValueError(
            f"tile_i must be a multiple of 8 and tile_j of {LANES}; "
            f"got tile_i={tile_i}, tile_j={tile_j}"
        )


def _pad_i(arr, tile_i):
    m = arr.shape[0]
    m_pad = _round_up(m, tile_i)
    if m_pad != m:
        arr = jnp.pad(arr, ((0, m_pad - m), (0, 0)))
    return arr, m


def _pad_j_t(pos_j, tile_j):
    """Zero-mass-pad the j set and transpose to (4, N_pad)."""
    n = pos_j.shape[0]
    n_pad = _round_up(n, tile_j)
    if n_pad != n:
        pos_j = jnp.pad(pos_j, ((0, n_pad - n), (0, 0)))
    return pos_j.T


def _scal(dt, softening, damping):
    eps2 = jnp.asarray(softening, jnp.float32) ** 2
    return jnp.stack(
        [
            jnp.asarray(dt, jnp.float32),
            eps2,
            jnp.asarray(damping, jnp.float32),
            jnp.float32(0.0),
        ]
    ).reshape(1, 4)


def _ix(*vals):
    """x64-proof block indices: Mosaic needs i32 index-map outputs, but with
    jax_enable_x64 python-int constants trace as i64 and fail to legalize
    (``func.return(i64)``). Cast explicitly so kernels compile either way."""
    return tuple(jnp.asarray(v, jnp.int32) for v in vals)


def _common_specs(tile_i, tile_j):
    return dict(
        smem=pl.BlockSpec((1, 4), lambda i, j: _ix(0, 0), memory_space=pltpu.SMEM),
        i_tile=pl.BlockSpec((tile_i, 4), lambda i, j: _ix(i, 0), memory_space=pltpu.VMEM),
        j_tile=pl.BlockSpec((4, tile_j), lambda i, j: _ix(0, j), memory_space=pltpu.VMEM),
    )


def _scratch(tile_i, lane_chunk: int = LANES):
    return [
        pltpu.VMEM((tile_i, lane_chunk), jnp.float32),
        pltpu.VMEM((tile_i, lane_chunk), jnp.float32),
        pltpu.VMEM((tile_i, lane_chunk), jnp.float32),
    ]


@functools.partial(
    jax.jit,
    static_argnames=("tile_i", "tile_j", "interpret", "variant", "lane_chunk"),
)
def nbody_step_pallas_vs(
    pos_i, vel_i, pos_j, dt, softening, damping,
    *, tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False, variant: str = "vpu", lane_chunk: int = LANES,
):
    """Fused step of the i-set under forces from the j-set.

    pos_i/vel_i: (M, 4) float32 AoS; pos_j: (N, 4). Returns new (pos_i, vel_i).
    The single-chip step is pos_j == pos_i; the sharded step passes the local
    shard as i and the gathered global positions as j.

    variant:
      "vpu"      — pure element-wise kernel (highest precision)
      "mxu"      — force reduction as an f32 matmul on the MXU
      "mxu_bf16" — reduction matmul in bf16 (fastest; ~3 decimal digits on
                    the j-side reduction, still passes the 5e-4 QA compare)
    """
    if pos_i.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    if variant not in ("vpu", "mxu", "mxu_bf16"):
        raise ValueError(f"unknown kernel variant {variant!r}")
    # clamp tiles to the problem size so small N doesn't pay huge padding
    tile_i = min(tile_i, _round_up(pos_i.shape[0], 8))
    tile_j = min(tile_j, _round_up(pos_j.shape[0], LANES))
    _check_tiles(tile_i, tile_j)
    if lane_chunk % LANES or tile_j % lane_chunk:
        # a small problem can clamp tile_j below a wide lane_chunk; fall
        # back to the universal width rather than erroring
        lane_chunk = LANES

    pos_p, m = _pad_i(pos_i, tile_i)
    vel_p, _ = _pad_i(vel_i, tile_i)
    post = _pad_j_t(pos_j, tile_j)
    m_pad, n_pad = pos_p.shape[0], post.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)

    out_shape = [
        jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=20 * m_pad * n_pad,
        bytes_accessed=(m_pad // tile_i + 3) * n_pad * 16,
        transcendentals=m_pad * n_pad,
    )

    if variant == "vpu":
        new_pos, new_vel = pl.pallas_call(
            functools.partial(_step_kernel, tile_j=tile_j, lane_chunk=lane_chunk),
            grid=grid,
            in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"], specs["j_tile"]],
            out_specs=[specs["i_tile"], specs["i_tile"]],
            out_shape=out_shape,
            scratch_shapes=_scratch(tile_i, lane_chunk),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(_scal(dt, softening, damping), pos_p, vel_p, post)
    else:
        mxu_dtype = jnp.bfloat16 if variant == "mxu_bf16" else jnp.float32
        new_pos, new_vel = pl.pallas_call(
            functools.partial(_mxu_step_kernel, tile_j=tile_j, mxu_dtype=mxu_dtype),
            grid=grid,
            in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"],
                      specs["j_tile"]],
            out_specs=[specs["i_tile"], specs["i_tile"]],
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((tile_i, 4), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(_scal(dt, softening, damping), pos_p, vel_p, post)

    return new_pos[:m], new_vel[:m]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_pallas(
    pos_i, pos_j, softening,
    *, tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False,
):
    """Acceleration (M, 3) on the i-set due to the j-set (no integration).

    Building block for the ppermute-ring sharded step, where partial forces
    from each ring-streamed j-shard are summed before a single integration.
    """
    if pos_i.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    tile_i = min(tile_i, _round_up(pos_i.shape[0], 8))
    tile_j = min(tile_j, _round_up(pos_j.shape[0], LANES))
    _check_tiles(tile_i, tile_j)

    pos_p, m = _pad_i(pos_i, tile_i)
    post = _pad_j_t(pos_j, tile_j)
    m_pad, n_pad = pos_p.shape[0], post.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)

    acc = pl.pallas_call(
        functools.partial(_accel_kernel, tile_j=tile_j),
        grid=grid,
        in_specs=[specs["smem"], specs["i_tile"], specs["j_tile"]],
        out_specs=specs["i_tile"],
        out_shape=jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
        scratch_shapes=_scratch(tile_i),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 2) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(_scal(0.0, softening, 1.0), pos_p, post)

    return acc[:m, :3]


def nbody_step_pallas(
    pos, vel, dt, softening, damping,
    *, tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False, variant: str = "vpu", lane_chunk: int = LANES,
):
    """Single-device fused step: forces of the full set on itself."""
    return nbody_step_pallas_vs(
        pos, vel, pos, dt, softening, damping,
        tile_i=tile_i, tile_j=tile_j, interpret=interpret, variant=variant,
        lane_chunk=lane_chunk,
    )


@functools.partial(
    jax.jit,
    static_argnames=("steps", "tile_i", "tile_j", "interpret"),
    donate_argnums=(0, 1),
)
def nbody_rollout_pallas(
    pos, vel, dt, softening, damping,
    *, steps: int, tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False,
):
    """`steps` fused vpu steps in ONE compiled scan, carrying the j-side
    transposed positions ACROSS steps (the kernel emits them; see
    _step_kernel_t) so no per-step (N,4)->(4,N) transpose runs.

    RECORDED NEGATIVE RESULT — NOT a production path: measured SLOWER than
    scanning `nbody_step_pallas` (whose per-step transpose XLA fuses for
    free), so BodySystem.update_many and bench.py do NOT use it; it is kept,
    tested, as the measured rejection of the carried-transpose idea
    (docs/ARCHITECTURE.md variant table).

    State is padded once to a common tile multiple; padding bodies have
    zero mass (exert nothing) and merely coast, so slicing [:n] at the end
    is exact — the reference's pad-to-256 invariant held across a whole
    rollout (/root/reference/src/nbody/tipsy.cpp:111-122).
    """
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    n = pos.shape[0]
    tile_i = min(tile_i, _round_up(n, 8))
    tile_j = min(tile_j, _round_up(n, LANES))
    _check_tiles(tile_i, tile_j)
    if tile_j % tile_i:
        raise ValueError(
            f"rollout path needs tile_i | tile_j (one shared padded size); "
            f"got {tile_i}, {tile_j}")
    t_blk = max(LANES, tile_i)
    if t_blk % tile_i:
        raise ValueError(
            f"rollout path needs tile_i to divide {LANES} (or be a "
            f"multiple of it); got {tile_i}")
    n_pad = _round_up(n, tile_j)
    if n_pad != n:
        pos = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
        vel = jnp.pad(vel, ((0, n_pad - n), (0, 0)))
    post = pos.T  # once, outside the scan

    grid = (n_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)
    t_out_spec = pl.BlockSpec(
        (4, t_blk), lambda i, j: _ix(0, (i * tile_i) // t_blk),
        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=20 * n_pad * n_pad,
        bytes_accessed=(n_pad // tile_i + 3) * n_pad * 16,
        transcendentals=n_pad * n_pad,
    )
    step_call = pl.pallas_call(
        functools.partial(_step_kernel_t, tile_j=tile_j, tile_i=tile_i,
                          t_blk=t_blk),
        grid=grid,
        in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"],
                  specs["j_tile"]],
        out_specs=[specs["i_tile"], specs["i_tile"], t_out_spec],
        out_shape=out_shape,
        scratch_shapes=_scratch(tile_i),
        compiler_params=pltpu.CompilerParams(
            # i must be "arbitrary" here (unlike the step kernels): when
            # tile_i < t_blk, consecutive i-iterations each write HALF of
            # the same 128-lane transposed output block (the sub_r
            # predicate in _step_kernel_t) — a megacore part splitting a
            # "parallel" i across cores would leave the other core's lanes
            # uninitialized in each copy-out
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    scal = _scal(dt, softening, damping)

    def body(state, _):
        p, v, pt = state
        np_, nv_, npt = step_call(scal, p, v, pt)
        return (np_, nv_, npt), None

    (pos, vel, _), _ = jax.lax.scan(body, (pos, vel, post), None, length=steps)
    return pos[:n], vel[:n]


def _accel_jerk_kernel(scal_ref, posi_ref, veli_ref, post_ref, velt_ref,
                       acc_ref, jerk_ref,
                       ax_ref, ay_ref, az_ref, jx_ref, jy_ref, jz_ref,
                       *, tile_j: int):
    """Fused acceleration + jerk for the Hermite integrator:

        a_i = sum_j m_j d / r^3
        j_i = sum_j m_j [ dv / r^3 - 3 (d . dv) d / r^5 ]

    with d = p_j - p_i, dv = v_j - v_i, softened r^2 (the self pair's d and
    dv both vanish, so it contributes zero). Same i-resident/j-streamed
    tiling as the force kernels, with six (TILE_I, 128) VMEM accumulators.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        zeros = jnp.zeros_like(ax_ref)
        for ref in (ax_ref, ay_ref, az_ref, jx_ref, jy_ref, jz_ref):
            ref[:] = zeros

    eps2 = scal_ref[0, 1]
    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    vxi = veli_ref[:, 0:1]
    vyi = veli_ref[:, 1:2]
    vzi = veli_ref[:, 2:3]
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        dx = post_ref[0:1, sl] - xi  # (TILE_I, 128)
        dy = post_ref[1:2, sl] - yi
        dz = post_ref[2:3, sl] - zi
        mj = post_ref[3:4, sl]
        dvx = velt_ref[0:1, sl] - vxi
        dvy = velt_ref[1:2, sl] - vyi
        dvz = velt_ref[2:3, sl] - vzi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        inv2 = inv * inv
        s = mj * (inv * inv2)                      # m_j / r^3
        rv3 = 3.0 * (dx * dvx + dy * dvy + dz * dvz) * inv2
        ax_ref[:] += s * dx
        ay_ref[:] += s * dy
        az_ref[:] += s * dz
        jx_ref[:] += s * (dvx - rv3 * dx)
        jy_ref[:] += s * (dvy - rv3 * dy)
        jz_ref[:] += s * (dvz - rv3 * dz)

    @pl.when(j == nj - 1)
    def _finalize():
        acc_ref[:, 0:1] = jnp.sum(ax_ref[:], axis=1, keepdims=True)
        acc_ref[:, 1:2] = jnp.sum(ay_ref[:], axis=1, keepdims=True)
        acc_ref[:, 2:3] = jnp.sum(az_ref[:], axis=1, keepdims=True)
        acc_ref[:, 3:4] = jnp.zeros_like(acc_ref[:, 3:4])
        jerk_ref[:, 0:1] = jnp.sum(jx_ref[:], axis=1, keepdims=True)
        jerk_ref[:, 1:2] = jnp.sum(jy_ref[:], axis=1, keepdims=True)
        jerk_ref[:, 2:3] = jnp.sum(jz_ref[:], axis=1, keepdims=True)
        jerk_ref[:, 3:4] = jnp.zeros_like(jerk_ref[:, 3:4])


# the acc+jerk kernel prefers SMALLER i-tiles than the force kernel: six
# accumulators double the per-grid-step dependency chain, so shortening it
# wins (measured r2 sweep at N=65536: (32, 16384) 56 ms vs (64, 8192) 64 ms)
AJ_TILE_I = 32
AJ_TILE_J = 16384


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def compute_accel_jerk_pallas(
    pos_i, vel_i, pos_j, vel_j, softening,
    *, tile_i: int = AJ_TILE_I, tile_j: int = AJ_TILE_J,
    interpret: bool = False,
):
    """(acc, jerk), each (M, 3), on the i-set due to the j-set — the fused
    Pallas force evaluation for the Hermite predictor-corrector (the XLA
    analogue is ops.reference.compute_accel_jerk_xla). i-vs-j form, so the
    sharded Hermite step can pass the gathered/ring-streamed j-state."""
    if pos_i.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    tile_i = min(tile_i, _round_up(pos_i.shape[0], 8))
    tile_j = min(tile_j, _round_up(pos_j.shape[0], LANES))
    _check_tiles(tile_i, tile_j)

    pos_p, m = _pad_i(pos_i, tile_i)
    vel_p, _ = _pad_i(vel_i, tile_i)
    post = _pad_j_t(pos_j, tile_j)
    velt = _pad_j_t(vel_j, tile_j)
    m_pad, n_pad = pos_p.shape[0], post.shape[1]
    grid = (m_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)

    acc, jerk = pl.pallas_call(
        functools.partial(_accel_jerk_kernel, tile_j=tile_j),
        grid=grid,
        in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"],
                  specs["j_tile"], specs["j_tile"]],
        out_specs=[specs["i_tile"], specs["i_tile"]],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
        ],
        scratch_shapes=_scratch(tile_i) + _scratch(tile_i),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=48 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 3) * n_pad * 32,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(_scal(0.0, softening, 1.0), pos_p, vel_p, post, velt)

    return acc[:m, :3], jerk[:m, :3]


def _potential_kernel(scal_ref, posi_ref, iidx_ref, post_ref, out_ref,
                      acc_ref, *, tile_j: int):
    """Per-i-row softened pair potential sums (diagonal pair masked via
    global body indices, which also keeps padding bodies inert)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps2 = scal_ref[0, 1]
    xi = posi_ref[:, 0:1]
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]
    mi = posi_ref[:, 3:4]
    ii = iidx_ref[:, 0:1]  # (TILE_I, 1) global i indices

    base = pl.program_id(1) * tile_j
    for k in range(tile_j // LANES):
        sl = slice(k * LANES, (k + 1) * LANES)
        xj = post_ref[0:1, sl]
        yj = post_ref[1:2, sl]
        zj = post_ref[2:3, sl]
        mj = post_ref[3:4, sl]
        # Mosaic's iota is integer-only; cast after (exact to 2^24 in f32)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1).astype(jnp.float32)
        jj = (base + k * LANES).astype(jnp.float32) + lane_ids
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        pair = mi * mj * inv
        pair = jnp.where(jj == ii, 0.0, pair)  # mask the self pair
        acc_ref[:] += pair

    @pl.when(j == nj - 1)
    def _finalize():
        out_ref[:, 0:1] = jnp.sum(acc_ref[:], axis=1, keepdims=True)
        out_ref[:, 1:4] = jnp.zeros_like(out_ref[:, 1:4])


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def potential_energy_pallas(
    pos, softening,
    *, tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
    interpret: bool = False,
):
    """Total softened potential energy U = -1/2 sum_{i != j} m_i m_j /
    sqrt(r^2+eps^2), tiled like the force kernels (fast diagnostics at 1M+)."""
    if pos.dtype != jnp.float32:
        raise TypeError("pallas path is float32; use the XLA path for fp64")
    tile_i = min(tile_i, _round_up(pos.shape[0], 8))
    tile_j = min(tile_j, _round_up(pos.shape[0], LANES))
    _check_tiles(tile_i, tile_j)

    pos_p, m = _pad_i(pos, tile_i)
    post = _pad_j_t(pos, tile_j)
    m_pad, n_pad = pos_p.shape[0], post.shape[1]
    # global indices as f32 (exact to 2^24, far above any supported N)
    iidx = jnp.broadcast_to(
        jnp.arange(m_pad, dtype=jnp.float32)[:, None], (m_pad, 4)
    )
    grid = (m_pad // tile_i, n_pad // tile_j)
    specs = _common_specs(tile_i, tile_j)

    per_row = pl.pallas_call(
        functools.partial(_potential_kernel, tile_j=tile_j),
        grid=grid,
        in_specs=[specs["smem"], specs["i_tile"], specs["i_tile"], specs["j_tile"]],
        out_specs=specs["i_tile"],
        out_shape=jax.ShapeDtypeStruct((m_pad, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_i, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * m_pad * n_pad,
            bytes_accessed=(m_pad // tile_i + 2) * n_pad * 16,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(_scal(0.0, softening, 1.0), pos_p, iidx, post)

    return -0.5 * jnp.sum(per_row[:m, 0])
