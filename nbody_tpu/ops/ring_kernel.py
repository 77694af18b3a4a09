"""Fused ring all-pairs kernel: force accumulation overlapped with RDMA.

SURVEY.md §7 calls the ring overlap "the crux": ≥2x the CUDA sample at 1M
bodies needs the j-shard rotation around the ICI ring to overlap with force
accumulation. The shard_map strategy="ring" leaves that overlap to XLA's
async collective-permute; this kernel *fuses* it: one Pallas program per
device runs all D hops, double-buffering the visiting j-shard in VMEM and
issuing `make_async_remote_copy` for hop h+1 while the VPU grinds hop h —
the ring-attention dataflow applied to gravity.

Flow control uses a credit semaphore: a device signals its LEFT neighbor
when the slot that neighbor will write next is free (compute on it finished
and our own send from it completed), and waits for a credit from its RIGHT
neighbor before each send. This prevents a fast left neighbor from
overwriting a slot we are still reading — the classic double-buffered ring
race.

Layout: the ring buffer carries the transposed j-shard (8, M) (rows 0-3 =
x,y,z,m; padded to 8 sublanes); per-body accumulators live in HBM as (M, 4)
blocks revisited per hop via an input/output alias, so VMEM holds only
(TILE_I, ·) working tiles regardless of shard size. Integration happens
outside (ops.reference.integrate), keeping this kernel accel-only like the
ring strategy's other building block.

Status: validated in Pallas interpret mode on a virtual CPU mesh (the only
multi-chip environment available here); compiled multi-chip execution awaits
real hardware and is exposed as strategy="ring_fused" (experimental).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.pallas_kernel import _ix

LANES = 128


def _kernel(scal_ref, posi_ref, post_ref, accout_ref,
            buf_ref, ax_ref, ay_ref, az_ref,
            send_sem, recv_sem, credit_sem,
            *, axis: str, ndev: int, tile_i: int, m_local: int,
            flow_control: bool):
    h = pl.program_id(0)  # hop
    i = pl.program_id(1)  # i-block
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, ndev)
    left = jax.lax.rem(my + ndev - 1, ndev)

    cur = jax.lax.rem(h, 2)
    nxt = jax.lax.rem(h + 1, 2)
    prv = nxt  # (h-1) % 2 == (h+1) % 2

    def rdma(src_slot, dst_slot):
        return pltpu.make_async_remote_copy(
            src_ref=buf_ref.at[src_slot],
            dst_ref=buf_ref.at[dst_slot],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # ---- hop-boundary communication (only at the first i-block) ----

    @pl.when((h == 0) & (i == 0))
    def _init():
        # slot 0 <- local shard; zero the resident accumulator
        buf_ref[0] = post_ref[...]
        accout_ref[...] = jnp.zeros_like(accout_ref)

    if flow_control:
        # tell LEFT that our slot 1 is writable (interpret mode can't
        # simulate remote semaphore signals, so flow control is compiled-only;
        # the interpreter executes devices sequentially and cannot race)
        @pl.when((h == 0) & (i == 0))
        def _initial_credit():
            pltpu.semaphore_signal(
                credit_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

    @pl.when((h > 0) & (i == 0))
    def _finish_prev_hop():
        # complete the hop h-1 transfer: our send from slot prv finished
        # and the visiting shard has fully landed in slot cur
        rdma(prv, cur).wait()

    if flow_control:
        @pl.when((h > 0) & (h < ndev - 1) & (i == 0))
        def _free_slot():
            # slot prv is now free for LEFT's next write
            pltpu.semaphore_signal(
                credit_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

    @pl.when((h < ndev - 1) & (i == 0))
    def _send_next():
        # RIGHT's destination slot must be free before we stream into it;
        # the transfer then overlaps all of this hop's force computation
        if flow_control:
            pltpu.semaphore_wait(credit_sem, 1)
        rdma(cur, nxt).start()

    # ---- force accumulation for this (hop, i-block) ----

    eps2 = scal_ref[0, 1]
    xi = posi_ref[:, 0:1]  # (TILE_I, 1)
    yi = posi_ref[:, 1:2]
    zi = posi_ref[:, 2:3]

    zeros = jnp.zeros_like(ax_ref)
    ax_ref[:] = zeros
    ay_ref[:] = zeros
    az_ref[:] = zeros

    def chunk_body(jc, _):
        sl = pl.ds(jc * LANES, LANES)
        xj = buf_ref[cur, 0:1, sl]  # (1, 128)
        yj = buf_ref[cur, 1:2, sl]
        zj = buf_ref[cur, 2:3, sl]
        mj = buf_ref[cur, 3:4, sl]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(r2)
        s = mj * (inv * inv * inv)
        ax_ref[:] += s * dx
        ay_ref[:] += s * dy
        az_ref[:] += s * dz
        return 0

    jax.lax.fori_loop(0, m_local // LANES, chunk_body, 0)

    # fold this (hop, i-block) contribution into the VMEM-resident (8, M)
    # transposed accumulator (rows 0..2 = ax, ay, az for all local bodies)
    sl_i = pl.ds(i * tile_i, tile_i)
    accout_ref[0:1, sl_i] += jnp.sum(ax_ref[:], axis=1, keepdims=True).T
    accout_ref[1:2, sl_i] += jnp.sum(ay_ref[:], axis=1, keepdims=True).T
    accout_ref[2:3, sl_i] += jnp.sum(az_ref[:], axis=1, keepdims=True).T


def _resolve_tile_i(tile_i: int, m_real: int, interpret: bool) -> int:
    """Clamp tile_i to the shard, then (compiled only) round UP to a lane
    multiple: the per-tile accumulator store ``accout_ref[0:1, i*tile_i:…]``
    is a lane-dimension slice and Mosaic requires 128-aligned offsets —
    an unaligned tile dies late with 'cannot statically prove index is a
    multiple of 128'. Rounding up (the shard zero-pads to an lcm multiple
    anyway) keeps the framework default tile_i=64 working compiled."""
    tile_i = min(tile_i, max(8, (m_real // 8) * 8) or 8)
    if not interpret and tile_i % LANES:
        aligned = ((tile_i + LANES - 1) // LANES) * LANES
        import warnings

        warnings.warn(
            f"compiled ring_fused rounded tile_i {tile_i} -> {aligned} "
            f"(lane-aligned accumulator stores require multiples of {LANES})",
            stacklevel=3,
        )
        tile_i = aligned
    return tile_i


@functools.partial(
    jax.jit,
    static_argnames=("axis", "ndev", "tile_i", "interpret", "collective_id"),
)
def ring_accel_fused(
    pos_shard,
    softening,
    *,
    axis: str,
    ndev: int,
    tile_i: int = 256,
    interpret: bool = False,
    collective_id: int = 7,
):
    # interpreter can't simulate remote signals (and can't race); a 1-device
    # ring never communicates, so signals would leak a nonzero semaphore
    flow_control = (not interpret) and ndev > 1
    """Acceleration (M, 3) of the local body shard under ALL bodies, with the
    j-shards ring-streamed between devices inside the kernel.

    Must be called inside shard_map over a 1-D mesh axis `axis` of size
    `ndev`. The local shard size M must be a multiple of max(2*tile_i, 128).
    """
    import math

    if pos_shard.dtype != jnp.float32:
        raise TypeError("ring_fused is float32-only")
    m_real = pos_shard.shape[0]
    tile_i = _resolve_tile_i(tile_i, m_real, interpret)
    # zero-mass-pad the shard to a lane/tile multiple (uniform across devices,
    # so ring transfers stay shape-identical; padding exerts no force)
    m_local = max(math.lcm(tile_i, LANES),
                  ((m_real + math.lcm(tile_i, LANES) - 1)
                   // math.lcm(tile_i, LANES)) * math.lcm(tile_i, LANES))
    if m_local != m_real:
        pos_shard = jnp.pad(pos_shard, ((0, m_local - m_real), (0, 0)))
    ni = m_local // tile_i

    # transposed shard padded to 8 sublanes: rows x, y, z, m, 0...
    post = jnp.pad(pos_shard.T, ((0, 4), (0, 0)))  # (8, M)
    scal = jnp.stack([
        jnp.float32(0.0),
        jnp.asarray(softening, jnp.float32) ** 2,
        jnp.float32(0.0),
        jnp.float32(0.0),
    ]).reshape(1, 4)

    grid = (ndev, ni)
    acc = pl.pallas_call(
        functools.partial(
            _kernel, axis=axis, ndev=ndev, tile_i=tile_i, m_local=m_local,
            flow_control=flow_control,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda h, i: _ix(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 4), lambda h, i: _ix(i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m_local), lambda h, i: _ix(0, 0), memory_space=pltpu.VMEM),
        ],
        # the accumulator: one (8, M) block revisited by every grid step, so
        # it stays VMEM-resident across all hops and flushes once at the end
        out_specs=pl.BlockSpec((8, m_local), lambda h, i: _ix(0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, m_local), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, m_local), jnp.float32),  # ring double buffer
            pltpu.VMEM((tile_i, LANES), jnp.float32),
            pltpu.VMEM((tile_i, LANES), jnp.float32),
            pltpu.VMEM((tile_i, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Mosaic only accepts a collective_id when a barrier is in play
            collective_id=collective_id if ndev > 1 else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * m_local * m_local * ndev,
            bytes_accessed=(ndev + 1) * m_local * 32,
            transcendentals=m_local * m_local * ndev,
        ),
        interpret=interpret,
    )(scal, pos_shard, post)

    return acc[:3, :m_real].T  # (M, 3)
