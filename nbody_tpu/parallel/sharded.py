"""Body-sharded N-body steps over a device mesh.

Three communication strategies (SURVEY.md §7 "Ring overlap"):

* ``allgather``: each step all-gathers the (N_local, 4) position shards into
  the full (N, 4) array over ICI, then every chip runs the fused Pallas
  step on its local i-shard vs the gathered j-set. One collective, maximal
  kernel fusion; the gather for 1M bodies is ~16 MB — cheap on ICI.
* ``ring``: the position shard rotates around the ring via
  ``jax.lax.ppermute`` inside a ``lax.scan``; each hop accumulates partial
  forces of the local i-shard vs the visiting j-shard. The communication of
  hop k+1 can overlap the force computation of hop k (XLA's async
  collective-permute), the TPU analogue of ring attention.
* ``sym``: the Newton's-third-law decomposition — each global pair is
  computed ONCE across the whole mesh (the strategies above compute every
  pair twice, once per owning shard): per-shard self triangles, one cross
  rectangle per unordered shard pair (assigned by ring offset), split
  antipodal quarters for even device counts, and a single reduce-scatter
  that re-shards the accumulated reactions. ~0.5× the FLOPs of allgather
  for ~1.8× its bytes, plus the ~1.3× per-pair gain of the symmetric
  kernels (_sym_sharded_accel_fn).

All are expressed with ``jax.shard_map`` so XLA emits the collectives;
there is no hand-rolled NCCL/MPI analogue to port (the reference has none —
it is single-GPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.ops.pallas_kernel import (
    DEFAULT_TILE_I,
    DEFAULT_TILE_J,
    compute_accel_pallas,
    nbody_step_pallas_vs,
)
from nbody_tpu.ops.reference import (
    compute_accel_xla_vs,
    integrate,
    nbody_step_xla_vs,
)

BODY_AXIS = "bodies"

# strategy="auto" cost model (measured/derived for v5e-class ICI):
#
# Both strategies move the same total bytes per step — each device receives
# (D-1)/D · N rows · 16 B of positions. The difference is overhead shape:
#   * allgather: ONE fused collective (low latency), but its transfer time
#     ~ N·16B / ici_bw is exposed (not overlapped with force compute), and
#     the gathered (N, 4) array materializes in full on every chip.
#   * ring: D-1 ppermute hops inside a scan. XLA's async collective-permute
#     overlaps hop k+1's transfer with hop k's (N/D)² force tile, hiding the
#     transfer entirely once (N/D)²/compute_rate >= (N/D·16B)/ici_bw — true
#     for any shard >= ~100 bodies — but paying per-hop launch/scan latency
#     ~ D · t_hop (t_hop ≈ 5 µs).
#
# Ring therefore wins when the comm time it hides exceeds the hop latency it
# adds:  N·16B/ici_bw >= D·t_hop  →  N/D >= ici_bw·t_hop/16B ≈ 14k bodies
# (ici_bw ≈ 45 GB/s/link, t_hop ≈ 5 µs). Constant provenance (r3,
# scripts/tpu_thop_measure.py): the on-chip scan-step launch component of
# t_hop measures < 1 µs on the attached v5e (below the relay noise floor),
# so t_hop is dominated by ICI wire/switch latency + async collective
# setup — pod-measurable only, like ici_bw (docs/ROADMAP.md). Rounded to a
# power of two:
RING_AUTO_MIN_SHARD = 16384


def choose_strategy(num_bodies: int, ndev: int) -> str:
    """Pick 'ring' vs 'allgather' for a global body count on an ndev ring
    (see the cost model above). ring_fused is never auto-picked: it is
    quarantined as experimental until validated on real multi-chip silicon
    (docs/ROADMAP.md)."""
    if ndev <= 1:
        return "allgather"
    return "ring" if num_bodies // ndev >= RING_AUTO_MIN_SHARD else "allgather"


def _allgather_accel_fn(accel_vs, axis):
    """`accel_fn(p_sh) -> (nloc, 3)`: gather the full j-set over ICI,
    one kernel call. `accel_vs(p_sh, p_j) -> (nloc, 3)`."""
    def accel_fn(p_sh):
        p_all = jax.lax.all_gather(p_sh, axis, axis=0, tiled=True)
        return accel_vs(p_sh, p_all)

    return accel_fn


def _ring_accel_fn(accel_vs, axis, ndev):
    """`accel_fn(p_sh) -> (nloc, 3)`: the j-shard rotates via ppermute
    inside a scan, partial forces accumulate per hop (async
    collective-permute overlaps hop k+1's transfer with hop k's tile)."""
    perm = [(d, (d + 1) % ndev) for d in range(ndev)]

    def accel_fn(p_sh):
        def hop(carry, _):
            jp, acc = carry
            jp = jax.lax.ppermute(jp, axis, perm)
            acc = acc + accel_vs(p_sh, jp)
            return (jp, acc), None

        # hop 0 (the local shard) runs outside the scan so exactly
        # ndev-1 ppermutes are issued — a permute after the last kernel
        # would be dead weight XLA cannot DCE inside a scan body. Same
        # accumulation order (0 + a_0 is exact), so bit-identical.
        (_, acc), _ = jax.lax.scan(hop, (p_sh, accel_vs(p_sh, p_sh)),
                                   None, length=ndev - 1)
        return acc

    return accel_fn


def _sym_fit_div(limit: int, span: int, base: int) -> int:
    """Largest multiple of ``base`` that divides ``span``, at most
    ``limit`` (``base`` must divide ``span``). Trace-time arithmetic."""
    t = max((min(limit, span) // base) * base, base)
    while t > base and span % t:
        t -= base
    return t


def _sym_fit_tile(limit: int, span: int, base: int) -> int:
    """j-tile for a cross rectangle of width ``span``: the largest
    ``base`` multiple dividing ``span`` at most ``limit``, kept at or
    under span/2 (a block-wide stream overflows Mosaic's scoped-vmem
    stack — the measured hazard ops/symmetric_kernel.py gates); a
    single-``base`` stream is always allowed (tiny programs are safe)."""
    t = max((min(limit, span) // base) * base, base)
    while t > base and (span % t or 2 * t > span):
        t -= base
    return t


def _sym_sharded_accel_fn(axis, ndev, *, tile_i, tile_j, interpret):
    """`accel_fn(p_sh, soft) -> (nloc, 3)` with each global pair evaluated
    ONCE across the mesh — the Newton's-third-law saving at pod scale.

    The 1-D strategies above evaluate the full interaction matrix: every
    unordered pair is computed twice, once by each owning shard. This
    decomposition halves the pod's compute: shard d runs

    * the self triangle of its own shard (compute_accel_symmetric_blocked),
    * mask-free cross rectangles vs the shards at ring offsets
      1..(D-1)//2 (every unordered shard pair lands on exactly one
      device: offset o from one end XOR offset D-o from the other),
    * for even D, the antipodal pair (offset D/2) split into two
      disjoint quarter rectangles per endpoint — devices in the first
      half of the ring take the aligned (i-half × j-same-half) quarters,
      the second half the crossed ones, so the four quarters of each
      antipodal rectangle are covered exactly once and the work stays
      perfectly balanced.

    Shards pad only to 2·lcm(LANES, tile_i) alignment (so the halves
    stay tile-aligned); j-tiles are fitted divisors of the actual span,
    and cross rectangles are evaluated in j-sub-blocks of ≤ SYM_MAX_N so
    the per-kernel (8, span) reaction scratch never exceeds the VMEM
    budget that caps the single-triangle kernel — any shard size works.

    Each cross kernel also returns the reaction on its j-span; the
    per-device contribution matrix (D, B, 3) is summed and re-sharded by
    ONE reduce-scatter. Comms per step: all_gather (N, 4) in +
    psum_scatter (N, 3) out ≈ 1.8× the allgather strategy's bytes, for
    0.5× its FLOPs + the ~1.3× per-pair kernel gain — a win whenever
    shards are compute-bound (N/D ≳ a few thousand bodies; the same
    regime where all-pairs N-body is worth sharding at all).

    Coverage is pinned by tests at every parity/size: the self + offsets
    + quarters partition is exhaustive and disjoint for any D.
    """
    import math

    from nbody_tpu.ops.pallas_kernel import LANES, _round_up
    from nbody_tpu.ops.symmetric_kernel import (
        SUB,
        SYM_MAX_N,
        _sym_cross,
        compute_accel_symmetric_blocked,
    )

    if tile_i % SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"sym strategy needs {SUB} | tile_i, {LANES} | tile_j and "
            f"tile_i | tile_j; got ({tile_i}, {tile_j})")
    base = math.lcm(LANES, tile_i)

    def accel_fn(p_sh, soft):
        nloc = p_sh.shape[0]
        # minimal padding: halves (even-D quarters) must stay aligned to
        # both the lane width and the i-tile; zero-mass rows are inert
        b_pad = _round_up(nloc, 2 * base)
        half = b_pad // 2
        p_pad = jnp.pad(p_sh, ((0, b_pad - nloc), (0, 0)))
        p_all = jax.lax.all_gather(p_pad, axis, axis=0, tiled=True)
        d = jax.lax.axis_index(axis)

        own = compute_accel_symmetric_blocked(
            p_pad, soft, tile_i=tile_i,
            tile_j=_sym_fit_div(tile_j, b_pad, base), interpret=interpret,
            block_cap=SYM_MAX_N)
        contrib = jnp.zeros((ndev, b_pad, 3), p_sh.dtype)

        def shard_at(e):
            return jax.lax.dynamic_slice_in_dim(
                p_all, e * b_pad, b_pad, axis=0)

        def cross(pi, pj):
            """pi (rows, 4) vs pj (span, 4), j-sub-blocked to the VMEM
            cap; returns (acc_i (rows, 3), react_j (span, 3))."""
            span = pj.shape[0]
            sub = _sym_fit_div(SYM_MAX_N, span, base)
            tj = _sym_fit_tile(tile_j, sub, base)
            acc = None
            reacts = []
            for s0 in range(0, span, sub):
                a_i, r = _sym_cross(pi, pj[s0:s0 + sub].T, soft,
                                    tile_i=tile_i, tile_j=tj,
                                    interpret=interpret)
                acc = a_i[:, :3] if acc is None else acc + a_i[:, :3]
                reacts.append(r)
            return acc, jnp.concatenate(reacts, axis=1).T

        for off in range(1, (ndev - 1) // 2 + 1):
            e = (d + off) % ndev
            acc_i, react = cross(p_pad, shard_at(e))
            own = own + acc_i
            contrib = jax.lax.dynamic_update_slice(
                contrib, react[None], (e, 0, 0))

        if ndev % 2 == 0 and ndev > 1:
            e = (d + ndev // 2) % ndev
            pj = shard_at(e)
            first_half = d < ndev // 2
            react_e = jnp.zeros((b_pad, 3), p_sh.dtype)
            for ih in (0, 1):
                # aligned quarters for the first half of the ring,
                # crossed quarters for the second: disjoint + exhaustive
                jh = jnp.where(first_half, ih, 1 - ih) * half
                i_part = p_pad[ih * half:(ih + 1) * half]
                j_part = jax.lax.dynamic_slice_in_dim(pj, jh, half, axis=0)
                acc_i, react = cross(i_part, j_part)
                own = own.at[ih * half:(ih + 1) * half].add(acc_i)
                react_e = jax.lax.dynamic_update_slice(
                    react_e, react, (jh, 0))
            contrib = jax.lax.dynamic_update_slice(
                contrib, react_e[None], (e, 0, 0))

        contrib = jax.lax.dynamic_update_slice(contrib, own[None], (d, 0, 0))
        total = jax.lax.psum_scatter(
            contrib.reshape(ndev * b_pad, 3), axis,
            scatter_dimension=0, tiled=True)
        return total[:nloc]

    return accel_fn


def _sym_sharded_aj_fn(axis, ndev, *, tile_i, tile_j, interpret):
    """`aj_fn(p_sh, v_sh, soft) -> ((nloc, 3), (nloc, 3))` with each global
    pair evaluated ONCE across the mesh — the Hermite form of
    _sym_sharded_accel_fn (same self-triangle + ring-offset cross
    rectangle + antipodal-quarter partition; see its docstring for the
    coverage argument, which is integrator-independent).

    The cross kernel is the accel+jerk rectangle (_aj_sym_cross): the
    jerk bracket q = dv/r³ − 3(d·dv)d/r⁵ is antisymmetric under i↔j like
    the force, so the jerk reaction −m_i·q accumulates exactly like the
    force reaction. Per-device contributions carry 6 planes (acc xyz +
    jerk xyz) and re-shard with ONE reduce-scatter; j-sub-blocking caps
    at AJ_SYM_MAX_N (6 reaction scratches per kernel instead of 3).

    Comms per aj evaluation: all_gather (N, 4)×2 in + psum_scatter (N, 6)
    out — Hermite runs two evaluations per step, each paying this, which
    is why the pair-count halving is worth the most here (2 force evals
    amortize the same ~0.5× FLOPs saving twice)."""
    import math

    from nbody_tpu.ops.pallas_kernel import LANES, _round_up
    from nbody_tpu.ops.symmetric_kernel import (
        AJ_SYM_MAX_N,
        SUB,
        _aj_sym_cross,
        compute_accel_jerk_symmetric_blocked,
    )

    if tile_i % SUB or tile_j % LANES or tile_j % tile_i:
        raise ValueError(
            f"sym strategy needs {SUB} | tile_i, {LANES} | tile_j and "
            f"tile_i | tile_j; got ({tile_i}, {tile_j})")
    base = math.lcm(LANES, tile_i)

    def aj_fn(p_sh, v_sh, soft):
        nloc = p_sh.shape[0]
        b_pad = _round_up(nloc, 2 * base)
        half = b_pad // 2
        p_pad = jnp.pad(p_sh, ((0, b_pad - nloc), (0, 0)))
        v_pad = jnp.pad(v_sh, ((0, b_pad - nloc), (0, 0)))
        p_all = jax.lax.all_gather(p_pad, axis, axis=0, tiled=True)
        v_all = jax.lax.all_gather(v_pad, axis, axis=0, tiled=True)
        d = jax.lax.axis_index(axis)

        oa, oj = compute_accel_jerk_symmetric_blocked(
            p_pad, v_pad, soft, tile_i=tile_i,
            tile_j=_sym_fit_div(tile_j, b_pad, base), interpret=interpret,
            block_cap=AJ_SYM_MAX_N)
        own = jnp.concatenate([oa, oj], axis=1)  # (b_pad, 6)
        contrib = jnp.zeros((ndev, b_pad, 6), p_sh.dtype)

        def shard_at(all_, e):
            return jax.lax.dynamic_slice_in_dim(
                all_, e * b_pad, b_pad, axis=0)

        def cross(pi, vi, pj, vj):
            """(rows, 4/4) vs (span, 4/4), j-sub-blocked to the VMEM cap;
            returns (accjerk_i (rows, 6), react_j (span, 6))."""
            span = pj.shape[0]
            sub = _sym_fit_div(AJ_SYM_MAX_N, span, base)
            tj = _sym_fit_tile(tile_j, sub, base)
            aj_i = None
            reacts = []
            for s0 in range(0, span, sub):
                a_i, j_i, r_a, r_j = _aj_sym_cross(
                    pi, vi, pj[s0:s0 + sub].T, vj[s0:s0 + sub].T, soft,
                    tile_i=tile_i, tile_j=tj, interpret=interpret)
                part = jnp.concatenate([a_i[:, :3], j_i[:, :3]], axis=1)
                aj_i = part if aj_i is None else aj_i + part
                reacts.append(jnp.concatenate([r_a, r_j], axis=0))
            return aj_i, jnp.concatenate(reacts, axis=1).T

        for off in range(1, (ndev - 1) // 2 + 1):
            e = (d + off) % ndev
            aj_i, react = cross(p_pad, v_pad,
                                shard_at(p_all, e), shard_at(v_all, e))
            own = own + aj_i
            contrib = jax.lax.dynamic_update_slice(
                contrib, react[None], (e, 0, 0))

        if ndev % 2 == 0 and ndev > 1:
            e = (d + ndev // 2) % ndev
            pj = shard_at(p_all, e)
            vj = shard_at(v_all, e)
            first_half = d < ndev // 2
            react_e = jnp.zeros((b_pad, 6), p_sh.dtype)
            for ih in (0, 1):
                # aligned quarters for the first half of the ring,
                # crossed for the second: disjoint + exhaustive
                jh = jnp.where(first_half, ih, 1 - ih) * half
                i_p = p_pad[ih * half:(ih + 1) * half]
                i_v = v_pad[ih * half:(ih + 1) * half]
                j_p = jax.lax.dynamic_slice_in_dim(pj, jh, half, axis=0)
                j_v = jax.lax.dynamic_slice_in_dim(vj, jh, half, axis=0)
                aj_i, react = cross(i_p, i_v, j_p, j_v)
                own = own.at[ih * half:(ih + 1) * half].add(aj_i)
                react_e = jax.lax.dynamic_update_slice(
                    react_e, react, (jh, 0))
            contrib = jax.lax.dynamic_update_slice(
                contrib, react_e[None], (e, 0, 0))

        contrib = jax.lax.dynamic_update_slice(contrib, own[None], (d, 0, 0))
        total = jax.lax.psum_scatter(
            contrib.reshape(ndev * b_pad, 6), axis,
            scatter_dimension=0, tiled=True)
        return total[:nloc, :3], total[:nloc, 3:]

    return aj_fn


def _allgather_aj_fn(aj_vs, axis):
    """`aj_fn(p_sh, v_sh) -> ((nloc,3), (nloc,3))`: hermite's force
    evaluation — positions AND velocities gather (the jerk needs both).
    `aj_vs(p_sh, v_sh, p_j, v_j) -> (acc, jerk)`."""
    def aj_fn(p_sh, v_sh):
        p_all = jax.lax.all_gather(p_sh, axis, axis=0, tiled=True)
        v_all = jax.lax.all_gather(v_sh, axis, axis=0, tiled=True)
        return aj_vs(p_sh, v_sh, p_all, v_all)

    return aj_fn


def _ring_aj_fn(aj_vs, axis, ndev):
    """Ring form of _allgather_aj_fn: (jpos, jvel) rotate together."""
    perm = [(d, (d + 1) % ndev) for d in range(ndev)]

    def aj_fn(p_sh, v_sh):
        def hop(carry, _):
            jp, jv, acc, jerk = carry
            a, jk = aj_vs(p_sh, v_sh, jp, jv)
            jp = jax.lax.ppermute(jp, axis, perm)
            jv = jax.lax.ppermute(jv, axis, perm)
            return (jp, jv, acc + a, jerk + jk), None

        z = jnp.zeros((p_sh.shape[0], 3), p_sh.dtype)
        (_, _, acc, jerk), _ = jax.lax.scan(
            hop, (p_sh, v_sh, z, z), None, length=ndev)
        return acc, jerk

    return aj_fn


def make_sharded_step(
    mesh: Mesh,
    *,
    axis: str = BODY_AXIS,
    kernel: str = "pallas",
    strategy: str = "allgather",
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
    chunk_size: int | None = None,
    variant: str = "vpu",
    integrator: str = "euler",
):
    """Build a jitted sharded step: (pos, vel, dt, softening, damping) ->
    (pos, vel), with pos/vel sharded P(axis, None) over the mesh.

    kernel: "pallas" (TPU; interpret=True for CPU testing) or "xla".
    strategy: "allgather", "ring", "ring_fused", or "auto" (cost-model pick
      between allgather and ring by shard size at trace time; see
      choose_strategy).
    variant: pallas kernel variant ("vpu" / "mxu" / "mxu_bf16").
    integrator: "euler" (reference parity), "leapfrog" (symplectic DKD —
      the local shard drifts dt/2 first, the gathered/ring-streamed j-side is
      the half-step positions, then kick + second half-drift), or "hermite"
      (4th-order predictor-corrector — two accel+jerk evaluations per step,
      each gathering/ring-streaming BOTH positions and velocities; the
      pallas kernel runs the fused compute_accel_jerk_pallas).
    """
    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if kernel not in ("pallas", "xla"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if strategy not in ("allgather", "ring", "ring_fused", "auto", "sym"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "ring_fused" and kernel != "pallas":
        raise ValueError("strategy='ring_fused' is a Pallas kernel; use kernel='pallas'")
    if integrator == "hermite" and strategy == "ring_fused":
        raise ValueError(
            "integrator='hermite' supports strategies "
            "'allgather'/'ring'/'auto' (ring_fused fuses the Euler "
            "update into its kernel)")
    if strategy == "sym" and kernel != "pallas":
        raise ValueError(
            "strategy='sym' runs the Newton's-third-law Pallas "
            "kernels; use kernel='pallas'")
    ndev = mesh.shape[axis]
    # None = "not specified" (BodySystem._explicit_tiles semantics): the
    # force kernels get DEFAULT_TILE_*, the hermite acc+jerk kernel its own
    # tuned AJ_TILE_* — and an EXPLICIT caller value always wins for both
    # (a user explicitly requesting the force-kernel defaults gets exactly
    # those, not a silent AJ_TILE swap; advisor r2 item 2)
    explicit_i, explicit_j = tile_i is not None, tile_j is not None
    tile_i = DEFAULT_TILE_I if tile_i is None else tile_i
    tile_j = DEFAULT_TILE_J if tile_j is None else tile_j

    def step_vs(pos_sh, vel_sh, pos_j, dt, soft, damp):
        if kernel == "pallas":
            return nbody_step_pallas_vs(
                pos_sh, vel_sh, pos_j, dt, soft, damp,
                tile_i=tile_i, tile_j=tile_j, interpret=interpret,
                variant=variant,
            )
        return nbody_step_xla_vs(
            pos_sh, vel_sh, pos_j, dt, soft, damp, chunk_size=chunk_size
        )

    def accel_vs(pos_sh, pos_j, soft):
        if kernel == "pallas":
            return compute_accel_pallas(
                pos_sh, pos_j, soft,
                tile_i=tile_i, tile_j=tile_j, interpret=interpret,
            )
        return compute_accel_xla_vs(pos_sh, pos_j, soft, chunk_size=chunk_size)

    def _drift_half(pos_sh, vel_sh, dt):
        p_half = pos_sh[:, :3] + vel_sh[:, :3] * (dt / 2)
        return jnp.concatenate([p_half, pos_sh[:, 3:4]], axis=1)

    def _kick_drift(pos_half, vel_sh, acc, dt, damp):
        v3 = (vel_sh[:, :3] + acc * dt) * damp
        p3 = pos_half[:, :3] + v3 * (dt / 2)
        new_pos = jnp.concatenate([p3, pos_half[:, 3:4]], axis=1)
        new_vel = jnp.concatenate([v3, vel_sh[:, 3:4]], axis=1)
        return new_pos, new_vel

    def _ring_accel(pos_i, soft):
        fn = _ring_accel_fn(lambda p, j: accel_vs(p, j, soft), axis, ndev)
        return fn(pos_i)

    def _hermite(pos_sh, vel_sh, dt, soft, damp, *, use_ring: bool):
        from nbody_tpu.ops.reference import (
            _accel_jerk_rows,
            nbody_step_hermite,
        )

        eps2 = jnp.asarray(soft, pos_sh.dtype) ** 2

        # the acc+jerk kernel has its own tuned tile defaults; only
        # EXPLICIT caller tiles take precedence (None-sentinel, see above)
        from nbody_tpu.ops.pallas_kernel import AJ_TILE_I, AJ_TILE_J

        aj_ti = tile_i if explicit_i else AJ_TILE_I
        aj_tj = tile_j if explicit_j else AJ_TILE_J

        def aj_vs(p_sh, v_sh, p_j, v_j):
            if kernel == "pallas":
                from nbody_tpu.ops.pallas_kernel import compute_accel_jerk_pallas

                return compute_accel_jerk_pallas(
                    p_sh, v_sh, p_j, v_j, soft,
                    tile_i=aj_ti, tile_j=aj_tj, interpret=interpret)
            return _accel_jerk_rows(p_sh[:, :3], v_sh[:, :3],
                                    p_j[:, :3], v_j[:, :3], p_j[:, 3], eps2)

        aj = (_ring_aj_fn(aj_vs, axis, ndev) if use_ring
              else _allgather_aj_fn(aj_vs, axis))
        return nbody_step_hermite(pos_sh, vel_sh, dt, soft, damp,
                                  accel_jerk_fn=aj)

    def local_allgather(pos_sh, vel_sh, dt, soft, damp):
        if integrator == "hermite":
            return _hermite(pos_sh, vel_sh, dt, soft, damp, use_ring=False)
        if integrator == "leapfrog":
            pos_half = _drift_half(pos_sh, vel_sh, dt)
            acc = _allgather_accel_fn(
                lambda p, j: accel_vs(p, j, soft), axis)(pos_half)
            return _kick_drift(pos_half, vel_sh, acc, dt, damp)
        all_pos = jax.lax.all_gather(pos_sh, axis, axis=0, tiled=True)
        return step_vs(pos_sh, vel_sh, all_pos, dt, soft, damp)

    def local_ring(pos_sh, vel_sh, dt, soft, damp):
        if integrator == "hermite":
            return _hermite(pos_sh, vel_sh, dt, soft, damp, use_ring=True)
        if integrator == "leapfrog":
            pos_half = _drift_half(pos_sh, vel_sh, dt)
            acc = _ring_accel(pos_half, soft)
            return _kick_drift(pos_half, vel_sh, acc, dt, damp)
        acc = _ring_accel(pos_sh, soft)
        return integrate(pos_sh, vel_sh, acc, dt, damp)

    def local_ring_fused(pos_sh, vel_sh, dt, soft, damp):
        from nbody_tpu.ops.ring_kernel import ring_accel_fused

        if integrator == "leapfrog":
            pos_half = _drift_half(pos_sh, vel_sh, dt)
            acc = ring_accel_fused(
                pos_half, soft, axis=axis, ndev=ndev, tile_i=tile_i,
                interpret=interpret,
            )
            return _kick_drift(pos_half, vel_sh, acc, dt, damp)
        acc = ring_accel_fused(
            pos_sh, soft, axis=axis, ndev=ndev, tile_i=tile_i,
            interpret=interpret,
        )
        return integrate(pos_sh, vel_sh, acc, dt, damp)

    def local_auto(pos_sh, vel_sh, dt, soft, damp):
        # shapes are static under tracing, so this resolves per-shape at
        # compile time — no runtime branch in the compiled program
        n_global = pos_sh.shape[0] * ndev
        if choose_strategy(n_global, ndev) == "ring":
            return local_ring(pos_sh, vel_sh, dt, soft, damp)
        return local_allgather(pos_sh, vel_sh, dt, soft, damp)

    def local_sym(pos_sh, vel_sh, dt, soft, damp):
        # the sym kernels have their own tuned tiles (None-sentinel
        # semantics as elsewhere: explicit caller tiles always win)
        from nbody_tpu.ops.symmetric_kernel import (
            AJ_SYM_TILE_J,
            DEFAULT_TILE_J_SYM_BLOCKED,
            TI,
        )

        s_ti = tile_i if explicit_i else TI
        if integrator == "hermite":
            from nbody_tpu.ops.reference import nbody_step_hermite

            aj_tj = tile_j if explicit_j else AJ_SYM_TILE_J
            ajf = _sym_sharded_aj_fn(axis, ndev, tile_i=s_ti, tile_j=aj_tj,
                                     interpret=interpret)
            return nbody_step_hermite(
                pos_sh, vel_sh, dt, soft, damp,
                accel_jerk_fn=lambda p, v: ajf(p, v, soft))
        s_tj = tile_j if explicit_j else DEFAULT_TILE_J_SYM_BLOCKED
        accel = _sym_sharded_accel_fn(axis, ndev, tile_i=s_ti, tile_j=s_tj,
                                      interpret=interpret)
        if integrator == "leapfrog":
            pos_half = _drift_half(pos_sh, vel_sh, dt)
            acc = accel(pos_half, soft)
            return _kick_drift(pos_half, vel_sh, acc, dt, damp)
        acc = accel(pos_sh, soft)
        return integrate(pos_sh, vel_sh, acc, dt, damp)

    local = {
        "allgather": local_allgather,
        "ring": local_ring,
        "ring_fused": local_ring_fused,
        "auto": local_auto,
        "sym": local_sym,
    }[strategy]

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


def make_sharded_step_2d(
    mesh: Mesh,
    *,
    axes: tuple = ("rows", "cols"),
    kernel: str = "pallas",
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
    chunk_size: int | None = None,
    integrator: str = "euler",
):
    """2-D force decomposition over a (rows × cols) mesh — the pod-scale
    strategy for all-pairs N-body (the parallel-matmul analogue of the
    1-D body shard).

    Bodies shard into R·C equal chunks, P(("rows", "cols"), None). Device
    (r, c) gathers its **i-set** (the N/R bodies of row-block r) with an
    all_gather over the "cols" axis and its **j-set** (the N/C bodies of
    column-block c) with an all_gather over "rows", computes the
    (N/R × N/C) interaction block on the fused kernel, and a psum over
    "cols" completes each row-block's forces. Per-device ICI traffic is
    O(N/R + N/C) instead of the 1-D strategies' O(N): at 256 chips
    (16×16), an N=16M step moves ~2·16 MB per chip instead of 256 MB —
    and no chip ever materializes more than max(N/R, N/C) foreign bodies.

    Works with every integrator (euler / leapfrog / hermite) by plugging
    the decomposed force evaluation into the chunk-local update; hermite
    additionally gathers velocities along both axes for the jerk.
    Single-chip-equality-tested on a virtual 2×4 mesh.
    """
    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if kernel not in ("pallas", "xla"):
        raise ValueError(f"unknown kernel {kernel!r}")
    row_ax, col_ax = axes
    # None-sentinel tiles, as in make_sharded_step (advisor r2 item 2)
    explicit_i, explicit_j = tile_i is not None, tile_j is not None
    tile_i = DEFAULT_TILE_I if tile_i is None else tile_i
    tile_j = DEFAULT_TILE_J if tile_j is None else tile_j

    def accel_vs(pos_i, pos_j, soft):
        if kernel == "pallas":
            return compute_accel_pallas(
                pos_i, pos_j, soft,
                tile_i=tile_i, tile_j=tile_j, interpret=interpret,
            )
        return compute_accel_xla_vs(pos_i, pos_j, soft,
                                    chunk_size=chunk_size)

    def _chunk_slice(block, nloc):
        # this chunk's rows within its row-block (replicated post-psum)
        c = jax.lax.axis_index(col_ax)
        return jax.lax.dynamic_slice_in_dim(
            block, (c * nloc).astype(jnp.int32), nloc, axis=0)

    def local(pos_ch, vel_ch, dt, soft, damp):
        from nbody_tpu.ops.reference import (
            _accel_jerk_rows,
            integrate,
            nbody_step_hermite,
            nbody_step_leapfrog,
        )

        nloc = pos_ch.shape[0]

        def accel_fn(p_ch):
            i_pos = jax.lax.all_gather(p_ch, col_ax, axis=0, tiled=True)
            j_pos = jax.lax.all_gather(p_ch, row_ax, axis=0, tiled=True)
            acc = jax.lax.psum(accel_vs(i_pos, j_pos, soft), col_ax)
            return _chunk_slice(acc, nloc)

        if integrator == "hermite":
            eps2 = jnp.asarray(soft, pos_ch.dtype) ** 2

            # None-sentinel semantics as in make_sharded_step: explicit
            # caller tiles win, otherwise the acc+jerk tuned defaults
            from nbody_tpu.ops.pallas_kernel import AJ_TILE_I, AJ_TILE_J

            aj_ti = tile_i if explicit_i else AJ_TILE_I
            aj_tj = tile_j if explicit_j else AJ_TILE_J

            def aj_fn(p_ch, v_ch):
                i_pos = jax.lax.all_gather(p_ch, col_ax, axis=0, tiled=True)
                i_vel = jax.lax.all_gather(v_ch, col_ax, axis=0, tiled=True)
                j_pos = jax.lax.all_gather(p_ch, row_ax, axis=0, tiled=True)
                j_vel = jax.lax.all_gather(v_ch, row_ax, axis=0, tiled=True)
                if kernel == "pallas":
                    from nbody_tpu.ops.pallas_kernel import (
                        compute_accel_jerk_pallas,
                    )

                    a, jk = compute_accel_jerk_pallas(
                        i_pos, i_vel, j_pos, j_vel, soft,
                        tile_i=aj_ti, tile_j=aj_tj, interpret=interpret)
                else:
                    a, jk = _accel_jerk_rows(
                        i_pos[:, :3], i_vel[:, :3], j_pos[:, :3],
                        j_vel[:, :3], j_pos[:, 3], eps2)
                a = jax.lax.psum(a, col_ax)
                jk = jax.lax.psum(jk, col_ax)
                return _chunk_slice(a, nloc), _chunk_slice(jk, nloc)

            return nbody_step_hermite(pos_ch, vel_ch, dt, soft, damp,
                                      accel_jerk_fn=aj_fn)
        if integrator == "leapfrog":
            return nbody_step_leapfrog(pos_ch, vel_ch, dt, 0.0, damp,
                                       accel_fn=accel_fn)
        return integrate(pos_ch, vel_ch, accel_fn(pos_ch), dt, damp)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes, None), P(), P(), P()),
        out_specs=(P(axes, None), P(axes, None)),
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


def make_sharded_rollout(step_fn, steps: int):
    """Wrap a sharded step into a single-jit multi-step rollout (lax.scan)."""

    @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
    def rollout(pos, vel, dt, softening, damping):
        def body(state, _):
            p, v = state
            return step_fn(p, v, dt, softening, damping), None

        (pos_f, vel_f), _ = jax.lax.scan(body, (pos, vel), None, length=steps)
        return pos_f, vel_f

    return rollout


def make_sharded_adaptive_rollout(
    mesh: Mesh,
    *,
    softening,
    damping,
    eta: float,
    dt_min: float,
    dt_max: float,
    steps: int,
    axis: str = BODY_AXIS,
    kernel: str = "pallas",
    strategy: str = "auto",
    integrator: str = "euler",
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
    chunk_size: int | None = None,
):
    """Body-sharded adaptive-timestep rollout: (pos, vel) -> (pos, vel,
    stats), pos/vel sharded P(axis, None), stats the replicated (4,)
    [t, dt_last, dt_lo, dt_hi] array of ops.adaptive.

    The single-device design (ops/adaptive.py) composes directly with
    the mesh: each device evaluates forces for its i-shard through the
    same allgather/ring collectives as make_sharded_step, and the
    GLOBAL dt criterion needs exactly one extra scalar collective per
    step — a pmax of the local max |a|² (pmin of |a|/|j| for hermite)
    over the body axis, bytes-free next to the position gather. Every
    shard therefore steps with the same dt and the scan stays fully
    inside one compiled shard_map dispatch. Like the fixed-dt sharded
    paths, softening/damping are baked (the criterion folds softening
    into the compiled scan).

    strategy: "allgather", "ring", "auto", or "sym" (the Newton's-
    third-law mesh decomposition — each global pair evaluated once, the
    flagship kernel family; its per-shard force closure plugs straight
    into the adaptive scan because the dt criterion only needs the
    local accelerations + one pmax). ring_fused fuses the fixed-dt
    Euler update into its kernel — not composable here.
    """
    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if kernel not in ("pallas", "xla"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if strategy not in ("allgather", "ring", "auto", "sym"):
        raise ValueError(
            "adaptive rollouts support strategies 'allgather'/'ring'/"
            f"'auto'/'sym' (got {strategy!r})")
    if strategy == "sym" and kernel != "pallas":
        raise ValueError(
            "strategy='sym' runs the Newton's-third-law Pallas "
            "kernels; use kernel='pallas'")
    from nbody_tpu.ops.adaptive import make_adaptive_scan

    ndev = mesh.shape[axis]
    explicit_i, explicit_j = tile_i is not None, tile_j is not None
    tile_i = DEFAULT_TILE_I if tile_i is None else tile_i
    tile_j = DEFAULT_TILE_J if tile_j is None else tile_j

    def accel_vs(pos_sh, pos_j):
        if kernel == "pallas":
            return compute_accel_pallas(
                pos_sh, pos_j, softening,
                tile_i=tile_i, tile_j=tile_j, interpret=interpret,
            )
        return compute_accel_xla_vs(pos_sh, pos_j, softening,
                                    chunk_size=chunk_size)

    def _sym_fns():
        """Force closures for strategy='sym': the sharded Newton's-
        third-law kernels with their own tuned tile defaults (explicit
        caller tiles win — the None-sentinel semantics of
        make_sharded_step's local_sym)."""
        from nbody_tpu.ops.symmetric_kernel import (
            AJ_SYM_TILE_J,
            DEFAULT_TILE_J_SYM_BLOCKED,
            TI,
        )

        s_ti = tile_i if explicit_i else TI
        if integrator == "hermite":
            aj_tj = tile_j if explicit_j else AJ_SYM_TILE_J
            sym_aj = _sym_sharded_aj_fn(axis, ndev, tile_i=s_ti,
                                        tile_j=aj_tj, interpret=interpret)
            return None, lambda p, v: sym_aj(p, v, softening)
        s_tj = tile_j if explicit_j else DEFAULT_TILE_J_SYM_BLOCKED
        sym_accel = _sym_sharded_accel_fn(axis, ndev, tile_i=s_ti,
                                          tile_j=s_tj, interpret=interpret)
        return lambda p: sym_accel(p, softening), None

    def local(pos_sh, vel_sh):
        if strategy == "sym":
            accel_fn, aj_fn = _sym_fns()
            run = make_adaptive_scan(
                integrator, accel_fn=accel_fn, accel_jerk_fn=aj_fn,
                softening=softening, damping=damping, eta=eta,
                dt_min=dt_min, dt_max=dt_max, steps=steps, mesh_axis=axis)
            return run(pos_sh, vel_sh)
        n_global = pos_sh.shape[0] * ndev
        use_ring = strategy == "ring" or (
            strategy == "auto"
            and choose_strategy(n_global, ndev) == "ring")

        accel_fn = (_ring_accel_fn(accel_vs, axis, ndev) if use_ring
                    else _allgather_accel_fn(accel_vs, axis))

        aj_fn = None
        if integrator == "hermite":
            from nbody_tpu.ops.pallas_kernel import AJ_TILE_I, AJ_TILE_J
            from nbody_tpu.ops.reference import _accel_jerk_rows

            aj_ti = tile_i if explicit_i else AJ_TILE_I
            aj_tj = tile_j if explicit_j else AJ_TILE_J

            def aj_vs(p_sh, v_sh, p_j, v_j):
                if kernel == "pallas":
                    from nbody_tpu.ops.pallas_kernel import (
                        compute_accel_jerk_pallas,
                    )

                    return compute_accel_jerk_pallas(
                        p_sh, v_sh, p_j, v_j, softening,
                        tile_i=aj_ti, tile_j=aj_tj, interpret=interpret)
                # square in the STATE dtype (an fp64 run must keep eps^2
                # at fp64, matching the fixed-dt sharded hermite)
                eps2 = jnp.asarray(softening, p_sh.dtype) ** 2
                return _accel_jerk_rows(
                    p_sh[:, :3], v_sh[:, :3], p_j[:, :3], v_j[:, :3],
                    p_j[:, 3], eps2)

            aj_fn = (_ring_aj_fn(aj_vs, axis, ndev) if use_ring
                     else _allgather_aj_fn(aj_vs, axis))

        run = make_adaptive_scan(
            integrator, accel_fn=accel_fn, accel_jerk_fn=aj_fn,
            softening=softening, damping=damping, eta=eta,
            dt_min=dt_min, dt_max=dt_max, steps=steps, mesh_axis=axis)
        return run(pos_sh, vel_sh)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        # stats are replicated: the criterion pmax/pmin makes every
        # device's dt (hence its stats carry) identical
        out_specs=(P(axis, None), P(axis, None), P()),
        check_vma=False,
    )

    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sharded_adaptive_rollout_2d(
    mesh: Mesh,
    *,
    softening,
    damping,
    eta: float,
    dt_min: float,
    dt_max: float,
    steps: int,
    axes: tuple = ("rows", "cols"),
    kernel: str = "pallas",
    integrator: str = "euler",
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
    chunk_size: int | None = None,
):
    """Adaptive global timestep over the 2-D (rows × cols) decomposition:
    (pos, vel) -> (pos, vel, stats), pos/vel sharded P(axes, None).

    Exactly the 1-D design (make_sharded_adaptive_rollout) on the 2-D
    force evaluation of make_sharded_step_2d: each device evaluates its
    chunk's forces through the two-axis gathers + cols-psum, and the
    GLOBAL dt criterion is ONE pmax (pmin for hermite) over BOTH mesh
    axes — jax.lax.pmax takes the axis-name tuple directly, so the
    criterion costs a single scalar collective per step here too. Every
    chunk steps with the same dt; stats replicate."""
    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if kernel not in ("pallas", "xla"):
        raise ValueError(f"unknown kernel {kernel!r}")
    from nbody_tpu.ops.adaptive import make_adaptive_scan

    row_ax, col_ax = axes
    explicit_i, explicit_j = tile_i is not None, tile_j is not None
    tile_i = DEFAULT_TILE_I if tile_i is None else tile_i
    tile_j = DEFAULT_TILE_J if tile_j is None else tile_j

    def accel_vs(pos_i, pos_j):
        if kernel == "pallas":
            return compute_accel_pallas(
                pos_i, pos_j, softening,
                tile_i=tile_i, tile_j=tile_j, interpret=interpret,
            )
        return compute_accel_xla_vs(pos_i, pos_j, softening,
                                    chunk_size=chunk_size)

    def local(pos_ch, vel_ch):
        nloc = pos_ch.shape[0]

        def _chunk_slice(block):
            c = jax.lax.axis_index(col_ax)
            return jax.lax.dynamic_slice_in_dim(
                block, (c * nloc).astype(jnp.int32), nloc, axis=0)

        def accel_fn(p_ch):
            i_pos = jax.lax.all_gather(p_ch, col_ax, axis=0, tiled=True)
            j_pos = jax.lax.all_gather(p_ch, row_ax, axis=0, tiled=True)
            acc = jax.lax.psum(accel_vs(i_pos, j_pos), col_ax)
            return _chunk_slice(acc)

        aj_fn = None
        if integrator == "hermite":
            from nbody_tpu.ops.pallas_kernel import AJ_TILE_I, AJ_TILE_J
            from nbody_tpu.ops.reference import _accel_jerk_rows

            aj_ti = tile_i if explicit_i else AJ_TILE_I
            aj_tj = tile_j if explicit_j else AJ_TILE_J

            def aj_fn(p_ch, v_ch):
                i_pos = jax.lax.all_gather(p_ch, col_ax, axis=0,
                                           tiled=True)
                i_vel = jax.lax.all_gather(v_ch, col_ax, axis=0,
                                           tiled=True)
                j_pos = jax.lax.all_gather(p_ch, row_ax, axis=0,
                                           tiled=True)
                j_vel = jax.lax.all_gather(v_ch, row_ax, axis=0,
                                           tiled=True)
                if kernel == "pallas":
                    from nbody_tpu.ops.pallas_kernel import (
                        compute_accel_jerk_pallas,
                    )

                    a, jk = compute_accel_jerk_pallas(
                        i_pos, i_vel, j_pos, j_vel, softening,
                        tile_i=aj_ti, tile_j=aj_tj, interpret=interpret)
                else:
                    eps2 = jnp.asarray(softening, p_ch.dtype) ** 2
                    a, jk = _accel_jerk_rows(
                        i_pos[:, :3], i_vel[:, :3], j_pos[:, :3],
                        j_vel[:, :3], j_pos[:, 3], eps2)
                a = jax.lax.psum(a, col_ax)
                jk = jax.lax.psum(jk, col_ax)
                return _chunk_slice(a), _chunk_slice(jk)

        run = make_adaptive_scan(
            integrator, accel_fn=accel_fn, accel_jerk_fn=aj_fn,
            softening=softening, damping=damping, eta=eta,
            dt_min=dt_min, dt_max=dt_max, steps=steps,
            mesh_axis=(row_ax, col_ax))
        return run(pos_ch, vel_ch)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes, None)),
        # stats replicate: the two-axis pmax/pmin makes every chunk's dt
        # (hence its stats carry) identical
        out_specs=(P(axes, None), P(axes, None), P()),
        check_vma=False,
    )

    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sharded_ds_step(mesh: Mesh, *, axis: str = BODY_AXIS,
                         tile_i: int | None = None,
                         tile_j: int | None = None,
                         interpret: bool = False,
                         integrator: str = "euler",
                         strategy: str = "allgather"):
    """Body-sharded double-single (fp64-grade) step: (pos_hi, pos_lo,
    vel_hi, vel_lo, scal) -> same four arrays, each sharded P(axis, None).

    allgather strategy (default): the hi AND lo position planes gather
    over ICI (2x the fp32 strategy's bytes — still ~32 MB at 1M bodies),
    each chip runs the fused ds kernel on its local i-shard vs the
    gathered j-set. `scal` is the (2, 4) hi/lo parameter block
    (ops.ds_kernel._scal_ds).

    strategy="ring": the j-planes rotate around the ICI ring via
    `ppermute` inside a scan (the fp32 `_ring_accel_fn` dataflow: hop 0
    evaluates the local shard outside the scan, so exactly D-1 permutes
    are issued per force round), one accel-ONLY ds kernel call per hop
    (`compute_accel_pallas_ds` / `compute_accel_jerk_pallas_ds`), with
    the per-hop partial forces
    accumulated in anchored XLA-level ds (`ds_add`) so no fp32 summation
    error leaks between hops; integration happens once after the last
    hop (`_ds_integrate` / `ds_leapfrog_finish` / hermite corrector).
    Peak live j-bytes drop from O(N) to O(N/D) and the async permute
    overlaps hop k+1's transfer with hop k's compute — worth the most
    for ds, whose gathered planes are 2x (euler) to 4x (leapfrog /
    hermite) the fp32 strategy's bytes. Results differ from allgather
    only by ds-level reduction order (partials per hop vs one in-kernel
    sweep).

    integrator="leapfrog" composes the fused DKD kernel: the j-side
    velocity planes gather too (4 planes, 2x the euler bytes) because
    the kernel evaluates forces at half-drifted positions on both sides
    of each pair; `scal` must then come from _scal_ds_leapfrog. Same
    per-shard arithmetic as the single-device DKD step — both half-drift
    from the same gathered start-of-step state (exact under Mosaic; CPU
    interpret carries the ds_kernel FMA-contraction caveat). Under the
    ring, every shard half-drifts ONCE at the XLA level (bit-identical
    op sequence — ds_kernel.ds_half_drift) and the DRIFTED planes
    rotate, so only 2 planes ride the ring instead of 4.

    integrator="hermite" composes the 4th-order P(EC) scheme: TWO
    gather rounds per step (start state, then the locally-predicted
    state — the correct-eval needs every j body at its predicted
    position, and predictions only exist shard-locally because they
    need that shard's a0/j0), each followed by a local-i-vs-gathered-j
    ds accel+jerk kernel; the O(N/D) predictor/corrector polynomials
    run at the XLA level per shard, identical ds arithmetic to the
    single-device step. `scal` from _scal_ds_hermite. Under the ring,
    each round rotates the 4 j-planes with ds-accumulated (acc, jerk)
    partials per hop.
    """
    from nbody_tpu.ops.ds_kernel import (
        DS_HERMITE_TILE_J,
        DS_TILE_I,
        DS_TILE_J,
        compute_accel_jerk_pallas_ds,
        compute_accel_pallas_ds,
        ds_add,
        ds_half_drift,
        ds_leapfrog_finish,
        hermite_assemble,
        hermite_correct,
        hermite_planes,
        hermite_predict,
        nbody_step_pallas_ds_leapfrog_vs,
        nbody_step_pallas_ds_vs,
    )
    from nbody_tpu.ops.ds_kernel import (
        _ds_integrate,  # noqa: PLC2701 — the ds integrator halves share it
    )

    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(
            f"make_sharded_ds_step: integrator must be 'euler', "
            f"'leapfrog', or 'hermite', got {integrator!r}")
    if strategy not in ("allgather", "ring"):
        raise ValueError(
            f"make_sharded_ds_step: strategy must be 'allgather' or "
            f"'ring', got {strategy!r}")
    ndev = int(mesh.shape[axis])
    perm = [(d, (d + 1) % ndev) for d in range(ndev)]
    ti = DS_TILE_I if tile_i is None else tile_i
    tj = ((DS_HERMITE_TILE_J if integrator == "hermite" else DS_TILE_J)
          if tile_j is None else tile_j)

    def _ring_ds_accel(iph, ipl, fscal):
        """ds forces on the local i-shard from the whole body set, j-shard
        rotating: per-hop accel-only kernel + anchored ds accumulation."""
        def hop(carry, _):
            jh, jl, acch, accl = carry
            jh = jax.lax.ppermute(jh, axis, perm)
            jl = jax.lax.ppermute(jl, axis, perm)
            ah, al = compute_accel_pallas_ds(
                iph, ipl, jh, jl, fscal,
                tile_i=ti, tile_j=tj, interpret=interpret)
            s = ds_add((acch, accl), (ah, al))
            return (jh, jl, s[0], s[1]), None

        # hop 0 (local shard) outside the scan: ndev-1 ppermutes total
        # (a rotate after the final kernel would be a dead collective
        # on exactly the j-bytes this strategy exists to minimize)
        a0h, a0l = compute_accel_pallas_ds(
            iph, ipl, iph, ipl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        (_, _, acch, accl), _ = jax.lax.scan(
            hop, (iph, ipl, a0h, a0l), None, length=ndev - 1)
        return acch, accl

    def _ring_ds_aj(iph, ipl, ivh, ivl, fscal):
        """Hermite's (acc, jerk) ds force evaluation, j-planes rotating."""
        def hop(carry, _):
            jh, jl, jvh, jvl, ach, acl, jkh, jkl = carry
            jh, jl, jvh, jvl = (jax.lax.ppermute(x, axis, perm)
                                for x in (jh, jl, jvh, jvl))
            ah, al, jh_, jl_ = compute_accel_jerk_pallas_ds(
                iph, ipl, ivh, ivl, jh, jl, jvh, jvl, fscal,
                tile_i=ti, tile_j=tj, interpret=interpret)
            sa = ds_add((ach, acl), (ah, al))
            sj = ds_add((jkh, jkl), (jh_, jl_))
            return (jh, jl, jvh, jvl, sa[0], sa[1], sj[0], sj[1]), None

        # hop 0 (local shard) outside the scan: ndev-1 rotates of the
        # 4 j-planes per force round instead of ndev (see _ring_ds_accel)
        a0h, a0l, jk0h, jk0l = compute_accel_jerk_pallas_ds(
            iph, ipl, ivh, ivl, iph, ipl, ivh, ivl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        (_, _, _, _, ach, acl, jkh, jkl), _ = jax.lax.scan(
            hop, (iph, ipl, ivh, ivl, a0h, a0l, jk0h, jk0l), None,
            length=ndev - 1)
        return ach, acl, jkh, jkl

    def _hermite_step(ph, plo, vh, vlo, scal):
        fscal = scal[:, :4]

        def gather4(a, b, c, d):
            return tuple(jax.lax.all_gather(x, axis, axis=0, tiled=True)
                         for x in (a, b, c, d))

        def aj_eval(iph, ipl, ivh, ivl):
            if strategy == "ring":
                return _ring_ds_aj(iph, ipl, ivh, ivl, fscal)
            jh, jl, jvh, jvl = gather4(iph, ipl, ivh, ivl)
            return compute_accel_jerk_pallas_ds(
                iph, ipl, ivh, ivl, jh, jl, jvh, jvl, fscal,
                tile_i=ti, tile_j=tj, interpret=interpret)

        a0h, a0l, j0h, j0l = aj_eval(ph, plo, vh, vlo)

        x0, v0 = hermite_planes(ph, plo), hermite_planes(vh, vlo)
        a0, j0 = hermite_planes(a0h, a0l), hermite_planes(j0h, j0l)

        xp, vp = hermite_predict(x0, v0, a0, j0, scal)
        pph, ppl = hermite_assemble(xp, ph[:, 3:4], plo[:, 3:4])
        vph, vpl = hermite_assemble(vp, vh[:, 3:4], vlo[:, 3:4])

        a1h, a1l, j1h, j1l = aj_eval(pph, ppl, vph, vpl)
        a1, j1 = hermite_planes(a1h, a1l), hermite_planes(j1h, j1l)

        x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, scal)
        nph, npl = hermite_assemble(x1, ph[:, 3:4], plo[:, 3:4])
        nvh, nvl = hermite_assemble(v1, vh[:, 3:4], vlo[:, 3:4])
        return nph, npl, nvh, nvl

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),) * 4 + (P(),),
        out_specs=(P(axis, None),) * 4,
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    def step(ph, plo, vh, vlo, scal):
        if integrator == "hermite":
            return _hermite_step(ph, plo, vh, vlo, scal)
        if integrator == "leapfrog":
            if strategy == "ring":
                # Drift every shard ONCE at the XLA level (bit-identical
                # op sequence to the fused kernel's in-kernel drift) and
                # rotate the DRIFTED position planes — 2 planes on the
                # ring instead of the allgather path's 4.
                hh, hl = ds_half_drift(ph, plo, vh, vlo, scal)
                acc = _ring_ds_accel(hh, hl, scal[:, :4])
                return ds_leapfrog_finish(hh, hl, vh, vlo, acc, scal)
            jh = jax.lax.all_gather(ph, axis, axis=0, tiled=True)
            jl = jax.lax.all_gather(plo, axis, axis=0, tiled=True)
            jvh = jax.lax.all_gather(vh, axis, axis=0, tiled=True)
            jvl = jax.lax.all_gather(vlo, axis, axis=0, tiled=True)
            return nbody_step_pallas_ds_leapfrog_vs(
                ph, plo, vh, vlo, jh, jl, jvh, jvl, scal,
                tile_i=ti, tile_j=tj, interpret=interpret)
        if strategy == "ring":
            acc = _ring_ds_accel(ph, plo, scal[:, :4])
            return _ds_integrate(ph, plo, vh, vlo, acc, scal)
        jh = jax.lax.all_gather(ph, axis, axis=0, tiled=True)
        jl = jax.lax.all_gather(plo, axis, axis=0, tiled=True)
        return nbody_step_pallas_ds_vs(ph, plo, vh, vlo, jh, jl, scal,
                                       tile_i=ti, tile_j=tj,
                                       interpret=interpret)

    return step


def _make_ds_col_reduce_scatter(col_ax, ncols: int, col_perm, ds_add):
    """Build the anchored-ds ring reduce-scatter over the cols axis
    (shared by the fixed-dt and adaptive ds 2-D builders).

    The returned fn takes (pairs, nloc): pairs is a list of (hi, lo)
    planes, each (C·nloc, k) — this device's one-sided partial forces
    for its FULL row-block i-set — and returns the list reduced to
    (nloc, k) chunks: this device's own bodies' forces with all C
    column partials ds-added. Chunk c's sum order is
    P_{c+1} + ... + P_{c} around the ring — deterministic, the same
    for every step."""

    def reduce_scatter(pairs, nloc):
        if ncols == 1:
            return [(h, lo) for h, lo in pairs]
        c = jax.lax.axis_index(col_ax)
        resh = [(h.reshape(ncols, nloc, h.shape[-1]),
                 lo.reshape(ncols, nloc, lo.shape[-1])) for h, lo in pairs]

        def chunk(x, idx):
            return jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=0)[0]

        # device c seeds chunk (c-1)%C; at hop s it receives the ring
        # neighbour's accumulator and ds-adds its own partial of chunk
        # (c-s-1)%C — after C-1 hops it holds chunk c, fully reduced
        idx0 = jnp.mod(c - 1, ncols).astype(jnp.int32)
        acc = tuple((chunk(h, idx0), chunk(lo, idx0)) for h, lo in resh)

        def hop(carry, s):
            idx = jnp.mod(c - s - 1, ncols).astype(jnp.int32)
            out = []
            for (ah, al), (h, lo) in zip(carry, resh):
                ah = jax.lax.ppermute(ah, col_ax, col_perm)
                al = jax.lax.ppermute(al, col_ax, col_perm)
                out.append(ds_add((ah, al), (chunk(h, idx), chunk(lo, idx))))
            return tuple(out), None

        acc, _ = jax.lax.scan(hop, acc, jnp.arange(1, ncols))
        return list(acc)

    return reduce_scatter


def make_sharded_ds_step_2d(mesh: Mesh, *, axes: tuple = ("rows", "cols"),
                            tile_i: int | None = None,
                            tile_j: int | None = None,
                            interpret: bool = False,
                            integrator: str = "euler"):
    """2-D (rows × cols) force decomposition at double-single (fp64-grade)
    precision — the pod-scale ds strategy.

    Same dataflow as the fp32 `make_sharded_step_2d`: bodies shard into
    R·C chunks P(axes, None); device (r, c) all-gathers its row-block
    i-planes over "cols" and its column-block j-planes over "rows" and
    evaluates the (N/R × N/C) ds interaction block with the one-sided
    accel kernels (`compute_accel_pallas_ds` / the hermite aj form) —
    with ONE structural substitution: the fp32 path's col-axis `psum`
    would re-round the C per-column ds partials at float32, losing
    exactly the ~20 low bits the format exists to keep. Instead the
    partials ride a **ring reduce-scatter over the cols axis with
    anchored ds adds**: C-1 `ppermute` hops, each accumulating one
    N/(R·C)-row chunk via `ds_add` (the same anchored two-sum the ds
    ring strategy uses per hop), so device (r, c) ends holding its OWN
    chunk's force with every partial combined at ds precision and in a
    deterministic ring order. Reduce-scatter bytes are (C-1)/C · N/R
    rows/device — the same order as the gathers, vs an all-reduce's 2×.

    Per-device ICI traffic stays O(N/R + N/C) per plane pair (2 planes
    euler/leapfrog, 4 hermite): at 256 chips (16×16) and fp64-grade
    precision this moves ~2·2·16 MB per chip for N=16M where the 1-D ds
    allgather moves 512 MB — the reason this path exists (ds pays 2-4×
    the fp32 gather bytes, so the 2-D byte reduction matters MORE here).

    Integrators: euler (accel + XLA-level ds integrate), leapfrog (each
    chunk half-drifts ONCE at the XLA level — `ds_half_drift`, the
    bit-identical op sequence to the fused kernel's in-kernel drift —
    and the DRIFTED planes gather), hermite (two gather+reduce-scatter
    rounds: start state, then the chunk-locally-predicted state; acc and
    jerk share one reduce-scatter scan). Results differ from the 1-D
    allgather/single-device step only by ds-level reduction order
    (per-column partials vs one in-kernel j-sweep), like the ds ring.

    Reference analogue: beyond `bodysystemcuda.cu` (single-GPU); this is
    SURVEY §7's pod-scale mandate at the fp64-grade tier.
    """
    from nbody_tpu.ops.ds_kernel import (
        DS_HERMITE_TILE_J,
        DS_TILE_I,
        DS_TILE_J,
        compute_accel_jerk_pallas_ds,
        compute_accel_pallas_ds,
        ds_add,
        ds_half_drift,
        ds_leapfrog_finish,
        hermite_assemble,
        hermite_correct,
        hermite_planes,
        hermite_predict,
    )
    from nbody_tpu.ops.ds_kernel import (
        _ds_integrate,  # noqa: PLC2701 — shared with the 1-D ds strategies
    )

    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if len(axes) != 2:
        raise ValueError(f"need a (rows, cols) axis pair, got {axes!r}")
    row_ax, col_ax = axes
    ncols = int(mesh.shape[col_ax])
    col_perm = [(d, (d + 1) % ncols) for d in range(ncols)]
    ti = DS_TILE_I if tile_i is None else tile_i
    tj = ((DS_HERMITE_TILE_J if integrator == "hermite" else DS_TILE_J)
          if tile_j is None else tile_j)

    def ag_cols(x):
        return jax.lax.all_gather(x, col_ax, axis=0, tiled=True)

    def ag_rows(x):
        return jax.lax.all_gather(x, row_ax, axis=0, tiled=True)

    _ds_col_reduce_scatter = _make_ds_col_reduce_scatter(
        col_ax, ncols, col_perm, ds_add)

    def _accel_2d(ph, plo, fscal, nloc):
        iph, ipl = ag_cols(ph), ag_cols(plo)
        jph, jpl = ag_rows(ph), ag_rows(plo)
        ah, al = compute_accel_pallas_ds(
            iph, ipl, jph, jpl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        (acc,) = _ds_col_reduce_scatter([(ah, al)], nloc)
        return acc

    def _aj_2d(ph, plo, vh, vlo, fscal, nloc):
        iph, ipl, ivh, ivl = (ag_cols(x) for x in (ph, plo, vh, vlo))
        jph, jpl, jvh, jvl = (ag_rows(x) for x in (ph, plo, vh, vlo))
        ah, al, jkh, jkl = compute_accel_jerk_pallas_ds(
            iph, ipl, ivh, ivl, jph, jpl, jvh, jvl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        return _ds_col_reduce_scatter([(ah, al), (jkh, jkl)], nloc)

    def _hermite_step(ph, plo, vh, vlo, scal):
        fscal = scal[:, :4]
        nloc = ph.shape[0]
        (a0h, a0l), (j0h, j0l) = _aj_2d(ph, plo, vh, vlo, fscal, nloc)
        x0, v0 = hermite_planes(ph, plo), hermite_planes(vh, vlo)
        a0, j0 = hermite_planes(a0h, a0l), hermite_planes(j0h, j0l)
        xp, vp = hermite_predict(x0, v0, a0, j0, scal)
        pph, ppl = hermite_assemble(xp, ph[:, 3:4], plo[:, 3:4])
        vph, vpl = hermite_assemble(vp, vh[:, 3:4], vlo[:, 3:4])
        (a1h, a1l), (j1h, j1l) = _aj_2d(pph, ppl, vph, vpl, fscal, nloc)
        a1, j1 = hermite_planes(a1h, a1l), hermite_planes(j1h, j1l)
        x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, scal)
        nph, npl = hermite_assemble(x1, ph[:, 3:4], plo[:, 3:4])
        nvh, nvl = hermite_assemble(v1, vh[:, 3:4], vlo[:, 3:4])
        return nph, npl, nvh, nvl

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axes, None),) * 4 + (P(),),
        out_specs=(P(axes, None),) * 4,
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    def step(ph, plo, vh, vlo, scal):
        nloc = ph.shape[0]
        if integrator == "hermite":
            return _hermite_step(ph, plo, vh, vlo, scal)
        if integrator == "leapfrog":
            hh, hl = ds_half_drift(ph, plo, vh, vlo, scal)
            acc = _accel_2d(hh, hl, scal[:, :4], nloc)
            return ds_leapfrog_finish(hh, hl, vh, vlo, acc, scal)
        acc = _accel_2d(ph, plo, scal[:, :4], nloc)
        return _ds_integrate(ph, plo, vh, vlo, acc, scal)

    return step


def make_sharded_ds_adaptive_rollout(
    mesh: Mesh,
    *,
    axis: str = BODY_AXIS,
    integrator: str = "euler",
    softening,
    damping,
    eta: float,
    dt_min: float,
    dt_max: float,
    steps: int,
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
):
    """Body-sharded double-single ADAPTIVE-timestep rollout: (pos_hi,
    pos_lo, vel_hi, vel_lo) -> same four sharded planes + the replicated
    (4,) f32 stats [t, dt_last, dt_lo, dt_hi] of ops.adaptive.

    Composes the two designs that already exist separately: the sharded
    ds step's allgather decomposition (make_sharded_ds_step — hi/lo
    planes gather, local i-shard vs gathered j-set) and the ds adaptive
    rollout's traced-dt scal rebuild (ops.ds_kernel.ds_scal_with_dt,
    criterion in f32 on the HI planes). Per step, each shard:

    1. gathers the j-side hi (and lo) planes once,
    2. evaluates the f32 criterion kernel for its LOCAL i rows against
       the gathered hi planes and pmax/pmin-reduces the scalar over the
       body axis (one bytes-free collective — every shard steps with
       the same global dt; the local-rows-vs-full-j-set form keeps each
       row's reduction order identical to the single-device criterion,
       so the chosen dt matches it EXACTLY, not just approximately),
    3. rebuilds the scal block's dt columns from the traced dt and runs
       the same local ds kernel as the fixed-dt sharded step (hermite:
       the P(EC) second gather round, reusing round-1 gathers for its
       criterion).

    The scan stays inside ONE compiled shard_map dispatch, like the
    fixed-dt sharded rollouts. allgather only (the sharded ds family's
    strategy; the criterion is a few-percent f32 add-on next to the
    ~20x ds arithmetic).
    """
    from nbody_tpu.ops.adaptive import aarseth_timestep, accel_timestep
    from nbody_tpu.ops.ds_kernel import (
        DS_HERMITE_TILE_J,
        DS_TILE_I,
        DS_TILE_J,
        _scal_ds,
        _scal_ds_hermite,
        _scal_ds_leapfrog,
        compute_accel_jerk_pallas_ds,
        ds_scal_with_dt,
        hermite_assemble,
        hermite_correct,
        hermite_planes,
        hermite_predict,
        nbody_step_pallas_ds_leapfrog_vs,
        nbody_step_pallas_ds_vs,
    )
    from nbody_tpu.ops.pallas_kernel import compute_accel_jerk_pallas

    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if not (0.0 < dt_min <= dt_max):
        raise ValueError(f"need 0 < dt_min <= dt_max, got "
                         f"[{dt_min}, {dt_max}]")
    ti = DS_TILE_I if tile_i is None else tile_i
    tj = ((DS_HERMITE_TILE_J if integrator == "hermite" else DS_TILE_J)
          if tile_j is None else tile_j)
    base = {"euler": _scal_ds, "leapfrog": _scal_ds_leapfrog,
            "hermite": _scal_ds_hermite}[integrator](0.0, softening, damping)

    def stats_init():
        return jnp.asarray([0.0, 0.0, jnp.inf, 0.0], jnp.float32)

    def stats_update(stats, dt):
        return jnp.stack([stats[0] + dt, dt,
                          jnp.minimum(stats[2], dt),
                          jnp.maximum(stats[3], dt)])

    def ag(x):
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    def hermite_step(ph, plo, vh, vlo, scal, gathered):
        # round-1 gathers arrive from the caller (shared with the
        # criterion); the P(EC) second round gathers the local
        # predictions — same arithmetic as make_sharded_ds_step
        jh, jl, jvh, jvl = gathered
        fscal = scal[:, :4]
        a0h, a0l, j0h, j0l = compute_accel_jerk_pallas_ds(
            ph, plo, vh, vlo, jh, jl, jvh, jvl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        x0, v0 = hermite_planes(ph, plo), hermite_planes(vh, vlo)
        a0, j0 = hermite_planes(a0h, a0l), hermite_planes(j0h, j0l)
        xp, vp = hermite_predict(x0, v0, a0, j0, scal)
        pph, ppl = hermite_assemble(xp, ph[:, 3:4], plo[:, 3:4])
        vph, vpl = hermite_assemble(vp, vh[:, 3:4], vlo[:, 3:4])
        a1h, a1l, j1h, j1l = compute_accel_jerk_pallas_ds(
            pph, ppl, vph, vpl, ag(pph), ag(ppl), ag(vph), ag(vpl), fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        a1, j1 = hermite_planes(a1h, a1l), hermite_planes(j1h, j1l)
        x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, scal)
        nph, npl = hermite_assemble(x1, ph[:, 3:4], plo[:, 3:4])
        nvh, nvl = hermite_assemble(v1, vh[:, 3:4], vlo[:, 3:4])
        return nph, npl, nvh, nvl

    def local(ph, plo, vh, vlo):
        def body(state, _):
            ph, plo, vh, vlo, stats = state
            jh, jl = ag(ph), ag(plo)
            if integrator == "hermite":
                jvh, jvl = ag(vh), ag(vlo)
                acc, jerk = compute_accel_jerk_pallas(
                    ph, vh, jh, jvh, softening, interpret=interpret)
                dt = aarseth_timestep(acc, jerk, eta, dt_min, dt_max,
                                      mesh_axis=axis)
                scal = ds_scal_with_dt(base, dt, integrator="hermite")
                out = hermite_step(ph, plo, vh, vlo, scal,
                                   (jh, jl, jvh, jvl))
            else:
                acc = compute_accel_pallas(ph, jh, softening,
                                           interpret=interpret)
                dt = accel_timestep(acc, softening, eta, dt_min, dt_max,
                                    mesh_axis=axis)
                scal = ds_scal_with_dt(base, dt, integrator=integrator)
                if integrator == "leapfrog":
                    jvh, jvl = ag(vh), ag(vlo)
                    out = nbody_step_pallas_ds_leapfrog_vs(
                        ph, plo, vh, vlo, jh, jl, jvh, jvl, scal,
                        tile_i=ti, tile_j=tj, interpret=interpret)
                else:
                    out = nbody_step_pallas_ds_vs(
                        ph, plo, vh, vlo, jh, jl, scal,
                        tile_i=ti, tile_j=tj, interpret=interpret)
            return (*out, stats_update(stats, dt)), None

        init = (ph, plo, vh, vlo, stats_init())
        (ph, plo, vh, vlo, stats), _ = jax.lax.scan(body, init, None,
                                                    length=steps)
        return ph, plo, vh, vlo, stats

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),) * 4,
        # stats replicate: the pmax/pmin'd dt is identical on every shard
        out_specs=(P(axis, None),) * 4 + (P(),),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 3))


def make_sharded_ds_adaptive_rollout_2d(
    mesh: Mesh,
    *,
    axes: tuple = ("rows", "cols"),
    integrator: str = "euler",
    softening,
    damping,
    eta: float,
    dt_min: float,
    dt_max: float,
    steps: int,
    tile_i: int | None = None,
    tile_j: int | None = None,
    interpret: bool = False,
):
    """Adaptive global timestep over the 2-D rows×cols ds decomposition:
    (pos_hi, pos_lo, vel_hi, vel_lo) -> same four sharded planes + the
    replicated (4,) f32 stats [t, dt_last, dt_lo, dt_hi].

    Composes make_sharded_ds_step_2d's dataflow (two-axis hi/lo plane
    gathers + the anchored ds ring reduce-scatter over cols) with the ds
    adaptive design (criterion in f32 on the HI planes, ds step from a
    traced-dt `ds_scal_with_dt` rebuild). Per step, each device:

    1. gathers the f32 hi planes along both axes and evaluates the
       criterion kernel on its (N/R × N/C) block; a col-axis psum
       completes the row-block's f32 accel (and jerk for hermite) and
       the dt reduction pmax/pmins over BOTH mesh axes — still one
       scalar collective family per step. Unlike the 1-D ds adaptive,
       the criterion accel is a psum of per-column partials, so the
       chosen dt matches single-device to f32 rounding (not bitwise) —
       the step itself stays full ds either way.
    2. rebuilds the scal block's dt columns from the traced dt and runs
       the same ds 2-D physics as the fixed-dt step (euler/hermite
       reuse the criterion's hi gathers; leapfrog half-drifts each
       chunk at the XLA level with the traced dt and gathers the
       DRIFTED planes).

    The scan stays inside ONE compiled shard_map dispatch.
    """
    from nbody_tpu.ops.adaptive import aarseth_timestep, accel_timestep
    from nbody_tpu.ops.ds_kernel import (
        DS_HERMITE_TILE_J,
        DS_TILE_I,
        DS_TILE_J,
        _scal_ds,
        _scal_ds_hermite,
        _scal_ds_leapfrog,
        compute_accel_jerk_pallas_ds,
        compute_accel_pallas_ds,
        ds_add,
        ds_half_drift,
        ds_leapfrog_finish,
        ds_scal_with_dt,
        hermite_assemble,
        hermite_correct,
        hermite_planes,
        hermite_predict,
    )
    from nbody_tpu.ops.ds_kernel import (
        _ds_integrate,  # noqa: PLC2701 — shared with the 1-D ds strategies
    )
    from nbody_tpu.ops.pallas_kernel import (
        compute_accel_jerk_pallas,
        compute_accel_pallas,
    )

    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if not (0.0 < dt_min <= dt_max):
        raise ValueError(f"need 0 < dt_min <= dt_max, got "
                         f"[{dt_min}, {dt_max}]")
    row_ax, col_ax = axes
    ncols = int(mesh.shape[col_ax])
    col_perm = [(d, (d + 1) % ncols) for d in range(ncols)]
    ti = DS_TILE_I if tile_i is None else tile_i
    tj = ((DS_HERMITE_TILE_J if integrator == "hermite" else DS_TILE_J)
          if tile_j is None else tile_j)
    base = {"euler": _scal_ds, "leapfrog": _scal_ds_leapfrog,
            "hermite": _scal_ds_hermite}[integrator](0.0, softening, damping)
    rs = _make_ds_col_reduce_scatter(col_ax, ncols, col_perm, ds_add)

    def ag_cols(x):
        return jax.lax.all_gather(x, col_ax, axis=0, tiled=True)

    def ag_rows(x):
        return jax.lax.all_gather(x, row_ax, axis=0, tiled=True)

    def stats_init():
        return jnp.asarray([0.0, 0.0, jnp.inf, 0.0], jnp.float32)

    def stats_update(stats, dt):
        return jnp.stack([stats[0] + dt, dt,
                          jnp.minimum(stats[2], dt),
                          jnp.maximum(stats[3], dt)])

    def hermite_body(ph, plo, vh, vlo, stats):
        nloc = ph.shape[0]
        iph, ivh = ag_cols(ph), ag_cols(vh)
        jph, jvh = ag_rows(ph), ag_rows(vh)
        a_p, jk_p = compute_accel_jerk_pallas(iph, ivh, jph, jvh,
                                              softening, interpret=interpret)
        acc = jax.lax.psum(a_p, col_ax)
        jerk = jax.lax.psum(jk_p, col_ax)
        dt = aarseth_timestep(acc, jerk, eta, dt_min, dt_max,
                              mesh_axis=axes)
        scal = ds_scal_with_dt(base, dt, integrator="hermite")
        fscal = scal[:, :4]
        # round 1 reuses the criterion's hi gathers; only lo planes move
        ipl, ivl = ag_cols(plo), ag_cols(vlo)
        jpl, jvl = ag_rows(plo), ag_rows(vlo)
        a0h, a0l, j0h, j0l = compute_accel_jerk_pallas_ds(
            iph, ipl, ivh, ivl, jph, jpl, jvh, jvl, fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        (a0h, a0l), (j0h, j0l) = rs([(a0h, a0l), (j0h, j0l)], nloc)
        x0, v0 = hermite_planes(ph, plo), hermite_planes(vh, vlo)
        a0, j0 = hermite_planes(a0h, a0l), hermite_planes(j0h, j0l)
        xp, vp = hermite_predict(x0, v0, a0, j0, scal)
        pph, ppl = hermite_assemble(xp, ph[:, 3:4], plo[:, 3:4])
        vph, vpl = hermite_assemble(vp, vh[:, 3:4], vlo[:, 3:4])
        a1h, a1l, j1h, j1l = compute_accel_jerk_pallas_ds(
            ag_cols(pph), ag_cols(ppl), ag_cols(vph), ag_cols(vpl),
            ag_rows(pph), ag_rows(ppl), ag_rows(vph), ag_rows(vpl), fscal,
            tile_i=ti, tile_j=tj, interpret=interpret)
        (a1h, a1l), (j1h, j1l) = rs([(a1h, a1l), (j1h, j1l)], nloc)
        a1, j1 = hermite_planes(a1h, a1l), hermite_planes(j1h, j1l)
        x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, scal)
        nph, npl = hermite_assemble(x1, ph[:, 3:4], plo[:, 3:4])
        nvh, nvl = hermite_assemble(v1, vh[:, 3:4], vlo[:, 3:4])
        return nph, npl, nvh, nvl, stats_update(stats, dt)

    def euler_leapfrog_body(ph, plo, vh, vlo, stats):
        nloc = ph.shape[0]
        iph, jph = ag_cols(ph), ag_rows(ph)
        a_p = compute_accel_pallas(iph, jph, softening,
                                   interpret=interpret)
        acc_f32 = jax.lax.psum(a_p, col_ax)
        dt = accel_timestep(acc_f32, softening, eta, dt_min, dt_max,
                            mesh_axis=axes)
        scal = ds_scal_with_dt(base, dt, integrator=integrator)
        fscal = scal[:, :4]
        if integrator == "leapfrog":
            # forces act at the half-drifted positions: drift each chunk
            # once at the XLA level, gather the DRIFTED planes (the
            # criterion's start-state gathers are not reusable here)
            hh, hl = ds_half_drift(ph, plo, vh, vlo, scal)
            ah, al = compute_accel_pallas_ds(
                ag_cols(hh), ag_cols(hl), ag_rows(hh), ag_rows(hl),
                fscal, tile_i=ti, tile_j=tj, interpret=interpret)
            (acc,) = rs([(ah, al)], nloc)
            out = ds_leapfrog_finish(hh, hl, vh, vlo, acc, scal)
        else:
            ipl, jpl = ag_cols(plo), ag_rows(plo)
            ah, al = compute_accel_pallas_ds(
                iph, ipl, jph, jpl, fscal,
                tile_i=ti, tile_j=tj, interpret=interpret)
            (acc,) = rs([(ah, al)], nloc)
            out = _ds_integrate(ph, plo, vh, vlo, acc, scal)
        return (*out, stats_update(stats, dt))

    body_fn = (hermite_body if integrator == "hermite"
               else euler_leapfrog_body)

    def local(ph, plo, vh, vlo):
        def body(state, _):
            return body_fn(*state), None

        init = (ph, plo, vh, vlo, stats_init())
        (ph, plo, vh, vlo, stats), _ = jax.lax.scan(body, init, None,
                                                    length=steps)
        return ph, plo, vh, vlo, stats

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None),) * 4,
        # stats replicate: the two-axis pmax/pmin'd dt is identical on
        # every chunk
        out_specs=(P(axes, None),) * 4 + (P(),),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 3))
