"""P3M solver tests: accuracy envelope, overflow contract, integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.p3m import nbody_step_p3m, p3m_accel
from nbody_tpu.ops.pm import pm_accel
from nbody_tpu.ops.reference import compute_accel_xla

SOFT = 0.1


@pytest.fixture(scope="module")
def cloud():
    pos, vel = ic.generate(NBodyConfig.SHELL, 2048, 1.5, 2.0, seed=3)
    return jnp.asarray(pos), jnp.asarray(vel)


def _rel_err(a, a_ref):
    num = np.sqrt(((np.asarray(a) - a_ref) ** 2).sum(1))
    den = np.maximum(np.sqrt((a_ref ** 2).sum(1)), 1e-12)
    return num / den


@pytest.mark.slow
def test_p3m_accuracy_envelope(cloud):
    """Documented envelope: sub-percent median force error, and ~10x
    tighter than plain PM on the same mesh."""
    pos, _ = cloud
    a_ref = np.asarray(compute_accel_xla(pos, SOFT))
    a_p3m, ovf = p3m_accel(pos, SOFT, grid=64, capacity=64)
    assert int(ovf) == 0
    rel = _rel_err(a_p3m, a_ref)
    assert np.median(rel) < 0.008, np.median(rel)  # full-deconv envelope
    assert np.percentile(rel, 90) < 0.02

    rel_pm = _rel_err(pm_accel(pos, grid=64), a_ref)
    assert np.median(rel) < np.median(rel_pm) / 4


def test_p3m_conserves_momentum(cloud):
    """Mesh part is spectrally symmetric and the pair part is antisymmetric
    (both partners find each other in the cell table), so net momentum
    injection vanishes."""
    pos, _ = cloud
    a, ovf = p3m_accel(pos, SOFT, grid=64, capacity=64)
    assert int(ovf) == 0
    m = np.asarray(pos)[:, 3:4]
    a = np.asarray(a)
    imbalance = np.abs((m * a).sum(0)).max() / np.abs(m * a).sum()
    assert imbalance < 1e-5, imbalance


def test_p3m_reports_overflow(cloud):
    """A capacity the cluster cannot fit must be REPORTED, not silently
    degrade (the short-range sum drops pairs on overflow)."""
    pos, _ = cloud
    _, ovf = p3m_accel(pos, SOFT, grid=64, capacity=2)
    assert int(ovf) > 0


def test_p3m_step_shapes_and_mass(cloud):
    pos, vel = cloud
    p1, v1, ovf = nbody_step_p3m(pos, vel, 0.001, SOFT, 0.999,
                                 grid=32, capacity=64)
    assert p1.shape == pos.shape and v1.shape == vel.shape
    np.testing.assert_array_equal(np.asarray(p1)[:, 3], np.asarray(pos)[:, 3])
    assert np.isfinite(np.asarray(p1)).all()


def test_p3m_body_system_backend():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    for integrator in ("euler", "leapfrog"):
        s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32,
                       p3m_capacity=64, integrator=integrator, seed=0)
        s.update_many(3, 0.001)
        assert np.isfinite(s.positions).all(), integrator


def test_p3m_body_system_rejects_undersized_capacity():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    with pytest.raises(ValueError, match="capacity"):
        BodySystem(2048, NBodyParams(), backend="p3m", pm_grid=64,
                   p3m_capacity=2, seed=0)


def test_cli_p3m_kernel_demo():
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "p3m",
               "--pm-grid", "32", "--no-cycle"])
    assert rc == 0


@pytest.mark.slow
def test_p3m_and_pm_stable_under_x64(cloud):
    """Mesh solvers must work with jax_enable_x64 on (the --interactive
    process state): int64-defaulting index ops broke dynamic_slice (r2)."""
    pos, _ = cloud
    ref_p3m, _ = p3m_accel(pos, SOFT, grid=32, capacity=64)
    ref_pm = pm_accel(pos, grid=32)
    jax.config.update("jax_enable_x64", True)
    try:
        a, ovf = p3m_accel(pos, SOFT, grid=32, capacity=64)
        assert a.dtype == jnp.float32 and int(ovf) == 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(ref_p3m),
                                   rtol=1e-5, atol=1e-5)
        b = pm_accel(pos, grid=32)
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(b), np.asarray(ref_pm),
                                   rtol=1e-5, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_p3m_overflow_ignores_zero_mass_padding():
    """Zero-mass pad bodies (tipsy-style, all at the origin) must neither
    trip the capacity probe nor crowd massive bodies out of their cell
    (massive bodies sort first within a cell)."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops.p3m import p3m_overflow_count
    from nbody_tpu.params import NBodyParams

    pos, vel = ic.generate(NBodyConfig.RANDOM, 500, 1.5, 2.0, seed=2)
    # BodySystem pads 500 -> 2048 with zero-mass bodies at the origin
    s = BodySystem(2048, NBodyParams(), backend="p3m", pm_grid=32,
                   p3m_capacity=64, state=(pos, vel))
    assert s.num_bodies == 2048  # construction did not raise
    padded = np.asarray(s.positions)
    assert int(p3m_overflow_count(jnp.asarray(padded), grid=32,
                                  capacity=64)) == 0
    # the padded state still produces finite, padding-independent physics
    a_pad, ovf = p3m_accel(jnp.asarray(padded, jnp.float32), SOFT,
                           grid=32, capacity=64)
    assert int(ovf) == 0
    a_raw, _ = p3m_accel(jnp.asarray(pos, jnp.float32), SOFT,
                         grid=32, capacity=64)
    np.testing.assert_allclose(np.asarray(a_pad)[:500], np.asarray(a_raw),
                               rtol=2e-2, atol=2e-2)


def test_s_lr_no_catastrophic_cancellation():
    """f32 closed form cancels for r << sigma (measured -7276 vs true +266
    at r=1e-5, sigma=0.1); the series branch must hold ~1e-5 accuracy."""
    import math

    from nbody_tpu.ops.p3m import _s_lr

    sigma = 0.1
    for r in (2e-6, 1e-5, 1e-3, 0.02, 0.0354, 0.05, 0.1, 0.3):
        u = r / (math.sqrt(2) * sigma)
        truth = (math.erf(u) - (2 / math.sqrt(math.pi)) * u
                 * math.exp(-u * u)) / r ** 3
        got = float(_s_lr(jnp.float32(r * r), jnp.float32(sigma)))
        assert abs(got - truth) / truth < 1e-4, (r, got, truth)


def test_p3m_capacity_auto_sizes():
    """p3m_capacity=None derives a fitting capacity from the first state
    (max occupancy + 50% headroom, multiple of 8) — no manual sizing."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops.p3m import p3m_max_occupancy
    from nbody_tpu.params import NBodyParams

    s = BodySystem(2048, NBodyParams(), backend="p3m", pm_grid=64, seed=3)
    occ = int(p3m_max_occupancy(jnp.asarray(s.positions, jnp.float32),
                                grid=64))
    assert s.p3m_capacity >= occ  # fits by construction
    assert s.p3m_capacity % 8 == 0
    s.update_many(2, 0.001)
    assert np.isfinite(s.positions).all()


@pytest.mark.slow
def test_sharded_p3m_matches_single_device(cloud):
    """Body-sharded P3M (grid psum + redundant sort + static cell split +
    short-range psum) must reproduce the single-device solve."""
    from nbody_tpu.ops.p3m import make_sharded_p3m_step
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v, ovf = nbody_step_p3m(pos, vel, 0.001, SOFT, 1.0,
                                       grid=32, capacity=64)
    assert int(ovf) == 0
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_p3m_step(mesh, grid=32, capacity=64)
    p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
    assert p1.sharding == ps.sharding
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_p3m_uneven_cell_split():
    """Device counts that do not divide the cell count exercise the inert
    cell padding (gc=6 -> 216 cells over 8 devices = 27 each; gc=3 -> 27
    cells over 8 devices = 4 each with 5 pad cells)."""
    from nbody_tpu.ops.p3m import make_sharded_p3m_step, p3m_accel
    from nbody_tpu.ops.reference import integrate
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.5, 2.0, seed=7)
    pos, vel = jnp.asarray(pos), jnp.asarray(vel)
    a_ref, ovf = p3m_accel(pos, SOFT, grid=16, capacity=256)  # gc=3, 27 cells
    assert int(ovf) == 0
    ref_p, ref_v = integrate(pos, vel, a_ref, 0.001, 1.0)
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_p3m_step(mesh, grid=16, capacity=256)
    p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)


def test_sharded_p3m_body_system():
    """BodySystem(backend='p3m', mesh=...) — lazy step build picks up the
    auto-sized capacity; euler + leapfrog; mass preserved."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    for integrator in ("euler", "leapfrog"):
        s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32,
                       mesh=make_mesh(8), integrator=integrator, seed=0)
        assert s.p3m_capacity is not None  # auto-sized at state placement
        m0 = s.positions[:, 3].copy()
        s.update_many(3, 0.001)
        np.testing.assert_array_equal(s.positions[:, 3], m0)
        assert np.isfinite(s.positions).all()


@pytest.mark.slow
def test_p3m_tsc_beats_cic(cloud):
    """TSC assignment + sinc^3 deconvolution roughly halves the mesh force
    error on the same grid (measured: median 0.36% -> 0.16%, p90 0.94% ->
    0.28% on this cloud)."""
    pos, _ = cloud
    a_ref = np.asarray(compute_accel_xla(pos, SOFT))
    a_cic, _ = p3m_accel(pos, SOFT, grid=64, capacity=64, assignment="cic")
    a_tsc, ovf = p3m_accel(pos, SOFT, grid=64, capacity=64, assignment="tsc")
    assert int(ovf) == 0
    rel_cic = _rel_err(a_cic, a_ref)
    rel_tsc = _rel_err(a_tsc, a_ref)
    assert np.median(rel_tsc) < np.median(rel_cic) / 1.5
    assert np.percentile(rel_tsc, 90) < np.percentile(rel_cic, 90) / 2
    assert np.median(rel_tsc) < 0.004


@pytest.mark.slow
def test_sharded_p3m_tsc_matches_single_device(cloud):
    from nbody_tpu.ops.p3m import make_sharded_p3m_step
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v, _ = nbody_step_p3m(pos, vel, 0.001, SOFT, 1.0,
                                     grid=32, capacity=64, assignment="tsc")
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_p3m_step(mesh, grid=32, capacity=64,
                                 assignment="tsc")
    p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)


def test_p3m_tsc_via_body_system_and_cli_flag():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32,
                   p3m_capacity=64, pm_assignment="tsc", seed=0)
    s.update_many(2, 0.001)
    assert np.isfinite(s.positions).all()
    with pytest.raises(ValueError, match="pm_assignment"):
        BodySystem(64, NBodyParams(), backend="pm", pm_assignment="ngp")


@pytest.mark.slow
def test_p3m_i_tile_invariance(cloud):
    """The i-subtile worklist is a pure layout change: any i_tile must give
    the same forces as one-tile-per-cell (i_tile >= capacity), because each
    i-row reduces the same 27 capacity-padded j-slices in the same order."""
    from nbody_tpu.ops.p3m import (
        RCUT_SIGMAS, SIGMA_CELLS, _cell_grid_size, _fit_box,
        _short_range_cells, _sorted_cell_tables,
    )

    pos, _ = cloud
    f32 = jnp.float32
    grid, cap = 32, 64
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    n = pos3.shape[0]
    lo, h = _fit_box(pos3, grid)
    sigma = f32(SIGMA_CELLS) * h
    rcut = f32(RCUT_SIGMAS) * sigma
    gc = _cell_grid_size(grid)
    _, sp4, st, ct, nst, nct, _ = _sorted_cell_tables(
        pos3, mass, lo, rcut, gc, cap)
    kw = dict(eps2=jnp.float32(SOFT) ** 2, sigma=sigma, rcut=rcut,
              cap=cap, chunk=2048, n=n)
    ref = _short_range_cells(sp4, st, ct, nst, nct, i_tile=cap, **kw)
    for i_tile in (8, 16, 128):
        got = _short_range_cells(sp4, st, ct, nst, nct, i_tile=i_tile, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7, err_msg=str(i_tile))


def test_sharded_p3m_slab_fft_matches_single_device(cloud):
    """Sharded P3M with the distributed-FFT long range must reproduce the
    single-device solve (the combined one-psum path)."""
    from nbody_tpu.ops.p3m import make_sharded_p3m_step
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v, ovf = nbody_step_p3m(pos, vel, 0.001, SOFT, 1.0,
                                       grid=32, capacity=64)
    assert int(ovf) == 0
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_p3m_step(mesh, grid=32, capacity=64, fft="slab")
    p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_short_range_matches_xla(cloud):
    """The block-sparse Pallas pair kernel (interpret mode on CPU) must
    reproduce the XLA short-range pass inside the full P3M force."""
    from nbody_tpu.ops.p3m_kernel import p3m_pair_count

    pos, _ = cloud
    a_xla, ovf_x = p3m_accel(pos, SOFT, grid=32, capacity=64)
    pc = int(p3m_pair_count(pos, grid=32, capacity=64))
    a_pl, ovf_p = p3m_accel(pos, SOFT, grid=32, capacity=64,
                            short_range="pallas", pair_budget=pc + 8,
                            interpret=True)
    assert int(ovf_x) == int(ovf_p) == 0
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_xla),
                               rtol=1e-4, atol=2e-4)


def test_pallas_short_range_via_body_system():
    """p3m_short_range='pallas' (interpret off-TPU is not auto-picked, so
    force it) routes through the budget contract and steps correctly."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32,
                   p3m_capacity=64, seed=0)
    assert s.p3m_short_range == "xla"   # auto resolves xla off-TPU
    # budget probe only runs for the pallas engine
    assert s._p3m_pair_budget is None


def test_pallas_short_range_budget_required(cloud):
    pos, _ = cloud
    with pytest.raises(ValueError, match="pair_budget"):
        p3m_accel(pos, SOFT, grid=32, capacity=64, short_range="pallas",
                  interpret=True)


def test_sharded_p3m_accel_validates_influence():
    """make_sharded_p3m_accel must reject an unknown influence string at
    construction like every sibling builder — a typo must not silently
    degrade the adaptive rollout to the naive deconvolution."""
    from nbody_tpu.ops.p3m import make_sharded_p3m_accel
    from nbody_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="unknown influence"):
        make_sharded_p3m_accel(make_mesh(8), grid=32, capacity=64,
                               influence="optimla")


@pytest.mark.slow
def test_sharded_p3m_pallas_short_range_matches(cloud):
    """Sharded P3M with the Pallas pair kernel (per-device chunk ranges,
    interpret mode) must reproduce the single-device solve — including
    i-block runs that straddle device range boundaries (they complete in
    the psum)."""
    from nbody_tpu.ops.p3m import make_sharded_p3m_step, p3m_kernel_blk
    from nbody_tpu.ops.p3m_kernel import p3m_pair_count
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v, _ = nbody_step_p3m(pos, vel, 0.001, SOFT, 1.0,
                                     grid=32, capacity=64)
    blk = p3m_kernel_blk(64)
    budget = int(p3m_pair_count(pos, grid=32, capacity=64, blk=blk)) + 8
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    for fft in ("replicated", "slab"):
        step = make_sharded_p3m_step(mesh, grid=32, capacity=64,
                                     short_range="pallas",
                                     pair_budget=budget, fft=fft,
                                     interpret=True)
        p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                                   rtol=1e-4, atol=2e-4, err_msg=fft)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                                   rtol=1e-4, atol=2e-4, err_msg=fft)


@pytest.mark.slow
def test_pallas_pair_tables_properties(cloud):
    """Builder invariants: every kept body lands in a unique padded row of
    its cell's aligned range; live pair block ids stay in range; the pair
    count matches the probe."""
    from nbody_tpu.ops.p3m import RCUT_SIGMAS, SIGMA_CELLS, _cell_grid_size
    from nbody_tpu.ops.p3m_kernel import (
        _build_pair_tables,
        p3m_pair_count,
    )
    from nbody_tpu.ops.pm import _fit_box

    pos, _ = cloud
    f32 = jnp.float32
    grid, cap, blk = 32, 64, 128
    pos3 = pos[:, :3].astype(f32)
    mass = pos[:, 3].astype(f32)
    lo, h = _fit_box(pos3, grid)
    rcut = f32(RCUT_SIGMAS * SIGMA_CELLS) * h
    gc = _cell_grid_size(grid)
    budget = int(p3m_pair_count(pos, grid=grid, capacity=cap, blk=blk)) + 16
    (padded, padded_t, ib, jb, newi, body_row, order,
     pair_count, overflow) = _build_pair_tables(
        pos3, mass, lo, rcut, gc, cap, budget, blk)
    n = pos.shape[0]
    pc = int(pair_count)
    # probe and builder may disagree by ~1% at cell boundaries: the box
    # fit's reductions reassociate differently under different jit
    # contexts, shifting h by an ulp — the reason budgets carry headroom
    assert abs(pc - (budget - 16)) <= max(32, (budget - 16) // 20)
    assert int(overflow) == 0
    rows = np.asarray(body_row)
    live_rows = rows[rows < padded.shape[0] - blk]
    assert len(np.unique(live_rows)) == len(live_rows)  # no collisions
    # padded holds exactly the kept bodies (mass-weighted count)
    np.testing.assert_allclose(float(padded[:, 3].sum()),
                               float(mass.sum()), rtol=1e-6)
    ibs, jbs = np.asarray(ib), np.asarray(jb)
    mb = padded.shape[0] // blk - 1
    assert (ibs[:pc] < mb).all() and (jbs[:pc] < mb).all()
    assert (ibs[pc:] == mb).all()                        # inert tail
    assert (np.diff(ibs[:pc].astype(np.int64)) >= 0).all()  # grouped by i


@pytest.mark.slow
def test_pallas_short_range_reports_overflow(cloud):
    """capacity too small for the cloud -> the pallas engine reports the
    same body-overflow contract as the XLA engine."""
    from nbody_tpu.ops.p3m_kernel import p3m_pair_count, p3m_short_range_pallas

    pos, _ = cloud
    budget = int(p3m_pair_count(pos, grid=32, capacity=2)) + 8
    _, ovf, _ = p3m_short_range_pallas(pos, SOFT, grid=32, capacity=2,
                                       pair_budget=budget, interpret=True)
    assert int(ovf) > 0


def test_p3m_contract_breach_warns():
    """A collapsing run that outgrows the state-set capacity contract must
    WARN (forces silently degrade otherwise). Exercised by shrinking the
    capacity under the system after placement."""
    import warnings

    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32, seed=0)
    s.p3m_capacity = 1   # simulate occupancy outgrowing the contract
    # update_many probes once per rollout (per-step update() throttles the
    # blocking probe to every 16th call)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.update_many(2, 0.001)
    assert any("contract broken" in str(x.message) for x in w)
    # warn-once per episode: a second rollout stays quiet
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        s.update_many(2, 0.001)
    assert not any("contract broken" in str(x.message) for x in w2)


def test_refresh_p3m_contract_resizes():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    s = BodySystem(512, NBodyParams(), backend="p3m", pm_grid=32, seed=0)
    cap0 = s.p3m_capacity
    s.p3m_capacity = 1   # simulate breach
    s.refresh_p3m_contract()
    assert s.p3m_capacity >= cap0   # re-sized from the current state
    s.update_many(2, 0.001)         # steps rebuild and run
    assert np.isfinite(s.positions).all()


def _collapsing_system(**kw):
    """Radially infalling shell: cell occupancy grows every step, so a
    too-small (but initially valid) capacity breaches mid-run at a
    predictable step."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    n = 512
    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = rng.uniform(0.9, 1.1, size=(n, 1))
    pos = np.concatenate([dirs * radii, np.ones((n, 1))], 1).astype(np.float32)
    vel = np.concatenate([-dirs * 2.0, np.zeros((n, 1))], 1).astype(np.float32)
    params = NBodyParams(time_step=0.01, softening=0.05, damping=1.0)
    return BodySystem(n, params, backend="p3m", pm_grid=16,
                      p3m_short_range="xla", state=(pos, vel), **kw)


def test_p3m_in_rollout_probe_detects_breach_step():
    """The in-scan probe must report the FIRST breached step of a rollout,
    matching the truth from per-step host probing (VERDICT r2 item 5)."""
    import warnings

    from nbody_tpu.ops.p3m import p3m_overflow_count

    s = _collapsing_system()
    cap = s.p3m_capacity

    # truth: step a twin one update at a time, probing every state
    twin = _collapsing_system(p3m_capacity=cap)
    steps = 60
    truth = -1
    for t in range(steps):
        twin._update_inner(0.01)
        if int(p3m_overflow_count(
                jnp.asarray(twin.positions, jnp.float32),
                grid=16, capacity=cap)) > 0:
            truth = t
            break
    assert truth >= 1, "scenario must breach mid-run, not at t=0"

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        detected = s._update_many_inner(steps, 0.01)
    assert detected >= 0, "rollout probe missed the breach"
    # scan-step vs per-step trajectories can differ by float reassociation;
    # the probe itself is ulp-sensitive at cell boundaries — allow slack
    assert abs(detected - truth) <= 2, (detected, truth)


@pytest.mark.slow
def test_p3m_sharded_in_rollout_probe_detects_breach_step():
    """The in-scan breach probe now runs for SHARDED p3m rollouts too:
    the carry's bincounts run at the jit level on the sharded global
    state (GSPMD collectives), so a sharded collapsing run reports its
    first breached step instead of a post-hoc warning up to a segment
    late (VERDICT r3 item 6)."""
    import jax

    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    single = _collapsing_system()
    cap = single.p3m_capacity
    steps = 60
    truth = single._update_many_inner(steps, 0.01)
    assert truth >= 1, "scenario must breach mid-run, not at t=0"

    sharded = _collapsing_system(mesh=make_mesh(4), p3m_capacity=cap)
    detected = sharded._update_many_inner(steps, 0.01)
    assert detected >= 0, "sharded rollout probe missed the breach"
    # single-device scan vs sharded scan trajectories differ by float
    # reassociation; the probe is ulp-sensitive at cell edges
    assert abs(detected - truth) <= 2, (detected, truth)


@pytest.mark.slow
def test_p3m_sharded_auto_refresh_recovers_mid_rollout():
    """p3m_auto_refresh over a mesh: the sharded breach carry rewinds to
    the snapshot, re-sizes, rebuilds the sharded step, and resumes."""
    import warnings

    import jax

    from nbody_tpu.ops.p3m import p3m_overflow_count
    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    s = _collapsing_system(mesh=make_mesh(4), p3m_auto_refresh=True)
    cap0 = s.p3m_capacity
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.update_many(60, 0.01)
    assert not any("contract broken" in str(x.message) for x in w)
    assert s.p3m_capacity > cap0, "auto-refresh should have re-sized"
    assert np.isfinite(s.positions).all()
    assert int(p3m_overflow_count(
        jnp.asarray(s.positions, jnp.float32),
        grid=16, capacity=s.p3m_capacity)) == 0


@pytest.mark.slow
def test_p3m_auto_refresh_recovers_mid_rollout():
    """p3m_auto_refresh=True: a breached rollout rewinds to the breach
    step, re-sizes the contract from that state, and resumes — no warning,
    capacity grown, final state in-contract."""
    import warnings

    from nbody_tpu.ops.p3m import p3m_overflow_count

    s = _collapsing_system(p3m_auto_refresh=True)
    cap0 = s.p3m_capacity
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.update_many(60, 0.01)
    assert not any("contract broken" in str(x.message) for x in w)
    assert s.p3m_capacity > cap0, "auto-refresh should have re-sized"
    assert np.isfinite(s.positions).all()
    assert int(p3m_overflow_count(
        jnp.asarray(s.positions, jnp.float32),
        grid=16, capacity=s.p3m_capacity)) == 0


@pytest.mark.slow
def test_optimal_influence_matches_naive_at_production_sigma(cloud):
    """At the production split sigma = 1.5h, assignment-alias power is
    e^-11, so the H&E optimal influence function must agree with the naive
    1/W^2 deconvolution to fp32 grade (measured on TPU at N=65536:
    identical to 4 digits — scripts/tpu_influence_error.py, r3). Pins that
    equivalence so neither path drifts."""
    pos, _ = cloud
    a_n, _ = p3m_accel(pos, SOFT, grid=32, capacity=64, influence="naive")
    a_o, _ = p3m_accel(pos, SOFT, grid=32, capacity=64, influence="optimal")
    num = np.linalg.norm(np.asarray(a_n) - np.asarray(a_o), axis=1)
    den = np.linalg.norm(np.asarray(a_n), axis=1) + 1e-30
    assert float(np.median(num / den)) < 5e-3


def test_pm_influence_options_run():
    """pm_accel's influence ladder: all options produce finite forces; the
    measured ranking (none < optimal < naive error, TPU N=65536) is a
    property of the raw 1/r kernel — deconvolution amplifies sub-cell
    error — so "none" stays the default."""
    from nbody_tpu.ops.pm import pm_accel

    pos, _ = ic.generate(NBodyConfig.SHELL, 1024, 1.68, 2.98, seed=1)
    p4 = jnp.asarray(pos)
    for influence in ("none", "naive", "optimal"):
        acc = pm_accel(p4, grid=16, influence=influence)
        assert np.isfinite(np.asarray(acc)).all()
    with pytest.raises(ValueError):
        pm_accel(p4, grid=16, influence="bogus")


@pytest.mark.slow
def test_p3m_accel_explicit_blk_is_static(cloud):
    """An EXPLICIT blk must reach the Pallas short-range as a static
    (the tuner passes candidate blks directly; blk missing from
    p3m_accel's static_argnames turned it into a tracer and broke every
    on-chip `nbody-tune --family p3m` candidate — r5)."""
    from nbody_tpu.ops.p3m_kernel import p3m_pair_count

    pos, _ = cloud
    a_def, ovf = p3m_accel(pos, SOFT, grid=32, capacity=64)
    pc = int(p3m_pair_count(pos, grid=32, capacity=64, blk=128))
    a_blk, ovf_b = p3m_accel(pos, SOFT, grid=32, capacity=64,
                             short_range="pallas", pair_budget=pc + 8,
                             blk=128, interpret=True)
    assert int(ovf) == int(ovf_b) == 0
    np.testing.assert_allclose(np.asarray(a_blk), np.asarray(a_def),
                               rtol=1e-4, atol=2e-4)
