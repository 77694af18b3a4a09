"""Per-body block-timestep ladder tests (ops/block_timestep.py).

The scheme's invariants, each pinned separately: the host-side boundary
schedule, the classifier's largest-rung-not-exceeding rule, K=1
degenerating EXACTLY to the global KDK leapfrog, multi-class rollouts
tracking a tight global-dt integration, and the eval-row accounting
that the adopt/reject measurement (scripts/tpu_r5_block_dt.py) rests
on."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.adaptive import make_adaptive_scan
from nbody_tpu.ops.block_timestep import (
    block_schedule,
    classify,
    make_block_rollout,
)
from nbody_tpu.ops.reference import compute_accel_xla

SOFT = 0.1


def _cp(x):
    import jax.numpy as jnp

    return jnp.array(x, copy=True)


def test_block_schedule_shapes_and_alignment():
    # K=1: one substep, no interior boundaries
    t, s = block_schedule(1)
    assert s == 1 and t.size == 0
    # K=3: S=4; interior boundaries s=1,2,3 -> trailing zeros 0,1,0
    t, s = block_schedule(3)
    assert s == 4
    np.testing.assert_array_equal(t, [0, 1, 0])
    # class k must be active every 2^(K-1-k) substeps: a class is
    # active at s iff trailing_zeros(s) >= K-1-k
    for K in (2, 4):
        t, s = block_schedule(K)
        for k in range(K):
            hits = [i + 1 for i, tz in enumerate(t) if tz >= K - 1 - k]
            period = 1 << (K - 1 - k)
            assert hits == [x for x in range(1, s) if x % period == 0], (K, k)


def test_classify_largest_rung_not_exceeding():
    # |a| = soft / (eta/dt)^2 inverted: choose accelerations whose
    # criterion dt lands exactly on / between rungs
    eta, dt_max, K = 1.0, 1.0, 4

    def acc_for_dt(dt):
        # dt = eta*sqrt(soft/|a|)  =>  |a| = soft * (eta/dt)^2
        return SOFT * (eta / dt) ** 2

    dts = [2.0, 1.0, 0.6, 0.5, 0.26, 0.01]
    want = [0, 0, 1, 1, 2, 3]  # clipped to K-1
    acc = np.zeros((len(dts), 3), np.float32)
    acc[:, 0] = [acc_for_dt(d) for d in dts]
    k = np.asarray(classify(jnp.asarray(acc), SOFT, eta, dt_max, K))
    np.testing.assert_array_equal(k, want)


def _shell(n):
    pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.5, 2.0, seed=7)
    return jnp.asarray(pos), jnp.asarray(vel)


def test_block_k1_equals_global_kdk():
    """K=1 is plain KDK at dt_max: must match the adaptive leapfrog
    scan with its dt clipped to dt_max (same carried-force KDK form)."""
    pos, vel = _shell(256)
    dt = 1e-3
    a0 = compute_accel_xla(pos, SOFT)
    run = make_block_rollout(softening=SOFT, eta=1e9, dt_max=dt,
                             n_classes=1, macro_steps=8, tile=256)
    bp, bv, _, stats = run(_cp(pos), _cp(vel), a0)

    ref = make_adaptive_scan("leapfrog",
                             accel_fn=lambda p4: compute_accel_xla(p4, SOFT),
                             softening=SOFT, damping=1.0, eta=1e9,
                             dt_min=dt, dt_max=dt, steps=8)
    rp, rv, rstats = ref(pos, vel)
    np.testing.assert_allclose(np.asarray(bp), np.asarray(rp),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(rv),
                               rtol=1e-6, atol=1e-6)
    assert float(stats[0]) == pytest.approx(float(rstats[0]), rel=1e-6)
    # every step evaluates all N rows: 8 macros * 256
    assert float(stats[1]) == 8 * 256


@pytest.mark.slow
def test_block_multiclass_tracks_tight_global_dt():
    """A K=4 ladder must track the same state integrated globally at
    the ladder's DEEPEST rung (the block scheme's wasted-work saving
    must not buy different physics)."""
    pos, vel = _shell(512)
    dt_max, K = 4e-3, 4
    a0 = compute_accel_xla(pos, SOFT)
    run = make_block_rollout(softening=SOFT, eta=0.05, dt_max=dt_max,
                             n_classes=K, macro_steps=4, tile=256)
    bp, bv, _, stats = run(_cp(pos), _cp(vel), a0)
    assert np.isfinite(np.asarray(bp)).all()

    # global KDK at the deepest rung over the same span
    deep = dt_max / (1 << (K - 1))
    steps = 4 * (1 << (K - 1))
    ref = make_adaptive_scan("leapfrog",
                             accel_fn=lambda p4: compute_accel_xla(p4, SOFT),
                             softening=SOFT, damping=1.0, eta=1e9,
                             dt_min=deep, dt_max=deep, steps=steps)
    rp, rv, _ = ref(pos, vel)
    # same span, same criterion family: agreement to integration error
    span = np.abs(np.asarray(rp)[:, :3]).max()
    err = np.abs(np.asarray(bp)[:, :3] - np.asarray(rp)[:, :3]).max()
    assert err <= 2e-3 * max(span, 1.0), err
    # accounting: block computed fewer (or equal) rows than global
    assert float(stats[1]) <= float(stats[2])
    assert float(stats[0]) == pytest.approx(4 * dt_max, rel=1e-6)


def test_block_eval_rows_scale_with_active_population():
    """Two artificial populations: 256 tight bodies + 3840 loose ones.
    The ladder must charge interior boundaries ~the tight prefix only,
    far below the global-dt bill (the measured saving is the entire
    reason this op exists)."""
    n, n_tight = 4096, 256
    rng = np.random.default_rng(0)
    pos = np.zeros((n, 4), np.float32)
    # loose halo: far apart, tiny accelerations
    pos[:, :3] = rng.normal(size=(n, 3)) * 50.0
    # tight core: first rows clustered -> large accelerations
    pos[:n_tight, :3] = rng.normal(size=(n_tight, 3)) * 0.05
    pos[:, 3] = 1.0 / n
    vel = np.zeros((n, 4), np.float32)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    a0 = compute_accel_xla(p, SOFT)

    K = 4
    run = make_block_rollout(softening=SOFT, eta=0.02, dt_max=0.25,
                             n_classes=K, macro_steps=1, tile=256)
    _, _, _, stats = run(_cp(p), _cp(v), a0)
    rows, global_rows, k_max = float(stats[1]), float(stats[2]), int(stats[3])
    assert k_max >= 1, "config must occupy a deeper rung"
    # the bound the design promises: N (sync eval) + interior
    # boundaries charging at most the padded tight prefix + one tile
    s = 1 << (K - 1)
    assert rows <= n + (s - 1) * (2 * n_tight + 256)
    assert rows < 0.5 * global_rows, (rows, global_rows)


@pytest.mark.slow
def test_block_rollout_chains_via_carried_force():
    """Two chained 2-macro rollouts (passing the returned acc) must
    equal one 4-macro rollout — the carried synchronized force is the
    next segment's classifier and opener."""
    pos, vel = _shell(256)
    a0 = compute_accel_xla(pos, SOFT)
    mk = lambda m: make_block_rollout(softening=SOFT, eta=0.1,
                                      dt_max=2e-3, n_classes=3,
                                      macro_steps=m, tile=256)
    p4, v4, _, _ = mk(4)(_cp(pos), _cp(vel), a0)
    p2, v2, a2, _ = mk(2)(_cp(pos), _cp(vel), a0)
    p22, v22, _, _ = mk(2)(p2, v2, a2)
    np.testing.assert_allclose(np.asarray(p22), np.asarray(p4),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v22), np.asarray(v4),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_block_rollout_pads_non_tile_multiple_n():
    """N not a multiple of the tile is padded with far-field zero-mass
    rows — the physics must match the same N run with a tile that
    divides it exactly."""
    pos, vel = _shell(300)
    a0 = compute_accel_xla(pos, SOFT)
    kw = dict(softening=SOFT, eta=0.1, dt_max=2e-3, n_classes=3,
              macro_steps=3)
    pe, ve, _, se = make_block_rollout(tile=100, **kw)(_cp(pos), _cp(vel), a0)
    pp, vp, _, sp = make_block_rollout(tile=256, **kw)(_cp(pos), _cp(vel), a0)
    assert pp.shape == (300, 4)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pe),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(ve),
                               rtol=1e-5, atol=1e-5)
    assert float(sp[0]) == pytest.approx(float(se[0]))


def test_body_system_update_many_block_matches_op():
    """BodySystem.update_many_block (xla backend) must equal driving
    make_block_rollout directly, and the pallas backend's one-sided
    prefix tiles must agree with the XLA tiles."""
    from nbody_tpu.models.body_system import BodySystem
    from nbody_tpu.params import NBodyParams

    prm = NBodyParams(time_step=2e-3, softening=SOFT, damping=1.0)
    kw = dict(eta=0.1, n_classes=3)

    bs = BodySystem(512, prm, backend="xla", seed=5)
    pos0, vel0 = jnp.asarray(bs.positions), jnp.asarray(bs.velocities)
    stats = bs.update_many_block(4, **kw)
    assert stats["t"] == pytest.approx(4 * prm.time_step, rel=1e-6)
    assert stats["rows"] > 0 and stats["rows"] <= stats["global_rows"]

    a0 = compute_accel_xla(pos0, SOFT)
    run = make_block_rollout(softening=SOFT, eta=0.1,
                             dt_max=prm.time_step, n_classes=3,
                             macro_steps=4)
    rp, rv, _, _ = run(_cp(pos0), _cp(vel0), a0)
    np.testing.assert_allclose(bs.positions, np.asarray(rp),
                               rtol=1e-6, atol=1e-6)

    bp = BodySystem(512, prm, backend="pallas", seed=5, interpret=True)
    bp.update_many_block(4, **kw)
    np.testing.assert_allclose(bp.positions, bs.positions,
                               rtol=1e-4, atol=1e-4)


def test_body_system_block_chains_classifier_across_calls():
    """A second update_many_block call must reuse the macro-end force the
    previous rollout returned (the chain cache) instead of re-evaluating
    the full N-row classifier — and a state rebind must invalidate it."""
    from nbody_tpu.models.body_system import BodySystem
    from nbody_tpu.params import NBodyParams

    prm = NBodyParams(time_step=2e-3, softening=SOFT, damping=1.0)
    bs = BodySystem(256, prm, backend="xla", seed=7)
    ref = BodySystem(256, prm, backend="xla", seed=7)

    bs.update_many_block(2, eta=0.1, n_classes=3)
    real_closure = bs._accel_closure

    def boom():
        raise AssertionError("classifier re-evaluated despite chain cache")

    bs._accel_closure = boom
    bs.update_many_block(2, eta=0.1, n_classes=3)  # must hit the cache

    # chained trajectory == one uninterrupted 4-macro run
    ref.update_many_block(4, eta=0.1, n_classes=3)
    np.testing.assert_allclose(bs.positions, ref.positions,
                               rtol=1e-6, atol=1e-6)

    # rebinding state must invalidate the chain (fresh classifier)
    with pytest.raises(AssertionError, match="chain cache"):
        bs.set_state(bs.positions, bs.velocities)
        bs.update_many_block(1, eta=0.1, n_classes=3)
    bs._accel_closure = real_closure
    bs.update_many_block(1, eta=0.1, n_classes=3)


def test_body_system_update_many_block_rejections():
    from nbody_tpu.models.body_system import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel.mesh import make_mesh

    prm = NBodyParams(time_step=2e-3, softening=SOFT, damping=1.0)
    with pytest.raises(ValueError, match="single-device"):
        BodySystem(256, prm, backend="xla", mesh=make_mesh(8),
                   seed=1).update_many_block(2)
    with pytest.raises(ValueError, match="exact kernels"):
        BodySystem(256, prm, backend="pm", pm_grid=16,
                   seed=1).update_many_block(2)
    damped = NBodyParams(time_step=2e-3, softening=SOFT, damping=0.995)
    with pytest.raises(ValueError, match="damping"):
        BodySystem(256, damped, backend="xla",
                   seed=1).update_many_block(2)
    with pytest.raises(ValueError, match="eta"):
        BodySystem(256, prm, backend="xla",
                   seed=1).update_many_block(2, eta=0.0)
    with pytest.raises(ValueError, match="n_classes"):
        BodySystem(256, prm, backend="xla",
                   seed=1).update_many_block(2, n_classes=0)
