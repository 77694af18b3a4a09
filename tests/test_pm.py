"""Particle-mesh solver tests: accuracy envelope, invariants, integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.pm import nbody_step_pm, pm_accel
from nbody_tpu.ops.reference import compute_accel_xla


@pytest.fixture(scope="module")
def cloud():
    pos, vel = ic.generate(NBodyConfig.RANDOM, 2048, 1.5, 2.0, seed=3)
    return jnp.asarray(pos), jnp.asarray(vel)


def _median_rel_err(pos, grid):
    a_ref = np.asarray(compute_accel_xla(pos, 1e-4))
    a_pm = np.asarray(pm_accel(pos, grid=grid))
    num = np.sqrt(((a_pm - a_ref) ** 2).sum(1))
    den = np.maximum(np.sqrt((a_ref ** 2).sum(1)), 1e-12)
    return float(np.median(num / den))


@pytest.mark.slow
def test_pm_accuracy_envelope_and_convergence(cloud):
    """PM is resolution-limited: the documented envelope is a few % median
    force error at G=64, converging as the mesh refines."""
    pos, _ = cloud
    e32 = _median_rel_err(pos, 32)
    e64 = _median_rel_err(pos, 64)
    e128 = _median_rel_err(pos, 128)
    assert e64 < 0.06, f"median rel err at G=64 is {e64}"
    assert e32 > e64 > e128, f"no convergence: {e32} -> {e64} -> {e128}"


def test_pm_conserves_momentum(cloud):
    """Spectral kernel symmetry => sum of m*a vanishes to machine precision
    (Newton's third law on the mesh)."""
    pos, _ = cloud
    a = np.asarray(pm_accel(pos, grid=64))
    m = np.asarray(pos)[:, 3:4]
    imbalance = np.abs((m * a).sum(0)).max() / np.abs(m * a).sum()
    assert imbalance < 1e-6, f"net momentum injection {imbalance}"


def test_pm_far_field_matches_direct_sum(cloud):
    """A probe at ~10 cluster radii must feel the right monopole force."""
    pos, _ = cloud
    probe = np.zeros((1, 4), np.float32)
    probe[0, :3] = [30.0, 0.0, 0.0]
    probe[0, 3] = 1.0
    pp = jnp.concatenate([pos, jnp.asarray(probe)])
    a_pm = np.asarray(pm_accel(pp, grid=64))[-1]
    a_ref = np.asarray(compute_accel_xla(pp, 1e-4))[-1]
    rel = np.linalg.norm(a_pm - a_ref) / np.linalg.norm(a_ref)
    assert rel < 0.05, f"far-field error {rel}"


def test_pm_is_differentiable(cloud):
    pos, _ = cloud
    g = jax.grad(lambda q: jnp.sum(pm_accel(q, grid=32) ** 2))(pos)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_pm_step_and_body_system():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    for integrator in ("euler", "leapfrog"):
        s = BodySystem(512, NBodyParams(), backend="pm", pm_grid=32,
                       integrator=integrator, seed=0)
        s.update_many(3, 0.001)
        assert np.isfinite(s.positions).all(), integrator

    # direct step function parity with the Euler update shape
    pos, vel = ic.generate(NBodyConfig.RANDOM, 256, 1.5, 2.0, seed=1)
    p1, v1 = nbody_step_pm(jnp.asarray(pos), jnp.asarray(vel),
                           0.001, 0.1, 0.999, grid=32)
    assert p1.shape == pos.shape and v1.shape == vel.shape
    np.testing.assert_array_equal(np.asarray(p1)[:, 3], pos[:, 3])  # mass kept


def test_sharded_pm_matches_single_device(cloud):
    """Body-sharded PM (local deposit + grid psum + local gather) must
    reproduce the single-device solve: same global box, same mass field."""
    from nbody_tpu.ops.pm import make_sharded_pm_step, nbody_step_pm
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v = nbody_step_pm(pos, vel, 0.001, 0.1, 1.0, grid=32)
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_pm_step(mesh, grid=32)
    p1, v1 = step(ps, vs, 0.001, 0.1, 1.0)
    assert p1.sharding == ps.sharding
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)


def test_sharded_pm_leapfrog_via_body_system(cloud):
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = BodySystem(512, NBodyParams(), backend="pm", pm_grid=32,
                   mesh=make_mesh(8), integrator="leapfrog", seed=0)
    s.update_many(3, 0.001)
    assert np.isfinite(s.positions).all()


def test_cli_pm_kernel_demo(capsys):
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "pm",
               "--pm-grid", "32", "--no-cycle"])
    assert rc == 0


def test_tsc_weights_partition_of_unity():
    """TSC 27-point weights must sum to 1 per particle (mass conservation)
    and deposit the exact total mass."""
    from nbody_tpu.ops.pm import _deposit, _fit_box, _tsc_indices_weights

    rng = np.random.default_rng(0)
    pos3 = jnp.asarray(rng.uniform(-3, 3, (512, 3)), jnp.float32)
    mass = jnp.ones(512, jnp.float32)
    lo, h = _fit_box(pos3, 32)
    idx, w = _tsc_indices_weights(pos3, lo, h, 32)
    assert idx.shape == (27, 512) and w.shape == (27, 512)
    np.testing.assert_allclose(np.asarray(w.sum(0)), 1.0, atol=1e-5)
    rho = _deposit(idx, w, mass, 32)
    np.testing.assert_allclose(float(rho.sum()), 512.0, rtol=1e-5)


def test_tsc_pm_not_worse_than_cic(cloud):
    """TSC's smoother assignment must not degrade PM accuracy (it is one
    B-spline order above CIC)."""
    from nbody_tpu.ops.reference import compute_accel_xla

    pos, _ = cloud
    a_ref = np.asarray(compute_accel_xla(pos, 0.1))

    def med_rel(a):
        num = np.sqrt(((np.asarray(a) - a_ref) ** 2).sum(1))
        den = np.maximum(np.sqrt((a_ref ** 2).sum(1)), 1e-12)
        return np.median(num / den)

    err_cic = med_rel(pm_accel(pos, grid=64, assignment="cic"))
    err_tsc = med_rel(pm_accel(pos, grid=64, assignment="tsc"))
    assert err_tsc <= err_cic * 1.05, (err_tsc, err_cic)


def test_sharded_pm_tsc_matches_single_device(cloud):
    from nbody_tpu.ops.pm import make_sharded_pm_step, nbody_step_pm
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    ref_p, ref_v = nbody_step_pm(pos, vel, 0.001, 0.1, 1.0, grid=32,
                                 assignment="tsc")
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    step = make_sharded_pm_step(mesh, grid=32, assignment="tsc")
    p1, v1 = step(ps, vs, 0.001, 0.1, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)


def test_slab_fft_pm_matches_single_device(cloud):
    """The distributed-FFT (x-slab) PM pipeline must reproduce the
    single-device solve: same padded grid, same kernel, same gradient —
    only the data decomposition differs."""
    from nbody_tpu.ops.pm import make_sharded_pm_step, nbody_step_pm
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = cloud
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    for assignment in ("cic", "tsc"):
        ref_p, ref_v = nbody_step_pm(pos, vel, 0.001, 0.1, 1.0, grid=16,
                                     assignment=assignment)
        step = make_sharded_pm_step(mesh, grid=16, fft="slab",
                                    assignment=assignment)
        p1, v1 = step(ps, vs, 0.001, 0.1, 1.0)
        assert p1.sharding == ps.sharding
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                                   rtol=1e-4, atol=1e-4, err_msg=assignment)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                                   rtol=1e-4, atol=1e-4, err_msg=assignment)


def test_slab_fft_rejects_bad_device_count():
    from nbody_tpu.ops.pm import make_sharded_pm_step
    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    with pytest.raises(ValueError, match="divide"):
        make_sharded_pm_step(make_mesh(8), grid=2, fft="slab")  # 2*2 % 8 != 0


def test_pm_is_differentiable(cloud):
    """The docstring claims PM is differentiable (pure jnp pipeline):
    gradients through a PM step must exist, be finite, and match finite
    differences on a smooth scalar loss."""
    pos, vel = cloud

    def loss(p):
        p1, v1 = nbody_step_pm(p, vel, 0.001, 0.1, 1.0, grid=16)
        return jnp.sum(p1[:, :3] ** 2)

    g = jax.grad(loss)(pos)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # directional finite-difference check
    rng = np.random.default_rng(0)
    direction = jnp.asarray(rng.normal(size=pos.shape).astype(np.float32))
    eps = 1e-3
    fd = (loss(pos + eps * direction) - loss(pos - eps * direction)) / (2 * eps)
    analytic = jnp.vdot(g, direction)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=5e-2)
