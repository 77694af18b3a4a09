"""4th-order Hermite integrator tests (jerk correctness, order, parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.reference import (
    compute_accel_jerk_xla,
    compute_accel_xla,
    nbody_step_hermite,
    nbody_step_xla,
)

DT, SOFT = 0.001, 0.1


@pytest.fixture(scope="module")
def state():
    pos, vel = ic.generate(NBodyConfig.SHELL, 256, 1.5, 2.0, seed=9)
    return jnp.asarray(pos), jnp.asarray(vel)


def test_jerk_is_time_derivative_of_accel(state):
    """Finite-difference check: jerk == d(accel)/dt along straight-line
    motion (positions advected by velocities)."""
    pos, vel = state
    delta = 1e-3  # smaller deltas drown in f32 cancellation noise
    _, jerk = compute_accel_jerk_xla(pos, vel, SOFT)
    pos_fwd = pos.at[:, :3].add(vel[:, :3] * delta)
    pos_bwd = pos.at[:, :3].add(-vel[:, :3] * delta)
    a_fwd = compute_accel_xla(pos_fwd, SOFT)
    a_bwd = compute_accel_xla(pos_bwd, SOFT)
    fd = (np.asarray(a_fwd) - np.asarray(a_bwd)) / (2 * delta)
    scale = np.abs(fd).max()
    np.testing.assert_allclose(np.asarray(jerk), fd, atol=2e-3 * scale)


def test_accel_jerk_chunked_matches_dense(state):
    pos, vel = state
    a_d, j_d = compute_accel_jerk_xla(pos, vel, SOFT)
    a_c, j_c = compute_accel_jerk_xla(pos, vel, SOFT, chunk_size=64)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-5, atol=1e-4)


def test_hermite_beats_euler_on_energy(state):
    """Same dt, 50 steps, damping=1: Hermite's energy drift must be orders
    of magnitude below Euler's (4th vs 1st order)."""
    from nbody_tpu.ops.energy import total_energy

    pos, vel = state
    e0 = float(total_energy(pos, vel, SOFT))

    def drift(step_fn):
        p, v = pos, vel
        for _ in range(50):
            p, v = step_fn(p, v, DT, SOFT, 1.0)
        return abs((float(total_energy(p, v, SOFT)) - e0) / e0)

    d_euler = drift(nbody_step_xla)
    d_hermite = drift(nbody_step_hermite)
    assert d_hermite < d_euler / 50, (d_euler, d_hermite)


def test_hermite_matches_numpy_oracle(state):
    """Device Hermite vs the host Hermite oracle: the QA criterion applied
    like-with-like (same integrator both sides)."""
    from nbody_tpu.oracle.numpy_oracle import step_numpy_hermite

    pos, vel = state
    p1, v1 = nbody_step_hermite(pos, vel, DT, SOFT, 0.999)
    po, vo = step_numpy_hermite(np.asarray(pos), np.asarray(vel),
                                DT, SOFT, 0.999)
    assert np.abs(np.asarray(p1)[:, :3] - po[:, :3]).max() <= 5e-4
    assert np.abs(np.asarray(v1)[:, :3] - vo[:, :3]).max() <= 5e-3


def test_hermite_via_body_system_and_compute():
    from nbody_tpu.compute import Compute

    c = Compute(num_bodies=256, backend="xla", cycle_demo=False,
                integrator="hermite", log=lambda *a: None)
    assert c.compare_results() is True  # oracle dispatches hermite too
    c.system.update_many(3, DT)
    assert np.isfinite(c.system.positions).all()


def test_hermite_cli_and_drift_check(capsys):
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "128", "--kernel", "xla",
               "--integrator", "hermite", "--drift-check", "2"])
    assert rc == 0


def test_hermite_mass_and_w_lane_pass_through(state):
    pos, vel = state
    p1, v1 = nbody_step_hermite(pos, vel, DT, SOFT, 1.0)
    np.testing.assert_array_equal(np.asarray(p1)[:, 3], np.asarray(pos)[:, 3])
    np.testing.assert_array_equal(np.asarray(v1)[:, 3], np.asarray(vel)[:, 3])


def test_hermite_rejects_pm_backend():
    """--kernel pm --integrator hermite must error clearly, not silently run
    the O(N^2) pairwise Hermite path (code-review finding r2)."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    with pytest.raises(ValueError, match="jerk"):
        BodySystem(128, NBodyParams(), backend="pm", integrator="hermite")


def test_sharded_hermite_matches_single_device(state):
    """Both collective shapes of the sharded Hermite step (allgather of
    pos+vel, ring of (jpos, jvel) pairs) must reproduce the single-device
    predictor-corrector."""
    from nbody_tpu.parallel import make_mesh, shard_state
    from nbody_tpu.parallel.sharded import make_sharded_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = state
    ref_p, ref_v = nbody_step_hermite(pos, vel, DT, SOFT, 0.999)
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    for strategy in ("allgather", "ring"):
        step = make_sharded_step(mesh, kernel="xla", strategy=strategy,
                                 integrator="hermite")
        p1, v1 = step(ps, vs, DT, SOFT, 0.999)
        assert p1.sharding == ps.sharding
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                                   rtol=1e-5, atol=1e-6, err_msg=strategy)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                                   rtol=1e-5, atol=1e-6, err_msg=strategy)


def test_sharded_hermite_via_body_system():
    """BodySystem routes mesh+hermite to the XLA sharded step for any
    requested backend (pallas has no jerk kernel)."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = BodySystem(256, NBodyParams(), backend="xla",
                   integrator="hermite", mesh=make_mesh(8), seed=1)
    m0 = s.positions[:, 3].copy()
    s.update_many(3, DT)
    np.testing.assert_array_equal(s.positions[:, 3], m0)
    assert np.isfinite(s.positions).all()


def test_sharded_hermite_rejects_ring_fused():
    from nbody_tpu.parallel import make_mesh
    from nbody_tpu.parallel.sharded import make_sharded_step

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="ring_fused"):
        make_sharded_step(mesh, kernel="xla", strategy="ring_fused",
                          integrator="hermite")


def test_pallas_accel_jerk_matches_xla(state):
    """The fused Pallas acc+jerk kernel must reproduce the XLA evaluation
    (interpret mode on CPU; the verify drive covers compiled-on-TPU)."""
    from nbody_tpu.ops.pallas_kernel import compute_accel_jerk_pallas

    pos, vel = state
    a_ref, j_ref = compute_accel_jerk_xla(pos, vel, SOFT)
    a, j = compute_accel_jerk_pallas(pos, vel, pos, vel, SOFT,
                                     tile_i=16, tile_j=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_hermite_step_via_body_system(state):
    """backend='pallas' + integrator='hermite' routes force evaluations
    through the fused kernel and must match the XLA hermite step."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    pos, vel = state
    ref_p, ref_v = nbody_step_hermite(pos, vel, DT, SOFT, 0.999)
    s = BodySystem(pos.shape[0], NBodyParams(softening=SOFT, damping=0.999),
                   backend="pallas", integrator="hermite", interpret=True,
                   tile_i=16, tile_j=128,
                   state=(np.asarray(pos), np.asarray(vel)))
    s.update(DT)
    np.testing.assert_allclose(s.positions, np.asarray(ref_p),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s.velocities, np.asarray(ref_v),
                               rtol=2e-5, atol=2e-6)


def test_sharded_hermite_pallas_matches_single_device(state):
    from nbody_tpu.parallel import make_mesh, shard_state
    from nbody_tpu.parallel.sharded import make_sharded_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = state
    ref_p, ref_v = nbody_step_hermite(pos, vel, DT, SOFT, 0.999)
    mesh = make_mesh(8)
    ps, vs = shard_state(mesh, np.asarray(pos), np.asarray(vel))
    for strategy in ("allgather", "ring"):
        step = make_sharded_step(mesh, kernel="pallas", strategy=strategy,
                                 integrator="hermite", tile_i=16,
                                 tile_j=128, interpret=True)
        p1, v1 = step(ps, vs, DT, SOFT, 0.999)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                                   rtol=2e-5, atol=2e-6, err_msg=strategy)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                                   rtol=2e-5, atol=2e-6, err_msg=strategy)
