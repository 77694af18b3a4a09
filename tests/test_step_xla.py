"""XLA step vs NumPy/native oracle: the reference's QA compare re-created.

Criterion from the reference: one dt=0.001 step from identical state, every
position coordinate within 5e-4 (/root/reference/src/nbody/compute_cuda.cpp:294-333).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.reference import nbody_step_xla, compute_accel_xla, rollout_xla
from nbody_tpu.oracle import step_numpy, native_available, step_native
from nbody_tpu.oracle.numpy_oracle import accel_numpy

from conftest import assert_state_close

DT, SOFT, DAMP = 0.001, 0.1, 1.0


def test_xla_step_matches_numpy_oracle(shell_state_small):
    pos, vel = shell_state_small
    ref_pos, ref_vel = step_numpy(pos, vel, DT, SOFT, DAMP)
    new_pos, new_vel = jax.jit(nbody_step_xla)(pos, vel, DT, SOFT, DAMP)
    assert_state_close(new_pos, ref_pos)
    assert_state_close(new_vel, ref_vel)


def test_chunked_equals_dense(random_state_tiny):
    pos, vel = random_state_tiny
    dense = compute_accel_xla(jnp.asarray(pos), SOFT, chunk_size=None)
    chunked = compute_accel_xla(jnp.asarray(pos), SOFT, chunk_size=128)
    # chunking reorders fp32 accumulation; allow rounding-level differences
    np.testing.assert_allclose(np.asarray(dense), np.asarray(chunked), rtol=1e-4, atol=1e-4)


def test_accel_matches_oracle(random_state_tiny):
    pos, _ = random_state_tiny
    a_dev = np.asarray(compute_accel_xla(jnp.asarray(pos), SOFT))
    a_ref = accel_numpy(pos, SOFT)
    np.testing.assert_allclose(a_dev, a_ref, rtol=2e-4, atol=2e-4)


def test_mass_and_wlane_passthrough(random_state_tiny):
    pos, vel = random_state_tiny
    pos = pos.copy()
    pos[:, 3] = np.linspace(0.5, 2.0, pos.shape[0], dtype=np.float32)
    new_pos, new_vel = nbody_step_xla(pos, vel, DT, SOFT, DAMP)
    np.testing.assert_array_equal(np.asarray(new_pos)[:, 3], pos[:, 3])
    np.testing.assert_array_equal(np.asarray(new_vel)[:, 3], vel[:, 3])


def test_damping_applied(random_state_tiny):
    pos, vel = random_state_tiny
    _, v1 = nbody_step_xla(pos, vel, DT, SOFT, 1.0)
    _, v2 = nbody_step_xla(pos, vel, DT, SOFT, 0.5)
    np.testing.assert_allclose(np.asarray(v2)[:, :3], 0.5 * np.asarray(v1)[:, :3], rtol=1e-6)


def test_rollout_matches_repeated_steps(random_state_tiny):
    pos, vel = random_state_tiny
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    for _ in range(5):
        p, v = nbody_step_xla(p, v, DT, SOFT, DAMP)
    p2, v2 = rollout_xla(jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP, steps=5)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), rtol=1e-5, atol=1e-6)


def test_zero_mass_bodies_exert_no_force(random_state_tiny):
    """Tipsy padding invariant: zero-mass bodies contribute zero force
    (/root/reference/src/nbody/tipsy.cpp:111-122)."""
    pos, vel = random_state_tiny
    n = pos.shape[0]
    padded_pos = np.concatenate([pos, np.zeros((64, 4), np.float32)], axis=0)
    padded_vel = np.concatenate([vel, np.zeros((64, 4), np.float32)], axis=0)
    a_pad = np.asarray(compute_accel_xla(jnp.asarray(padded_pos), SOFT))[:n]
    a_ref = np.asarray(compute_accel_xla(jnp.asarray(pos), SOFT))
    # padding changes fp32 accumulation order; only bitwise-identical math is
    # impossible to demand here
    np.testing.assert_allclose(a_pad, a_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="native oracle not built")
def test_native_oracle_matches_numpy(shell_state_small):
    pos, vel = shell_state_small
    np_pos, np_vel = step_numpy(pos, vel, DT, SOFT, DAMP)
    nat_pos, nat_vel = step_native(pos, vel, DT, SOFT, DAMP)
    assert_state_close(nat_pos, np_pos, tol=1e-5)
    assert_state_close(nat_vel, np_vel, tol=1e-5)


@pytest.mark.skipif(not native_available(), reason="native oracle not built")
@pytest.mark.parametrize("integrator", ["leapfrog", "hermite"])
@pytest.mark.parametrize("dtype", [
    # f32 params are the fast-tier representatives (r5 re-tier: the f64
    # engine costs ~10 s/integrator on this host); f64 runs in the full
    # suite
    np.float32, pytest.param(np.float64, marks=pytest.mark.slow)])
def test_native_oracle_integrators_match_numpy(shell_state_small, integrator,
                                               dtype):
    """The native C++ engine's leapfrog/hermite match the NumPy oracle
    at reduction-order level in BOTH precisions, so every integrator's
    device path anchors against a single native ground truth (VERDICT
    r4 item 7; the reference keeps one oracle for all paths,
    /root/reference/src/nbody/bodysystemcpu.cpp:140-303)."""
    from nbody_tpu.oracle.numpy_oracle import (
        step_numpy_hermite,
        step_numpy_leapfrog,
    )

    ref = {"leapfrog": step_numpy_leapfrog,
           "hermite": step_numpy_hermite}[integrator]
    pos, vel = shell_state_small
    pos, vel = pos.astype(dtype), vel.astype(dtype)
    np_pos, np_vel = ref(pos, vel, DT, SOFT, DAMP)
    nat_pos, nat_vel = step_native(pos, vel, DT, SOFT, DAMP,
                                   integrator=integrator)
    tol = 1e-5 if dtype == np.float32 else 1e-12
    assert_state_close(nat_pos, np_pos, tol=tol)
    assert_state_close(nat_vel, np_vel, tol=tol)


@pytest.mark.skipif(not native_available(), reason="native oracle not built")
def test_native_accel_jerk_matches_numpy(shell_state_small):
    from nbody_tpu.oracle.native import accel_jerk_native
    from nbody_tpu.oracle.numpy_oracle import accel_jerk_numpy

    pos, vel = shell_state_small
    a_n, j_n = accel_jerk_native(pos, vel, SOFT)
    a_r, j_r = accel_jerk_numpy(pos, vel, SOFT)
    np.testing.assert_allclose(a_n, a_r, atol=1e-4)
    np.testing.assert_allclose(j_n, j_r, atol=5e-4)
