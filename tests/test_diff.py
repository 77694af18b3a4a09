"""Differentiability tests: grads through steps and rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.diff import nbody_step_diff
from nbody_tpu.ops.reference import nbody_step_xla

SOFT, DT = 0.5, 0.01


def _state(n=64):
    pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.0, 1.0, seed=5)
    return jnp.asarray(pos), jnp.asarray(vel)


def test_xla_step_is_differentiable():
    pos, vel = _state()

    def loss(soft):
        p, v = nbody_step_xla(pos, vel, DT, soft, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g = jax.grad(loss)(jnp.float32(SOFT))
    assert np.isfinite(float(g)) and float(g) != 0.0


@pytest.mark.slow
def test_custom_vjp_matches_xla_grad():
    pos, vel = _state()

    def loss_diff(soft):
        p, v = nbody_step_diff(pos, vel, DT, soft, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    def loss_xla(soft):
        p, v = nbody_step_xla(pos, vel, DT, soft, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g1 = float(jax.grad(loss_diff)(jnp.float32(SOFT)))
    g2 = float(jax.grad(loss_xla)(jnp.float32(SOFT)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_grad_matches_finite_difference():
    pos, vel = _state(32)

    def loss(soft):
        p, _ = nbody_step_diff(pos, vel, DT, soft, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g = float(jax.grad(loss)(jnp.float32(SOFT)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(SOFT + eps))) - float(loss(jnp.float32(SOFT - eps)))) / (2 * eps)
    # central differences on an fp32 loss carry ~percent-level cancellation
    # noise; this is a sanity check of sign/magnitude, exactness is covered
    # by test_custom_vjp_matches_xla_grad
    np.testing.assert_allclose(g, fd, rtol=0.1)


def test_remat_rollout_grad_matches_loop():
    from nbody_tpu.ops.diff import rollout_diff

    pos, vel = _state(32)

    def loss_rollout(p0):
        p, _ = rollout_diff(p0, vel, DT, SOFT, 1.0, steps=3)
        return jnp.sum(p[:, :3] ** 2)

    def loss_loop(p0):
        p, v = p0, vel
        for _ in range(3):
            p, v = nbody_step_diff(p, v, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g1 = np.asarray(jax.grad(loss_rollout)(pos))
    g2 = np.asarray(jax.grad(loss_loop)(pos))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_grad_wrt_positions_through_rollout():
    pos, vel = _state(32)

    def loss(p0):
        p, v = p0, vel
        for _ in range(3):
            p, v = nbody_step_diff(p, v, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g = jax.grad(loss)(pos)
    assert g.shape == pos.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)[:, :3]).max() > 0


def test_sharded_step_diff_matches_single_device_grad():
    """Gradients through the body-sharded step (virtual 8-device mesh) must
    match single-device gradients of the same physics."""
    from nbody_tpu.ops.diff import make_sharded_step_diff
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    pos, vel = _state(64)

    def loss_single(p0, v0):
        p, v = nbody_step_xla(p0, v0, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g_ref = np.asarray(jax.grad(loss_single)(pos, vel))

    step = make_sharded_step_diff(mesh, strategy="allgather",
                                  tile_i=8, tile_j=128, interpret=True)
    ps, vs = shard_state(mesh, pos, vel)

    def loss_sharded(p0, v0):
        p, v = step(p0, v0, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g_sh = np.asarray(jax.jit(jax.grad(loss_sharded))(ps, vs))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-4, atol=1e-5)


def test_sharded_step_diff_ring_strategy_grads():
    from nbody_tpu.ops.diff import make_sharded_step_diff
    from nbody_tpu.parallel import make_mesh, shard_state

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    pos, vel = _state(64)

    def loss_single(p0, v0):
        p, v = nbody_step_xla(p0, v0, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g_ref = np.asarray(jax.grad(loss_single)(pos, vel))

    step = make_sharded_step_diff(mesh, strategy="ring",
                                  tile_i=8, tile_j=128, interpret=True)
    ps, vs = shard_state(mesh, pos, vel)

    def loss_sharded(p0, v0):
        p, v = step(p0, v0, DT, SOFT, 1.0)
        return jnp.sum(p[:, :3] ** 2)

    g_sh = np.asarray(jax.jit(jax.grad(loss_sharded))(ps, vs))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-4, atol=1e-5)
