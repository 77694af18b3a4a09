"""Sharded step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.parallel import make_mesh, make_sharded_step, shard_state
from nbody_tpu.parallel.sharded import make_sharded_rollout
from nbody_tpu.ops.reference import nbody_step_xla

DT, SOFT, DAMP = 0.001, 0.1, 1.0


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh or real hardware)")
    return make_mesh(8)


def _single_device_reference(pos, vel, steps=1):
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    for _ in range(steps):
        p, v = nbody_step_xla(p, v, DT, SOFT, DAMP)
    return np.asarray(p), np.asarray(v)


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_sharded_xla_matches_single_device(mesh8, random_state_tiny, strategy):
    pos, vel = random_state_tiny
    ref_p, ref_v = _single_device_reference(pos, vel)
    ps, vs = shard_state(mesh8, pos, vel)
    step = make_sharded_step(mesh8, kernel="xla", strategy=strategy)
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), ref_v, atol=2e-5)


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_sharded_pallas_interpret_matches_single_device(mesh8, random_state_tiny, strategy):
    pos, vel = random_state_tiny
    ref_p, ref_v = _single_device_reference(pos, vel)
    ps, vs = shard_state(mesh8, pos, vel)
    step = make_sharded_step(
        mesh8, kernel="pallas", strategy=strategy,
        tile_i=8, tile_j=128, interpret=True,
    )
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), ref_v, atol=2e-5)


def test_sharded_output_stays_sharded(mesh8, random_state_tiny):
    pos, vel = random_state_tiny
    ps, vs = shard_state(mesh8, pos, vel)
    step = make_sharded_step(mesh8, kernel="xla")
    p1, _ = step(ps, vs, DT, SOFT, DAMP)
    assert p1.sharding == ps.sharding, "step must preserve body sharding"


def test_sharded_rollout(mesh8, random_state_tiny):
    pos, vel = random_state_tiny
    ref_p, _ = _single_device_reference(pos, vel, steps=4)
    ps, vs = shard_state(mesh8, pos, vel)
    step = make_sharded_step(mesh8, kernel="xla")
    rollout = make_sharded_rollout(step, steps=4)
    p1, _ = rollout(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=1e-4)


def test_indivisible_n_raises(mesh8, random_state_tiny):
    pos, vel = random_state_tiny
    with pytest.raises(ValueError):
        shard_state(mesh8, pos[:333], vel[:333])


def test_choose_strategy_cost_model():
    from nbody_tpu.parallel import choose_strategy
    from nbody_tpu.parallel.sharded import RING_AUTO_MIN_SHARD

    # single device: nothing to communicate — allgather (a no-op collective)
    assert choose_strategy(1 << 20, 1) == "allgather"
    # small shards: per-hop latency dominates, one fused gather wins
    assert choose_strategy(8 * (RING_AUTO_MIN_SHARD - 8), 8) == "allgather"
    # large shards: overlapped ring hides the transfer entirely
    assert choose_strategy(8 * RING_AUTO_MIN_SHARD, 8) == "ring"


def test_sharded_auto_matches_single_device(mesh8, random_state_tiny):
    pos, vel = random_state_tiny
    ref_p, ref_v = _single_device_reference(pos, vel)
    ps, vs = shard_state(mesh8, pos, vel)
    step = make_sharded_step(mesh8, kernel="xla", strategy="auto")
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), ref_v, atol=2e-5)
    assert p1.sharding == ps.sharding


def test_2d_decomposition_matches_single_device():
    """The (rows x cols) i-block x j-block decomposition must reproduce the
    single-device step for every integrator (gathers along both mesh axes,
    psum over cols)."""
    import jax

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.reference import (
        nbody_step_hermite,
        nbody_step_leapfrog,
        nbody_step_xla,
    )
    from nbody_tpu.parallel import make_mesh_2d, make_sharded_step_2d, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = ic.generate(NBodyConfig.SHELL, 256, 1.5, 2.0, seed=4)
    pj, vj = jnp.asarray(pos), jnp.asarray(vel)
    mesh = make_mesh_2d(2, 4)
    ps, vs = shard_state(mesh, pos, vel, axis=("rows", "cols"))
    refs = {
        "euler": nbody_step_xla(pj, vj, 0.001, 0.1, 0.999),
        "leapfrog": nbody_step_leapfrog(pj, vj, 0.001, 0.1, 0.999),
        "hermite": nbody_step_hermite(pj, vj, 0.001, 0.1, 0.999),
    }
    for integrator, (ref_p, ref_v) in refs.items():
        step = make_sharded_step_2d(mesh, kernel="xla",
                                    integrator=integrator)
        p1, v1 = step(ps, vs, 0.001, 0.1, 0.999)
        assert p1.sharding == ps.sharding, integrator
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                                   rtol=2e-5, atol=1e-6, err_msg=integrator)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                                   rtol=2e-5, atol=1e-6, err_msg=integrator)


def test_2d_decomposition_pallas_interpret():
    import jax

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.reference import nbody_step_xla
    from nbody_tpu.parallel import make_mesh_2d, make_sharded_step_2d, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pos, vel = ic.generate(NBodyConfig.SHELL, 128, 1.5, 2.0, seed=5)
    ref_p, ref_v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel),
                                  0.001, 0.1, 1.0)
    mesh = make_mesh_2d(4, 2)
    ps, vs = shard_state(mesh, pos, vel, axis=("rows", "cols"))
    step = make_sharded_step_2d(mesh, kernel="pallas", tile_i=8,
                                tile_j=128, interpret=True)
    p1, v1 = step(ps, vs, 0.001, 0.1, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p),
                               rtol=2e-5, atol=1e-6)


def test_2d_mesh_via_body_system():
    """BodySystem routes a 2-axis mesh to the 2-D decomposition."""
    import jax

    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = BodySystem(256, NBodyParams(), backend="xla",
                   mesh=make_mesh_2d(2, 4), seed=0)
    m0 = s.positions[:, 3].copy()
    s.update_many(3, 0.001)
    np.testing.assert_array_equal(s.positions[:, 3], m0)
    assert np.isfinite(s.positions).all()
    with pytest.raises(ValueError, match="1-D"):
        BodySystem(256, NBodyParams(), backend="pm",
                   mesh=make_mesh_2d(2, 4))


def test_2d_mesh_hermite_via_body_system():
    import jax

    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = BodySystem(256, NBodyParams(), backend="xla", integrator="hermite",
                   mesh=make_mesh_2d(4, 2), seed=2)
    s.update_many(2, 0.001)
    assert np.isfinite(s.positions).all()


@pytest.mark.parametrize("ndev", [2, 4, 5, 8])
def test_sharded_sym_matches_single_device(random_state_tiny, ndev):
    """strategy='sym' (each global pair computed ONCE across the mesh:
    self triangles + offset cross rectangles + split antipodal quarters)
    matches the single-device step for odd and even device counts."""
    if len(jax.devices()) < ndev:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(ndev)
    if ndev == 5:
        from nbody_tpu import NBodyConfig, ic

        pos, vel = ic.generate(NBodyConfig.RANDOM, 640, 1.54, 8.0, seed=3)
    else:
        pos, vel = random_state_tiny
    ref_p, ref_v = _single_device_reference(pos, vel)
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="sym",
                             tile_i=8, tile_j=128, interpret=True)
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), ref_v, atol=2e-5)
    assert p1.sharding == ps.sharding


def test_sharded_sym_leapfrog_matches_single_device(random_state_tiny):
    from nbody_tpu.ops.reference import nbody_step_leapfrog

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    pos, vel = random_state_tiny
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    ref_p, ref_v = nbody_step_leapfrog(p, v, DT, SOFT, DAMP)
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="sym",
                             tile_i=8, tile_j=128, interpret=True,
                             integrator="leapfrog")
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v), atol=2e-5)


def test_sharded_sym_gates():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="pallas"):
        make_sharded_step(mesh, kernel="xla", strategy="sym")


@pytest.mark.parametrize("ndev", [
    # D=2 (even) and D=5 (uneven shards + shrunken-cap sub-block) are the
    # fast-tier representatives; D=8 runs in the full suite and the
    # driver's dryrun (r5 re-tier)
    2, 5, pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_sym_hermite_matches_single_device(ndev):
    """strategy='sym' + hermite: the sharded accel+jerk decomposition
    (self triangles + offset cross rectangles + antipodal quarters, 6
    reaction planes per contribution) matches the single-device hermite
    step for odd and even device counts."""
    from nbody_tpu.ops.reference import (
        compute_accel_jerk_xla,
        nbody_step_hermite,
    )

    if len(jax.devices()) < ndev:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(ndev)
    from nbody_tpu import NBodyConfig, ic

    n = 640 if ndev == 5 else 512
    pos, vel = ic.generate(NBodyConfig.RANDOM, n, 1.54, 8.0, seed=3)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    ref_p, ref_v = nbody_step_hermite(
        p, v, DT, SOFT, DAMP,
        accel_jerk_fn=lambda p4, v4: compute_accel_jerk_xla(p4, v4, SOFT))
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="sym",
                             tile_i=8, tile_j=128, interpret=True,
                             integrator="hermite")
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v), atol=2e-5)
    assert p1.sharding == ps.sharding


def test_sharded_sym_hermite_subblocks_big_shards(monkeypatch):
    """Shards larger than AJ_SYM_MAX_N sub-block their accel+jerk cross
    rectangles (cap shrunk so interpret mode is feasible); results must
    still match the single-device hermite step."""
    import nbody_tpu.ops.symmetric_kernel as symk
    from nbody_tpu.ops.reference import (
        compute_accel_jerk_xla,
        nbody_step_hermite,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    monkeypatch.setattr(symk, "AJ_SYM_MAX_N", 128)
    mesh = make_mesh(2)  # nloc = 256 > the shrunken cap
    from nbody_tpu import NBodyConfig, ic

    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=4)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    ref_p, ref_v = nbody_step_hermite(
        p, v, DT, SOFT, DAMP,
        accel_jerk_fn=lambda p4, v4: compute_accel_jerk_xla(p4, v4, SOFT))
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="sym",
                             tile_i=8, tile_j=128, interpret=True,
                             integrator="hermite")
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v), atol=2e-5)


def test_sharded_sym_subblocks_big_shards(monkeypatch, random_state_tiny):
    """Shards larger than SYM_MAX_N sub-block their cross rectangles so
    the per-kernel reaction scratch stays inside the VMEM cap (the cap
    is shrunk so the path runs in interpret mode); results must still
    match the single-device step."""
    import nbody_tpu.ops.symmetric_kernel as symk

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    monkeypatch.setattr(symk, "SYM_MAX_N", 128)
    mesh = make_mesh(2)  # nloc = 256 > the shrunken cap
    pos, vel = random_state_tiny
    ref_p, ref_v = _single_device_reference(pos, vel)
    ps, vs = shard_state(mesh, pos, vel)
    step = make_sharded_step(mesh, kernel="pallas", strategy="sym",
                             tile_i=8, tile_j=128, interpret=True)
    p1, v1 = step(ps, vs, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), ref_p, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), ref_v, atol=2e-5)
