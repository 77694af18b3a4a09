"""BodySystem API tests (state get/set, reset, params, precision switch)."""

import jax
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, NBodyParams
from nbody_tpu.models import BodySystem

P = NBodyParams()


def _sys(n=256, **kw):
    kw.setdefault("backend", "xla")
    return BodySystem(n, P.replace(softening=0.1, damping=1.0), seed=1, **kw)


def test_state_roundtrip():
    s = _sys()
    pos = s.positions
    vel = s.velocities
    assert pos.shape == (256, 4) and vel.shape == (256, 4)
    s.set_positions(pos * 2)
    np.testing.assert_allclose(s.positions, pos * 2, rtol=1e-6)
    np.testing.assert_allclose(s.velocities, vel, rtol=1e-6)


def test_update_advances_state():
    s = _sys()
    p0 = s.positions
    s.update(0.01)
    assert not np.allclose(s.positions, p0)


def test_reset_reproducible():
    s = _sys()
    s.update(0.01)
    s.reset(P, NBodyConfig.SHELL, seed=1)
    s2 = _sys()
    np.testing.assert_array_equal(s.positions, s2.positions)


def test_update_params_changes_dynamics():
    a = _sys()
    b = _sys()
    b.update_params(P.replace(softening=1.0))
    a.update(0.01)
    b.update(0.01)
    assert not np.allclose(a.positions, b.positions)


def test_host_placement_matches_device():
    a = _sys(placement="device")
    b = _sys(placement="host")
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)


def test_host_placement_rollout_single_dispatch():
    """update_many with placement='host' runs the same scan rollout as the
    device path (one dispatch), and the state stays host-resident."""
    a = _sys(placement="device")
    b = _sys(placement="host")
    a.update_many(5, 0.01)
    b.update_many(5, 0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)
    assert isinstance(b.state[0], np.ndarray)  # still host-resident
    assert 5 in b._rollout_cache  # took the scan path, not a Python loop


def test_pallas_interpret_backend():
    s = _sys(backend="pallas", tile_i=8, tile_j=128, interpret=True)
    x = _sys(backend="xla")
    s.update(0.001)
    x.update(0.001)
    np.testing.assert_allclose(s.positions, x.positions, atol=1e-5)


def test_mesh_stepping_matches_single():
    from nbody_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    a = _sys()
    b = _sys(mesh=mesh)
    a.update(0.001)
    b.update(0.001)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)


def test_num_bodies_rounds_up_to_devices():
    from nbody_tpu.parallel import make_mesh

    s = BodySystem(1001, P, backend="xla", mesh=make_mesh(8), seed=0)
    assert s.num_bodies == 1008


def test_precision_switch():
    jax.config.update("jax_enable_x64", True)
    try:
        s = _sys()
        p32 = s.positions
        s64 = s.switch_precision()
        assert s64.dtype == np.float64
        np.testing.assert_allclose(s64.positions, p32.astype(np.float64))
        s32 = s64.switch_precision()
        assert s32.dtype == np.float32
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fp64_without_x64_raises():
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="x64"):
        BodySystem(64, P, dtype=jnp.float64, backend="xla")


def test_pallas_fp64_rejected():
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    try:
        with pytest.raises(ValueError, match="float32"):
            BodySystem(64, P, dtype=jnp.float64, backend="pallas")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_total_energy_finite():
    s = _sys()
    e = s.total_energy()
    assert np.isfinite(e)


def test_update_many_segments_match_single_rollout():
    """Rollouts longer than _MAX_ROLLOUT_SEGMENT run as segments sharing
    one compiled scan; the trajectory must equal unsegmented stepping."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=0.1, damping=1.0)
    a = BodySystem(256, params, backend="xla", seed=5)
    b = BodySystem(256, params, backend="xla", seed=5)
    a._MAX_ROLLOUT_SEGMENT = 7          # force many segments
    a.update_many(23, 0.01)
    b.update_many(23, 0.01)
    np.testing.assert_allclose(a.positions, b.positions, rtol=0, atol=1e-6)
    # the segment rollout is compiled once and reused
    assert set(a._rollout_cache) == {7, 2}  # 3x7 + 2
