"""Leapfrog (DKD) integrator tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.models import BodySystem
from nbody_tpu.ops.energy import total_energy
from nbody_tpu.ops.reference import nbody_step_leapfrog, nbody_step_xla
from nbody_tpu.params import NBodyParams

SOFT = 0.1


def test_leapfrog_conserves_energy_better_than_euler():
    pos, vel = ic.generate(NBodyConfig.SHELL, 256, 1.52, 2.0, seed=4)
    dt, steps = 0.02, 40

    def drift(step_fn):
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        e0 = float(total_energy(p, v, SOFT))
        for _ in range(steps):
            p, v = step_fn(p, v, dt, SOFT, 1.0)
        return abs((float(total_energy(p, v, SOFT)) - e0) / e0)

    d_euler = drift(nbody_step_xla)
    d_leap = drift(nbody_step_leapfrog)
    assert d_leap < d_euler / 2, (d_leap, d_euler)


def test_leapfrog_small_dt_converges_to_euler():
    """Both integrators agree to O(dt^2) for small dt."""
    pos, vel = ic.generate(NBodyConfig.RANDOM, 128, 1.5, 2.0, seed=1)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    dt = 1e-4
    p1, v1 = nbody_step_leapfrog(p, v, dt, SOFT, 1.0)
    p2, v2 = nbody_step_xla(p, v, dt, SOFT, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_leapfrog_body_system_pallas_accel():
    """BodySystem leapfrog with the Pallas accel kernel (interpret mode)
    matches the XLA leapfrog."""
    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(256, params, backend="pallas", tile_i=8, tile_j=128,
                   interpret=True, integrator="leapfrog", seed=9)
    b = BodySystem(256, params, backend="xla", integrator="leapfrog", seed=9)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_leapfrog_sharded_matches_single_device(strategy):
    import jax

    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(512, params, backend="xla", integrator="leapfrog", seed=6)
    b = BodySystem(512, params, backend="xla", integrator="leapfrog", seed=6,
                   mesh=make_mesh(8), strategy=strategy)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=2e-5)


def test_leapfrog_ring_fused_sharded():
    import jax

    from nbody_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(512, params, backend="xla", integrator="leapfrog", seed=6)
    b = BodySystem(512, params, backend="pallas", integrator="leapfrog",
                   seed=6, mesh=make_mesh(8), strategy="ring_fused",
                   tile_i=8, interpret=True)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=2e-5)


def test_leapfrog_cli(capsys):
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "128", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--integrator", "leapfrog", "--energy"])
    assert rc == 0
    assert "energy:" in capsys.readouterr().out


def test_leapfrog_mass_passthrough():
    pos, vel = ic.generate(NBodyConfig.SHELL, 64, 1.0, 1.0, seed=0)
    pos = pos.copy()
    pos[:, 3] = np.linspace(0.5, 2.0, 64, dtype=np.float32)
    p1, v1 = nbody_step_leapfrog(jnp.asarray(pos), jnp.asarray(vel), 0.01, SOFT, 1.0)
    np.testing.assert_array_equal(np.asarray(p1)[:, 3], pos[:, 3])
