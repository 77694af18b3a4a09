"""Physics invariants: conservation laws and cross-config fuzzing.

These catch sign/bookkeeping errors no point-comparison would: with
damping=1 the pairwise forces are antisymmetric, so total momentum is
conserved exactly (up to fp rounding) and the center of mass moves
uniformly; every kernel/config combination must agree with the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
from nbody_tpu.ops.reference import compute_accel_xla, nbody_step_xla
from nbody_tpu.oracle import step_numpy

from conftest import assert_state_close

SOFT = 0.1


def _momentum(pos, vel):
    return (pos[:, 3:4] * vel[:, :3]).sum(axis=0)


def test_total_force_is_zero():
    """Newton's third law: sum_i m_i a_i = 0 (antisymmetric pair forces)."""
    pos, _ = ic.generate(NBodyConfig.SHELL, 1024, 1.52, 2.0, seed=1)
    acc = np.asarray(compute_accel_xla(jnp.asarray(pos), SOFT))
    net = (pos[:, 3:4] * acc).sum(axis=0)
    scale = np.abs(pos[:, 3:4] * acc).sum()
    assert np.abs(net).max() / scale < 1e-5


def test_momentum_conserved_over_rollout():
    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=2)
    p0 = _momentum(pos, vel)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    for _ in range(20):
        p, v = nbody_step_xla(p, v, 0.01, SOFT, 1.0)
    p1 = _momentum(np.asarray(p), np.asarray(v))
    # momentum is O(N * v); drift should be rounding-level
    v_scale = np.abs(np.asarray(v)[:, :3]).sum()
    assert np.abs(p1 - p0).max() / v_scale < 1e-4


def test_damping_scales_momentum():
    """With damping d, each step multiplies total momentum by exactly d."""
    pos, vel = ic.generate(NBodyConfig.RANDOM, 256, 1.5, 8.0, seed=3)
    p0 = _momentum(pos, vel)
    p, v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.01, SOFT, 0.5)
    p1 = _momentum(np.asarray(p), np.asarray(v))
    np.testing.assert_allclose(p1, 0.5 * p0, rtol=1e-3, atol=1e-4)


def test_two_body_symmetric_approach():
    """Two equal masses at rest accelerate toward each other symmetrically."""
    pos = np.zeros((2, 4), np.float32)
    pos[0, 0], pos[1, 0] = -1.0, 1.0
    pos[:, 3] = 1.0
    vel = np.zeros((2, 4), np.float32)
    p, v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.01, SOFT, 1.0)
    p = np.asarray(p)
    v = np.asarray(v)
    assert v[0, 0] > 0 > v[1, 0]  # attraction
    np.testing.assert_allclose(p[0, :3], -p[1, :3], atol=1e-7)  # symmetry


@pytest.mark.parametrize("config", list(NBodyConfig))
@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_pallas_vs_oracle(config, seed):
    """Every IC family x seed: one QA-criterion step, pallas vs oracle."""
    pos, vel = ic.generate(config, 384, 1.3, 3.0, seed=seed)
    ref_pos, _ = step_numpy(pos, vel, 0.001, SOFT, 1.0)
    for variant in ("vpu", "mxu"):
        p1, _ = nbody_step_pallas(
            jnp.asarray(pos), jnp.asarray(vel), 0.001, SOFT, 1.0,
            tile_i=64, tile_j=128, interpret=True, variant=variant,
        )
        assert_state_close(p1, ref_pos)


def _angular_momentum(pos, vel):
    return np.cross(pos[:, :3], pos[:, 3:4] * vel[:, :3]).sum(axis=0)


def test_angular_momentum_conserved():
    """Central pairwise forces exert zero net torque: total L = sum m r x v
    is conserved (damping=1). Complements the linear-momentum test — a
    force-symmetry bug that preserves sum F can still break sum r x F."""
    from nbody_tpu.models.body_system import BodySystem
    from nbody_tpu.params import NBodyParams

    bs = BodySystem(512, NBodyParams(softening=SOFT, damping=1.0),
                    backend="xla", integrator="leapfrog", seed=3)
    L0 = _angular_momentum(bs.positions, bs.velocities)
    bs.update_many(100, 1e-3)
    L1 = _angular_momentum(bs.positions, bs.velocities)
    scale = np.abs(np.cross(bs.positions[:, :3],
                            bs.positions[:, 3:4] * bs.velocities[:, :3])).sum()
    assert np.abs(L1 - L0).max() / scale < 1e-5


def test_leapfrog_time_reversible():
    """The symplectic DKD step is time-reversible: integrate forward k
    steps, flip velocities, integrate k more, flip back -> the initial
    state, up to fp32 roundoff. Euler is NOT reversible (the velocity
    update uses the new acceleration asymmetrically) — this pins the
    structural property that distinguishes the integrators."""
    from nbody_tpu.models.body_system import BodySystem
    from nbody_tpu.params import NBodyParams

    P = NBodyParams(softening=SOFT, damping=1.0)
    bs = BodySystem(256, P, backend="xla", integrator="leapfrog", seed=4)
    p0, v0 = bs.positions.copy(), bs.velocities.copy()
    bs.update_many(20, 1e-3)
    vel = bs.velocities.copy()
    vel[:, :3] *= -1.0
    bs.set_velocities(vel)
    bs.update_many(20, 1e-3)
    scale = np.abs(p0[:, :3]).max()
    assert np.abs(bs.positions[:, :3] - p0[:, :3]).max() / scale < 1e-5
    assert np.abs(bs.velocities[:, :3] + v0[:, :3]).max() < 1e-4


# ---- Kepler two-body convergence orders ----
#
# Two equal masses on a mutual circular orbit have an ANALYTIC solution even
# with Plummer softening: accel magnitude = m_other * r / (r^2+eps^2)^(3/2),
# so with total mass 1 and separation 1 the angular rate is
# omega = (1 + eps^2)^(-3/4). Measuring max position error at fixed total
# time for halving dt pins each integrator's global convergence order —
# euler (semi-implicit) 1st, leapfrog (DKD) 2nd, hermite (P(EC)) 4th.
# Calibrated in f64: measured orders 0.99 / 2.00 / 3.90-3.95.


_KEPLER_EPS = 1e-3
_KEPLER_OMEGA = (1.0 + _KEPLER_EPS**2) ** -0.75


def _kepler_init():
    pos = np.zeros((2, 4), np.float64)
    vel = np.zeros((2, 4), np.float64)
    pos[0, 0], pos[1, 0] = 0.5, -0.5
    pos[:, 3] = 0.5
    vy = _KEPLER_OMEGA * 0.5
    vel[0, 1], vel[1, 1] = vy, -vy
    return pos, vel


def _kepler_error(step_fn, dt, total_time):
    pos, vel = _kepler_init()
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    n = int(round(total_time / dt))
    for _ in range(n):
        p, v = step_fn(p, v, dt, _KEPLER_EPS, 1.0)
    t = n * dt
    c, s = np.cos(_KEPLER_OMEGA * t), np.sin(_KEPLER_OMEGA * t)
    exact = np.array([[0.5 * c, 0.5 * s, 0.0], [-0.5 * c, -0.5 * s, 0.0]])
    return float(np.abs(np.asarray(p)[:, :3] - exact).max())


@pytest.mark.parametrize(
    "integrator,dts,lo,hi",
    [
        ("euler", (0.04, 0.02, 0.01), 0.7, 1.3),
        ("leapfrog", (0.04, 0.02, 0.01), 1.7, 2.3),
        ("hermite", (0.2, 0.1, 0.05), 3.4, 4.4),
    ],
)
def test_integrator_convergence_order(integrator, dts, lo, hi):
    import jax

    from nbody_tpu.ops.reference import (
        nbody_step_hermite,
        nbody_step_leapfrog,
    )

    step = {
        "euler": nbody_step_xla,
        "leapfrog": nbody_step_leapfrog,
        "hermite": nbody_step_hermite,
    }[integrator]

    jax.config.update("jax_enable_x64", True)
    try:
        errs = [_kepler_error(step, dt, total_time=2.0) for dt in dts]
    finally:
        jax.config.update("jax_enable_x64", False)
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    for p in orders:
        assert lo <= p <= hi, (integrator, errs, orders)
