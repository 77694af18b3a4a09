"""Energy diagnostics: consistency, conservation, fp64 drift vs CPU oracle.

BASELINE config[2]: the fp64 path's energy drift must match the CPU
reference's drift (the integrator is the same damped semi-implicit Euler, so
the comparison is device-vs-oracle, not drift-vs-zero).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.energy import kinetic_energy, potential_energy, total_energy
from nbody_tpu.ops.reference import nbody_step_xla
from nbody_tpu.oracle import step_numpy

SOFT = 0.1


def test_kinetic_energy_formula():
    pos = np.zeros((4, 4), np.float32)
    pos[:, 3] = 2.0  # mass 2
    vel = np.zeros((4, 4), np.float32)
    vel[:, 0] = 3.0  # |v|^2 = 9
    ke = float(kinetic_energy(jnp.asarray(pos), jnp.asarray(vel)))
    assert abs(ke - 0.5 * 2.0 * 9.0 * 4) < 1e-5


def test_potential_energy_two_bodies():
    pos = np.zeros((2, 4), np.float32)
    pos[0, 0], pos[1, 0] = 0.0, 1.0
    pos[:, 3] = 1.0
    pe = float(potential_energy(jnp.asarray(pos), softening=0.0))
    assert abs(pe - (-1.0)) < 1e-6  # -m1*m2/r


def test_potential_pallas_matches_xla(shell_state_small):
    from nbody_tpu.ops.pallas_kernel import potential_energy_pallas

    pos, _ = shell_state_small
    pos = pos[:700]  # non-multiple N exercises the padding + self-mask
    ref = float(potential_energy(jnp.asarray(pos), SOFT))
    got = float(potential_energy_pallas(
        jnp.asarray(pos), SOFT, tile_i=64, tile_j=256, interpret=True
    ))
    assert abs(got - ref) / abs(ref) < 1e-5


def test_body_system_energy_pallas_matches_xla():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=SOFT)
    a = BodySystem(512, params, backend="pallas", tile_i=64, tile_j=128,
                   interpret=True, seed=3)
    b = BodySystem(512, params, backend="xla", seed=3)
    ea, eb = a.total_energy(), b.total_energy()
    assert abs(ea - eb) / abs(eb) < 1e-5


@pytest.mark.slow
def test_potential_chunked_equals_dense(shell_state_small):
    pos, _ = shell_state_small
    dense = float(potential_energy(jnp.asarray(pos), SOFT, chunk_size=None))
    chunked = float(potential_energy(jnp.asarray(pos), SOFT, chunk_size=512))
    assert abs(dense - chunked) / abs(dense) < 1e-5


def test_fp64_energy_conservation_small_dt():
    """Undamped fp64 system with small dt conserves energy to ~1e-6."""
    jax.config.update("jax_enable_x64", True)
    try:
        pos, vel = ic.generate(NBodyConfig.SHELL, 256, 1.52, 2.0, seed=5,
                               dtype=np.float64)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        assert p.dtype == jnp.float64
        e0 = float(total_energy(p, v, SOFT))
        for _ in range(20):
            p, v = nbody_step_xla(p, v, 1e-4, SOFT, 1.0)
        e1 = float(total_energy(p, v, SOFT))
        assert abs((e1 - e0) / e0) < 1e-5
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fp64_drift_matches_oracle():
    """BASELINE config[2] criterion (scaled down for CI): device fp64 drift
    equals the CPU oracle's drift."""
    jax.config.update("jax_enable_x64", True)
    try:
        pos, vel = ic.generate(NBodyConfig.SHELL, 512, 1.52, 2.0, seed=6,
                               dtype=np.float64)
        dt, steps = 0.016, 10
        # device trajectory
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        e0 = float(total_energy(p, v, SOFT))
        for _ in range(steps):
            p, v = nbody_step_xla(p, v, dt, SOFT, 1.0)
        drift_dev = (float(total_energy(p, v, SOFT)) - e0) / abs(e0)
        # oracle trajectory
        op, ov = pos, vel
        for _ in range(steps):
            op, ov = step_numpy(op, ov, dt, SOFT, 1.0)
        e1o = float(total_energy(jnp.asarray(op), jnp.asarray(ov), SOFT))
        drift_ora = (e1o - e0) / abs(e0)
        assert abs(drift_dev - drift_ora) < 1e-9, (
            f"device drift {drift_dev} != oracle drift {drift_ora}"
        )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fp32_drift_close_to_fp64():
    """fp32 energy drift should track the fp64 drift at matching settings
    (the 'fp32 energy drift matching the CPU reference' north star)."""
    jax.config.update("jax_enable_x64", True)
    try:
        pos64, vel64 = ic.generate(NBodyConfig.SHELL, 512, 1.52, 2.0, seed=8,
                                   dtype=np.float64)
        pos32 = pos64.astype(np.float32)
        vel32 = vel64.astype(np.float32)
        dt, steps = 0.016, 10

        def drift(p, v, dtype):
            p, v = jnp.asarray(p), jnp.asarray(v)
            e0 = float(total_energy(p, v, SOFT))
            for _ in range(steps):
                p, v = nbody_step_xla(p, v, dt, SOFT, 1.0)
            return (float(total_energy(p, v, SOFT)) - e0) / abs(e0)

        d64 = drift(pos64, vel64, np.float64)
        d32 = drift(pos32, vel32, np.float32)
        assert abs(d32 - d64) < 5e-4
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_precise_functional_hybrid_matches_full_f64(shell_state_small):
    """The hybrid path (device f32 pair terms + host f64 accumulation) must
    agree with the full host-f64 functional to ~1e-7 relative — the claim
    that makes drift numbers state-dtype invariant (VERDICT r2 item 4)."""
    from nbody_tpu.ops.energy import total_energy_f64, total_energy_precise

    pos, vel = shell_state_small  # fp32 state
    full = total_energy_f64(pos, vel, SOFT)
    hybrid = total_energy_precise(pos, vel, SOFT, host_threshold=0)
    assert abs(hybrid - full) / abs(full) < 1e-6


@pytest.mark.slow
def test_precise_functional_state_dtype_invariant(shell_state_small):
    """Same state in fp32 and fp64 containers -> same precise energy."""
    from nbody_tpu.ops.energy import total_energy_precise

    pos, vel = shell_state_small
    e32 = total_energy_precise(pos.astype(np.float32), vel.astype(np.float32), SOFT)
    e64 = total_energy_precise(pos.astype(np.float64), vel.astype(np.float64), SOFT)
    assert abs(e32 - e64) / abs(e64) < 1e-6


def test_body_system_precise_energy():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops.energy import total_energy_f64
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=SOFT)
    sys_ = BodySystem(512, params, backend="xla", seed=3)
    precise = sys_.total_energy(precise=True)
    ref = total_energy_f64(sys_.positions, sys_.velocities, SOFT)
    assert abs(precise - ref) / abs(ref) < 1e-9
    # the fast f32 path agrees to f32 grade (sanity, not precision, bound)
    fast = sys_.total_energy()
    assert abs(fast - precise) / abs(precise) < 1e-4
