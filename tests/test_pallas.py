"""Pallas kernel (interpret mode on CPU) vs XLA path and oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.pallas_kernel import (
    compute_accel_pallas,
    nbody_step_pallas,
    nbody_step_pallas_vs,
)
from nbody_tpu.ops.reference import compute_accel_xla_vs, nbody_step_xla
from nbody_tpu.oracle import step_numpy

from conftest import assert_state_close

DT, SOFT, DAMP = 0.001, 0.1, 1.0
TI, TJ = 64, 256  # small tiles so interpret mode stays fast


def test_pallas_step_matches_xla(random_state_tiny):
    pos, vel = random_state_tiny
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    p1, v1 = nbody_step_pallas(p, v, DT, SOFT, DAMP, tile_i=TI, tile_j=TJ, interpret=True)
    p2, v2 = nbody_step_xla(p, v, DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_pallas_step_matches_oracle(random_state_tiny):
    pos, vel = random_state_tiny
    p1, v1 = nbody_step_pallas(
        jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
        tile_i=TI, tile_j=TJ, interpret=True,
    )
    ref_pos, ref_vel = step_numpy(pos, vel, DT, SOFT, DAMP)
    assert_state_close(p1, ref_pos)  # the reference's 5e-4 criterion
    assert_state_close(v1, ref_vel)


def test_pallas_nondivisible_n_padding(random_state_tiny):
    """N not a multiple of the tiles: zero-mass padding must not change
    results for the real bodies."""
    pos, vel = random_state_tiny
    pos, vel = pos[:333], vel[:333]
    p1, v1 = nbody_step_pallas(
        jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
        tile_i=TI, tile_j=TJ, interpret=True,
    )
    assert p1.shape == (333, 4)
    p2, v2 = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_pallas_vs_asymmetric_sets(random_state_tiny):
    """i-set vs j-set form: forces on a 128-body subset due to all bodies."""
    pos, vel = random_state_tiny
    pos_i, vel_i = jnp.asarray(pos[:128]), jnp.asarray(vel[:128])
    pos_j = jnp.asarray(pos)
    p1, v1 = nbody_step_pallas_vs(
        pos_i, vel_i, pos_j, DT, SOFT, DAMP, tile_i=TI, tile_j=TJ, interpret=True
    )
    acc = compute_accel_xla_vs(pos_i, pos_j, SOFT)
    v_ref = (vel_i[:, :3] + acc * DT) * DAMP
    p_ref = pos_i[:, :3] + v_ref * DT
    np.testing.assert_allclose(np.asarray(p1)[:, :3], np.asarray(p_ref), atol=1e-6)


def test_accel_kernel_matches_xla(random_state_tiny):
    pos, _ = random_state_tiny
    a1 = compute_accel_pallas(
        jnp.asarray(pos[:128]), jnp.asarray(pos), SOFT,
        tile_i=TI, tile_j=TJ, interpret=True,
    )
    a2 = compute_accel_xla_vs(jnp.asarray(pos[:128]), jnp.asarray(pos), SOFT)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-4)


def test_mxu_variant_matches_oracle(random_state_tiny):
    """MXU-hybrid kernel: reduction on the matrix unit, same physics."""
    pos, vel = random_state_tiny
    ref_pos, ref_vel = step_numpy(pos, vel, DT, SOFT, DAMP)
    p1, v1 = nbody_step_pallas(
        jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
        tile_i=TI, tile_j=TJ, interpret=True, variant="mxu",
    )
    assert_state_close(p1, ref_pos)
    assert_state_close(v1, ref_vel)


def test_mxu_bf16_variant_passes_qa(random_state_tiny):
    """bf16 reduction: lower precision but must stay within the reference's
    5e-4 position QA tolerance after one dt=0.001 step."""
    pos, vel = random_state_tiny
    ref_pos, _ = step_numpy(pos, vel, DT, SOFT, DAMP)
    p1, _ = nbody_step_pallas(
        jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
        tile_i=TI, tile_j=TJ, interpret=True, variant="mxu_bf16",
    )
    assert_state_close(p1, ref_pos)


def test_mxu_variant_zero_mass_padding(random_state_tiny):
    """mass folded into the j-matrix: padded zero-mass bodies contribute 0."""
    pos, vel = random_state_tiny
    pos, vel = pos[:300], vel[:300]
    p1, v1 = nbody_step_pallas(
        jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
        tile_i=TI, tile_j=TJ, interpret=True, variant="mxu",
    )
    p2, v2 = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_unknown_variant_raises(random_state_tiny):
    pos, vel = random_state_tiny
    with pytest.raises(ValueError, match="variant"):
        nbody_step_pallas(
            jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
            tile_i=TI, tile_j=TJ, interpret=True, variant="tensor-core",
        )


def test_bad_tile_sizes_raise(random_state_tiny):
    pos, vel = random_state_tiny
    with pytest.raises(ValueError):
        nbody_step_pallas(
            jnp.asarray(pos), jnp.asarray(vel), DT, SOFT, DAMP,
            tile_i=100, tile_j=TJ, interpret=True,
        )


@pytest.mark.slow
def test_lane_chunk_variants_match(shell_state_small):
    """lane_chunk widens the unrolled j-slices without changing results
    (256/512 measured SLOWER on-chip — vreg pressure — but must stay
    correct; scripts/tpu_r3_sweep.py)."""
    pos, vel = shell_state_small
    pos, vel = pos[:1024], vel[:1024]
    ref = nbody_step_pallas(jnp.asarray(pos), jnp.asarray(vel), 0.016, 0.1,
                            1.0, tile_i=64, tile_j=1024, interpret=True)
    for lc in (256, 512):
        got = nbody_step_pallas(jnp.asarray(pos), jnp.asarray(vel), 0.016,
                                0.1, 1.0, tile_i=64, tile_j=1024,
                                lane_chunk=lc, interpret=True)
        # a (ti, lane_chunk) accumulator reassociates the j-sum — ulp-level
        # differences are expected, not bugs
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-6, atol=1e-6)
    # a clamped tile_j that no longer divides a wide lane_chunk falls back
    small = nbody_step_pallas(jnp.asarray(pos[:256]), jnp.asarray(vel[:256]),
                              0.016, 0.1, 1.0, tile_i=64, tile_j=1024,
                              lane_chunk=512, interpret=True)
    assert np.isfinite(np.asarray(small[0])).all()


def test_rollout_kernel_matches_stepped(shell_state_small):
    """nbody_rollout_pallas (transposed-carry scan; a measured-SLOWER
    variant kept for the record — ARCHITECTURE.md) must equal repeated
    single steps bit-for-bit."""
    from nbody_tpu.ops.pallas_kernel import nbody_rollout_pallas

    pos, vel = shell_state_small
    pos, vel = pos[:1000], vel[:1000]
    rp, rv = jnp.asarray(pos), jnp.asarray(vel)
    for _ in range(4):
        rp, rv = nbody_step_pallas(rp, rv, 0.016, 0.1, 1.0, tile_i=64,
                                   tile_j=256, interpret=True)
    gp, gv = nbody_rollout_pallas(jnp.asarray(pos), jnp.asarray(vel), 0.016,
                                  0.1, 1.0, steps=4, tile_i=64, tile_j=256,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
