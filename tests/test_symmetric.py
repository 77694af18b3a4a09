"""Newton's-third-law (symmetric) kernel tests — interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.reference import compute_accel_xla, nbody_step_xla
from nbody_tpu.ops.symmetric_kernel import (
    SYM_MAX_N,
    compute_accel_symmetric,
    nbody_step_symmetric,
)

from conftest import assert_state_close

SOFT = 0.1


@pytest.mark.parametrize("n", [
    # 128 + the non-multiple 1000 are the fast-tier shapes (r5 re-tier)
    128, pytest.param(384, marks=pytest.mark.slow), 1000])
@pytest.mark.parametrize("ti,tj", [(64, 256), (128, 256), (32, 128)])
def test_accel_matches_xla(n, ti, tj):
    pos, _ = ic.generate(NBodyConfig.SHELL, n, 1.52, 2.0, seed=1)
    p = jnp.asarray(pos)
    ref = np.asarray(compute_accel_xla(p, SOFT))
    got = np.asarray(compute_accel_symmetric(p, SOFT, tile_i=ti, tile_j=tj,
                                             interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_step_matches_xla_qa_criterion():
    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=2)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    p1, v1 = nbody_step_symmetric(p, v, 0.001, SOFT, 1.0, tile_j=256,
                                  interpret=True)
    p2, v2 = nbody_step_xla(p, v, 0.001, SOFT, 1.0)
    assert_state_close(p1, p2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_zero_mass_padding_inert():
    """Zero-mass bodies neither exert force (as j OR via the reaction as i)
    nor break real bodies' sums — the pad-to-tile contract."""
    pos, _ = ic.generate(NBodyConfig.SHELL, 256, 1.5, 2.0, seed=3)
    p = jnp.asarray(pos)
    padded = np.concatenate(
        [pos, np.zeros((64, 4), np.float32)], axis=0)
    a_ref = np.asarray(compute_accel_symmetric(p, SOFT, tile_j=128,
                                               interpret=True))
    a_pad = np.asarray(compute_accel_symmetric(jnp.asarray(padded), SOFT,
                                               tile_j=128, interpret=True))
    np.testing.assert_allclose(a_pad[:256], a_ref, atol=1e-6)


def test_momentum_exact_by_construction():
    """Each pair contributes ±m_i m_j/r³·d ONCE: with unit masses the
    kernel's total momentum change is antisymmetric to fp rounding."""
    pos, _ = ic.generate(NBodyConfig.RANDOM, 384, 1.5, 8.0, seed=4)
    acc = np.asarray(compute_accel_symmetric(jnp.asarray(pos), SOFT,
                                             tile_j=128, interpret=True))
    net = (pos[:, 3:4] * acc).sum(axis=0)
    scale = np.abs(pos[:, 3:4] * acc).sum()
    assert np.abs(net).max() / scale < 1e-6


def test_n_cap_and_tile_validation():
    big = jnp.zeros((SYM_MAX_N + 64, 4), jnp.float32)
    with pytest.raises(ValueError, match="blocked"):
        compute_accel_symmetric(big, SOFT, interpret=True)
    pos = jnp.zeros((256, 4), jnp.float32)
    with pytest.raises(ValueError, match="multiple of"):
        compute_accel_symmetric(pos, SOFT, tile_i=60, interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        compute_accel_symmetric(pos, SOFT, tile_i=64, tile_j=160,
                                interpret=True)
    with pytest.raises(ValueError, match="multiple of tile_i"):
        compute_accel_symmetric(pos, SOFT, tile_i=24, tile_j=128,
                                interpret=True)


def test_fp64_rejected():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        pos = jnp.zeros((128, 4), jnp.float64)
        with pytest.raises(TypeError, match="float32"):
            compute_accel_symmetric(pos, SOFT, interpret=True)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_body_system_sym_variant():
    """variant='sym' through BodySystem matches the xla backend."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(256, params, backend="pallas", variant="sym",
                   interpret=True, seed=9, tile_j=128)
    b = BodySystem(256, params, backend="xla", seed=9)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)

    # leapfrog uses the symmetric accel closure
    al = BodySystem(256, params, backend="pallas", variant="sym",
                    interpret=True, seed=9, tile_j=128,
                    integrator="leapfrog")
    bl = BodySystem(256, params, backend="xla", seed=9,
                    integrator="leapfrog")
    al.update(0.01)
    bl.update(0.01)
    np.testing.assert_allclose(al.positions, bl.positions, atol=1e-5)


def test_body_system_sym_variant_gates():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops.symmetric_kernel import AJ_SYM_MAX_N
    from nbody_tpu.params import NBodyParams

    # sym is no longer N-capped for ANY integrator: above the per-kernel
    # scratch caps the step routes through the blocked compositions
    # (construction must succeed)
    s = BodySystem(SYM_MAX_N + 64, NBodyParams(), backend="pallas",
                   variant="sym", interpret=True)
    assert s.variant == "sym"
    h = BodySystem(AJ_SYM_MAX_N + 64, NBodyParams(), backend="pallas",
                   variant="sym", interpret=True, integrator="hermite")
    assert h.variant == "sym"
    # the mesh gate still applies
    with pytest.raises(ValueError, match="single-device"):
        import jax

        from nbody_tpu.parallel import make_mesh

        if len(jax.devices()) < 2:
            raise ValueError("single-device")  # pragma: no cover
        BodySystem(512, NBodyParams(), backend="pallas", variant="sym",
                   mesh=make_mesh(2), interpret=True)


def test_body_system_sym_hermite():
    """hermite + variant='sym' (the symmetric accel+jerk) matches xla."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=SOFT, damping=0.999)
    a = BodySystem(256, params, backend="pallas", variant="sym",
                   interpret=True, seed=9, tile_j=128,
                   integrator="hermite")
    b = BodySystem(256, params, backend="xla", seed=9,
                   integrator="hermite")
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)


def test_auto_falls_back_when_cached_sym_inapplicable(monkeypatch, tmp_path):
    """A tune-cache sym winner must not leak into shapes sym can't run
    (meshes) — auto falls back instead of crashing. Hermite above
    AJ_SYM_MAX_N is no longer inapplicable: the blocked accel+jerk
    composition covers it, so auto keeps the sym winner there."""
    import jax

    from nbody_tpu.models import BodySystem
    from nbody_tpu.models import body_system as bs_mod
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(bs_mod, "_default_backend_is_tpu", lambda: True)
    import nbody_tpu.tune as tune

    monkeypatch.setattr(
        tune, "best_config",
        lambda n, family="euler": {"variant": "sym", "tile_i": 64,
                                   "tile_j": 4096})

    from nbody_tpu.ops.symmetric_kernel import AJ_SYM_MAX_N

    s = BodySystem(AJ_SYM_MAX_N + 64, NBodyParams(), backend="pallas",
                   variant="auto", integrator="hermite", interpret=True)
    assert s.variant == "sym"

    if len(jax.devices()) >= 8:
        from nbody_tpu.parallel import make_mesh

        m = BodySystem(512, NBodyParams(), backend="pallas", variant="auto",
                       mesh=make_mesh(8), strategy="allgather",
                       interpret=True)
        assert m.variant == "vpu"


def test_precision_round_trip_restores_sym(monkeypatch):
    """fp32(sym) -> fp64 must hop to the XLA path (sym is pallas-only),
    and the round trip back must restore the sym variant. On-chip the
    same path also exercises the kernel's x64-proof index maps (python-int
    block indices trace as i64 under jax_enable_x64 — the _ix lesson)."""
    import jax

    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    jax.config.update("jax_enable_x64", True)
    try:
        s = BodySystem(256, NBodyParams(), backend="pallas", variant="sym",
                       interpret=True, tile_j=128)
        s64 = s.switch_precision()
        assert s64.backend == "xla" and s64.variant != "sym"
        s32 = s64.switch_precision()
        assert s32.backend == "pallas" and s32.variant == "sym"
        s32.update(0.001)  # compiles+runs the sym kernel under x64
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_blocked_matches_xla_and_cross_momentum():
    """The blockwise composition (self triangles + cross rectangles) must
    match the XLA reference, with blocking forced at small N via
    block_cap; k=2,3,4 cover one-cross, multi-cross, and remainder-pad
    shapes."""
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_symmetric_blocked,
        sym_blocking,
    )

    pos, _ = ic.generate(NBodyConfig.SHELL, 1000, 1.52, 2.0, seed=5)
    p = jnp.asarray(pos)
    ref = np.asarray(compute_accel_xla(p, SOFT))
    scale = np.abs(ref).max()
    for cap, tj in ((512, 256), (384, 128), (256, 128)):
        k, blk = sym_blocking(1000, tj, cap)
        assert k >= 2 and blk <= max(cap, tj)
        got = np.asarray(compute_accel_symmetric_blocked(
            p, SOFT, tile_i=64, tile_j=tj, interpret=True, block_cap=cap))
        assert np.abs(got - ref).max() / scale < 1e-5, (cap, tj)

    # momentum antisymmetry survives the composition (pairs still counted
    # once, whether in a self triangle or a cross rectangle)
    acc = np.asarray(compute_accel_symmetric_blocked(
        p, SOFT, tile_i=64, tile_j=128, interpret=True, block_cap=384))
    net = (pos[:, 3:4] * acc).sum(axis=0)
    assert np.abs(net).max() / np.abs(pos[:, 3:4] * acc).sum() < 1e-6


def test_blocked_delegates_below_cap():
    """N <= block_cap is bit-identical to the single-triangle kernel."""
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_symmetric_blocked,
    )

    pos, _ = ic.generate(NBodyConfig.SHELL, 512, 1.52, 2.0, seed=6)
    p = jnp.asarray(pos)
    a = np.asarray(compute_accel_symmetric(p, SOFT, tile_j=256,
                                           interpret=True))
    b = np.asarray(compute_accel_symmetric_blocked(
        p, SOFT, tile_j=256, interpret=True, block_cap=4096))
    assert np.array_equal(a, b)


def test_blocked_step_matches_xla_qa_criterion():
    from nbody_tpu.ops.symmetric_kernel import nbody_step_symmetric_blocked

    pos, vel = ic.generate(NBodyConfig.RANDOM, 640, 1.54, 8.0, seed=7)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    p1, v1 = nbody_step_symmetric_blocked(p, v, 0.001, SOFT, 1.0,
                                          tile_j=128, interpret=True,
                                          block_cap=256)
    p2, v2 = nbody_step_xla(p, v, 0.001, SOFT, 1.0)
    assert_state_close(p1, p2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_body_system_sym_blocked_above_cap(monkeypatch):
    """variant='sym' above SYM_MAX_N routes through the blocked
    composition (cap monkeypatched small so interpret mode is feasible)
    and matches the xla backend — euler AND the leapfrog accel closure."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops import symmetric_kernel as symk
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(symk, "SYM_MAX_N", 256)
    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(640, params, backend="pallas", variant="sym",
                   interpret=True, seed=11, tile_j=128)
    b = BodySystem(640, params, backend="xla", seed=11)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)

    al = BodySystem(640, params, backend="pallas", variant="sym",
                    interpret=True, seed=11, tile_j=128,
                    integrator="leapfrog")
    bl = BodySystem(640, params, backend="xla", seed=11,
                    integrator="leapfrog")
    al.update(0.01)
    bl.update(0.01)
    np.testing.assert_allclose(al.positions, bl.positions, atol=1e-5)


@pytest.mark.slow
def test_aj_blocked_matches_xla_and_momentum():
    """The blocked accel+jerk composition (self triangles + cross
    rectangles with 6 reaction scratches) matches the XLA reference for
    BOTH outputs; k=2,3,4 cover one-cross, multi-cross, remainder-pad."""
    from nbody_tpu.ops.reference import compute_accel_jerk_xla
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_jerk_symmetric_blocked,
        sym_blocking,
    )

    pos, vel = ic.generate(NBodyConfig.RANDOM, 1000, 1.54, 8.0, seed=5)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    ra, rj = compute_accel_jerk_xla(p, v, SOFT)
    ra, rj = np.asarray(ra), np.asarray(rj)
    for cap, tj in ((512, 256), (384, 128), (256, 128)):
        k, blk = sym_blocking(1000, tj, cap)
        assert k >= 2
        ga, gj = compute_accel_jerk_symmetric_blocked(
            p, v, SOFT, tile_i=64, tile_j=tj, interpret=True, block_cap=cap)
        ga, gj = np.asarray(ga), np.asarray(gj)
        assert np.abs(ga - ra).max() / np.abs(ra).max() < 1e-5, (cap, tj)
        assert np.abs(gj - rj).max() / np.abs(rj).max() < 1e-5, (cap, tj)

    # each pair counted once whether in a self triangle or a cross
    # rectangle: momentum AND its derivative (sum m_i * jerk_i) are
    # antisymmetric to fp rounding
    ga, gj = compute_accel_jerk_symmetric_blocked(
        p, v, SOFT, tile_i=64, tile_j=128, interpret=True, block_cap=384)
    for field in (np.asarray(ga), np.asarray(gj)):
        net = (pos[:, 3:4] * field).sum(axis=0)
        assert np.abs(net).max() / np.abs(pos[:, 3:4] * field).sum() < 1e-6


@pytest.mark.slow
def test_aj_blocked_delegates_below_cap():
    """N <= block_cap is bit-identical to the single-triangle aj kernel."""
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_jerk_symmetric,
        compute_accel_jerk_symmetric_blocked,
    )

    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=6)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    a1, j1 = compute_accel_jerk_symmetric(p, v, SOFT, tile_j=256,
                                          interpret=True)
    a2, j2 = compute_accel_jerk_symmetric_blocked(
        p, v, SOFT, tile_j=256, interpret=True, block_cap=4096)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(j1), np.asarray(j2))


def test_body_system_sym_hermite_blocked_above_cap(monkeypatch):
    """hermite + variant='sym' above AJ_SYM_MAX_N routes through the
    blocked accel+jerk composition (cap monkeypatched small so interpret
    mode is feasible) and matches the xla backend."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops import symmetric_kernel as symk
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(symk, "AJ_SYM_MAX_N", 256)
    params = NBodyParams(softening=SOFT, damping=0.999)
    a = BodySystem(640, params, backend="pallas", variant="sym",
                   interpret=True, seed=13, tile_j=128,
                   integrator="hermite")
    b = BodySystem(640, params, backend="xla", seed=13,
                   integrator="hermite")
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)


def test_blocked_clamps_block_wide_stream():
    """tile_j wider than half the block is clamped to a dividing tile (a
    LARGE block-wide j-stream compiles to a single-grid-step cross kernel
    that overflows Mosaic's scoped-vmem stack — measured on v5e; small
    blocks clamp or pass through instead of failing)."""
    from nbody_tpu.ops.symmetric_kernel import (
        compute_accel_symmetric_blocked,
    )
    from nbody_tpu.ops.reference import compute_accel_xla

    pos, _ = ic.generate(NBodyConfig.SHELL, 512, 1.52, 2.0, seed=8)
    p = jnp.asarray(pos)
    got = np.asarray(compute_accel_symmetric_blocked(
        p, SOFT, tile_i=64, tile_j=256, interpret=True, block_cap=256))
    ref = np.asarray(compute_accel_xla(p, SOFT))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_sym_default_dispatch_policy(monkeypatch):
    """The measured default (block_cap, tile_j) policy: half-cap blocked
    composition in the top of the single-triangle range (the bench-shape
    winner, scripts/tpu_r4_sym_bench_shape.py), full cap elsewhere —
    and the half cap only exists where the default tile fits it."""
    from nbody_tpu.ops import symmetric_kernel as symk
    from nbody_tpu.ops.symmetric_kernel import sym_default_dispatch

    assert sym_default_dispatch(65536) == (32768, 4096)
    assert sym_default_dispatch(40000) == (32768, 4096)
    assert sym_default_dispatch(32768) == (65536, 4096)
    assert sym_default_dispatch(1024) == (65536, 4096)
    assert sym_default_dispatch(131072) == (65536, 8192)

    # shrunken caps (the test idiom) degrade to plain delegation: the
    # default tile does not fit a 128-body half cap
    monkeypatch.setattr(symk, "SYM_MAX_N", 256)
    assert sym_default_dispatch(200) == (256, 4096)
    assert sym_default_dispatch(640) == (256, 8192)


def test_body_system_sym_half_cap_matches_xla(monkeypatch):
    """variant='sym' in the top half of the single-triangle range routes
    through the half-cap blocked composition by default and matches the
    xla backend (caps monkeypatched small; the dispatch guard is widened
    by also shrinking the default tile so the policy engages)."""
    from nbody_tpu.models import BodySystem
    from nbody_tpu.ops import symmetric_kernel as symk
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(symk, "SYM_MAX_N", 512)
    monkeypatch.setattr(symk, "DEFAULT_TILE_J_SYM", 128)
    assert symk.sym_default_dispatch(384) == (256, 128)

    params = NBodyParams(softening=SOFT, damping=1.0)
    a = BodySystem(384, params, backend="pallas", variant="sym",
                   interpret=True, seed=12)
    b = BodySystem(384, params, backend="xla", seed=12)
    a.update(0.01)
    b.update(0.01)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-5)
