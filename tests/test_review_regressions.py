"""Regression tests for code-review findings (round 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.models import BodySystem
from nbody_tpu.params import NBodyParams


def test_precision_switch_preserves_integrator_and_backend():
    jax.config.update("jax_enable_x64", True)
    try:
        s = BodySystem(128, NBodyParams(), backend="xla",
                       integrator="leapfrog", seed=0)
        s64 = s.switch_precision()
        assert s64.integrator == "leapfrog"
        s32 = s64.switch_precision()
        assert s32.integrator == "leapfrog"
        # the originally requested backend is re-resolved, not frozen at the
        # fp64 system's "xla"
        assert s32._requested_backend == "xla"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_precision_round_trip_restores_pallas_backend():
    """fp32(pallas) -> fp64(xla hop) -> fp32 must come back to the Pallas
    kernel, not stay latched on the hop's 'xla' (advisor finding r1)."""
    jax.config.update("jax_enable_x64", True)
    try:
        s = BodySystem(128, NBodyParams(), backend="pallas", seed=0,
                       tile_i=8, tile_j=128)
        assert s.backend == "pallas"
        s64 = s.switch_precision()
        assert s64.backend == "xla" and s64.dtype == jnp.float64
        # the user's original request survives the forced-xla hop
        assert s64._requested_backend == "pallas"
        s32 = s64.switch_precision()
        assert s32.backend == "pallas" and s32.dtype == jnp.float32
        # interpret re-resolves for the current platform (True on CPU)
        assert s32.interpret == s.interpret
        s32.update()  # and the restored kernel actually runs
        assert np.isfinite(s32.positions).all()
    finally:
        jax.config.update("jax_enable_x64", False)


def test_checkpoint_bare_path_roundtrip(tmp_path):
    from nbody_tpu.io import load_checkpoint, save_checkpoint

    path = tmp_path / "state"  # no .npz suffix
    pos = np.zeros((8, 4), np.float32)
    vel = np.zeros((8, 4), np.float32)
    save_checkpoint(path, pos, vel, NBodyParams())
    rpos, _, _, _ = load_checkpoint(path)  # must load under the SAME name
    assert rpos.shape == (8, 4)


def test_checkpoint_resume_restores_params(tmp_path, capsys):
    from nbody_tpu.cli import main

    ck = tmp_path / "s.npz"
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--set", "time_step=0.0006,softening_factor=1.0",
               "--checkpoint-save", str(ck)])
    assert rc == 0
    rc = main(["--frames", "1", "--kernel", "xla", "--no-cycle",
               "--checkpoint-load", str(ck), "--print-params"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "0.0006" in out and "1.0" in out  # resumed with the saved params


def test_prime_n_chunked_accel_fast_and_correct():
    from nbody_tpu.ops.reference import compute_accel_xla
    from nbody_tpu.oracle.numpy_oracle import accel_numpy

    n = 1009  # prime: the old divisor-hunting chunker degenerated to chunk=1
    pos, _ = ic.generate(NBodyConfig.RANDOM, n, 1.5, 2.0, seed=0)
    acc = np.asarray(compute_accel_xla(jnp.asarray(pos), 0.1, chunk_size=256))
    ref = accel_numpy(pos, 0.1)
    np.testing.assert_allclose(acc, ref, rtol=2e-4, atol=2e-4)


def test_prime_n_potential_energy():
    from nbody_tpu.ops.energy import potential_energy

    pos, _ = ic.generate(NBodyConfig.RANDOM, 521, 1.5, 2.0, seed=1)
    dense = float(potential_energy(jnp.asarray(pos), 0.1, chunk_size=None))
    chunked = float(potential_energy(jnp.asarray(pos), 0.1, chunk_size=128))
    assert abs(dense - chunked) / abs(dense) < 1e-5


def test_points_mode_bodies_never_vanish():
    """Bodies at any subpixel phase must light exactly one pixel in points
    mode (the old half-integer sampling zeroed ~all weights)."""
    from nbody_tpu.render import DisplayMode, FrameRenderer
    from nbody_tpu.render.camera import Camera

    n = 64
    rng = np.random.default_rng(0)
    pos = np.zeros((n, 4), np.float32)
    pos[:, :2] = rng.uniform(-3, 3, (n, 2))  # arbitrary subpixel phases
    pos[:, 3] = 1.0
    cam = Camera(origin=(0.0, 0.0, -20.0))
    r = FrameRenderer(width=128, height=128)
    frame = r.render(pos, cam, mode=DisplayMode.POINTS)
    lit = (frame.max(axis=2) > 200).sum()
    assert lit >= n * 0.8, f"only {lit} bright pixels for {n} points"


def test_steps_per_frame_perf_stats(capsys):
    from nbody_tpu.compute import Compute

    c = Compute(num_bodies=128, backend="xla", cycle_demo=False,
                log=lambda *a: None)
    c.calculate_fps(10, 1000.0, steps_per_frame=8)
    assert c.fps == 10.0
    # interactions/s uses steps/sec = fps * steps_per_frame
    assert abs(c.interactions_per_second - 128 * 128 * 1e-9 * 80) < 1e-12


def test_demo_out_of_range_exits_2():
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--demo", "9"])
    assert rc == 2


def test_explicit_tiles_override_tune_cache(monkeypatch):
    """--blockSize/--tile-j given explicitly must beat a variant=auto cache
    hit (judge finding r1: the cache silently overwrote user tiles)."""
    import warnings

    import nbody_tpu.tune as tune
    from nbody_tpu.models import body_system as bs_mod

    monkeypatch.setattr(bs_mod, "_default_backend_is_tpu", lambda: True)
    monkeypatch.setattr(tune, "best_config",
                        lambda n, family="euler": {"variant": "mxu_bf16",
                                                   "tile_i": 1024,
                                                   "tile_j": 8192})
    # no explicit tiles: the cached winner applies in full
    s = BodySystem(4096, NBodyParams(), backend="pallas", variant="auto",
                   interpret=True)
    assert (s.variant, s.tile_i, s.tile_j) == ("mxu_bf16", 1024, 8192)
    # explicit tile_i: honored (tile_j stays cache-tuned), with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s = BodySystem(4096, NBodyParams(), backend="pallas", variant="auto",
                       tile_i=512, interpret=True)
    assert s.tile_i == 512 and s.tile_j == 8192
    assert any("override the autotuner cache" in str(x.message) for x in w)


def test_drift_check_pass_exits_0():
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "128", "--kernel", "xla", "--drift-check", "2"])
    assert rc == 0


def test_drift_check_failure_exits_1(monkeypatch):
    """--drift-check must feed the exit-code ladder (advisor finding r1)."""
    from nbody_tpu import compute as compute_mod
    from nbody_tpu.cli import main

    monkeypatch.setattr(
        compute_mod.Compute, "drift_check",
        lambda self, steps: {"steps": steps, "drift_device": 1.0,
                             "drift_oracle": 0.0, "delta": 1.0},
    )
    rc = main(["--numbodies", "128", "--kernel", "xla", "--drift-check", "2"])
    assert rc == 1


def test_fp32_step_unchanged_by_x64_enable():
    """--interactive enables x64 at start for the runtime precision toggle;
    the fp32 path must be bit-stable under it (no incidental f64 promotion)."""
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.reference import nbody_step_xla

    pos, vel = ic.generate(NBodyConfig.SHELL, 128, 1.5, 2.0, seed=5)
    p, v = jnp.asarray(pos), jnp.asarray(vel)
    ref_x = np.asarray(nbody_step_xla(p, v, 0.001, 0.1, 1.0)[0])
    ref_p = np.asarray(nbody_step_pallas(p, v, 0.001, 0.1, 1.0, tile_i=8,
                                         tile_j=128, interpret=True)[0])
    jax.config.update("jax_enable_x64", True)
    try:
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        out_x = nbody_step_xla(p, v, 0.001, 0.1, 1.0)[0]
        out_p = nbody_step_pallas(p, v, 0.001, 0.1, 1.0, tile_i=8,
                                  tile_j=128, interpret=True)[0]
        assert out_x.dtype == jnp.float32 and out_p.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out_x), ref_x)
        np.testing.assert_array_equal(np.asarray(out_p), ref_p)
        # the remaining kernel entry points also stay f32 under x64
        from nbody_tpu.ops.pallas_kernel import (
            compute_accel_pallas, potential_energy_pallas)

        acc = compute_accel_pallas(p, p, 0.1, tile_i=8, tile_j=128,
                                   interpret=True)
        assert acc.dtype == jnp.float32
        pe = potential_energy_pallas(p, 0.1, tile_i=8, tile_j=128,
                                     interpret=True)
        assert pe.dtype == jnp.float32
    finally:
        jax.config.update("jax_enable_x64", False)


def test_leapfrog_compare_uses_matching_oracle():
    from nbody_tpu.compute import Compute

    c = Compute(num_bodies=256, backend="xla", cycle_demo=False,
                integrator="leapfrog", log=lambda *a: None)
    assert c.compare_results() is True


def _scan_lengths_with_ppermute(jaxpr):
    """All lax.scan lengths whose body issues a ppermute, recursively."""
    found = []

    def walk(jx):
        for eqn in jx.eqns:
            # params may hold jaxpr-likes directly OR inside tuples/lists
            # (e.g. cond's 'branches') — walk both so a scan nested in a
            # future cond cannot slip past the assertion (advisor r4)
            flat = []
            for v in eqn.params.values():
                flat.extend(v if isinstance(v, (tuple, list)) else (v,))
            sub = [v for v in flat
                   if hasattr(v, "jaxpr") or hasattr(v, "eqns")]
            if eqn.primitive.name == "scan":
                body = eqn.params["jaxpr"].jaxpr
                if any(e.primitive.name == "ppermute" for e in body.eqns):
                    found.append(eqn.params["length"])
            for v in sub:
                walk(v.jaxpr if hasattr(v, "jaxpr") else v)

    walk(jaxpr)
    return found


def test_ring_issues_ndev_minus_one_ppermutes():
    """The ring strategies rotate hop 0 outside the scan: D-1 ppermutes
    per force round, not D (a rotate after the final kernel is a dead
    collective XLA cannot DCE inside a scan body) — fp32 and ds."""
    import jax

    from nbody_tpu.ops.ds_kernel import _scal_ds, ds_from_f64
    from nbody_tpu.parallel import (
        make_mesh,
        make_sharded_ds_step,
        make_sharded_step,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)

    pos = np.random.default_rng(3).standard_normal((64, 4)).astype("f4")
    vel = np.zeros((64, 4), "f4")
    step = make_sharded_step(mesh, strategy="ring", kernel="xla")
    jx = jax.make_jaxpr(lambda p, v: step(p, v, 0.001, 0.1, 1.0))(
        jnp.asarray(pos), jnp.asarray(vel))
    lens = _scan_lengths_with_ppermute(jx.jaxpr)
    assert lens and all(ln == 7 for ln in lens), lens

    ph, plo = ds_from_f64(pos.astype("f8"))
    vh, vlo = ds_from_f64(vel.astype("f8"))
    scal = _scal_ds(0.001, 0.1, 1.0)
    dstep = make_sharded_ds_step(mesh, strategy="ring", tile_j=512,
                                 interpret=True)
    jx = jax.make_jaxpr(dstep)(ph, plo, vh, vlo, scal)
    lens = _scan_lengths_with_ppermute(jx.jaxpr)
    assert lens and all(ln == 7 for ln in lens), lens


def test_ds_system_ignores_strategy_without_mesh():
    """Single-device DSBodySystem coerces ANY strategy to 'allgather'
    (the BodySystem convention: --strategy is a mesh knob and fp32
    single-device ignores it too); invalid strategies still raise on a
    mesh."""
    import jax
    import pytest

    from nbody_tpu.models.ds_system import DSBodySystem

    s = DSBodySystem(128, NBodyParams(), strategy="sym", interpret=True)
    assert s.strategy == "allgather"

    if len(jax.devices()) >= 8:
        from nbody_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="strategy"):
            DSBodySystem(128, NBodyParams(), mesh=make_mesh(8),
                         strategy="sym", interpret=True)


def test_explicit_wide_tile_keeps_full_sym_cap(monkeypatch):
    """An explicit tile_j too wide for the half-cap blocked composition
    keeps the FULL triangle cap (the blocked path silently clamps its
    j-stream to <= cap/2, which would reshape an explicitly requested
    tile — advisor r4): the dispatch falls back to the single triangle,
    where user tiles are honored as given."""
    import nbody_tpu.ops.symmetric_kernel as symk
    from nbody_tpu.models.body_system import BodySystem

    monkeypatch.setattr(symk, "SYM_MAX_N", 512)
    monkeypatch.setattr(symk, "DEFAULT_TILE_J_SYM", 128)

    # default tiles in the half-cap window: the blocked composition
    bs = BodySystem(384, NBodyParams(), backend="pallas", variant="sym",
                    interpret=True, seed=1)
    cap, _ = bs._sym_dispatch()
    assert cap == 256

    # explicit tile_j wider than cap/2: full triangle cap instead
    bs = BodySystem(384, NBodyParams(), backend="pallas", variant="sym",
                    interpret=True, seed=1, tile_j=256)
    cap, _ = bs._sym_dispatch()
    assert cap == 512
