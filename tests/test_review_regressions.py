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


def test_leapfrog_compare_uses_matching_oracle():
    from nbody_tpu.compute import Compute

    c = Compute(num_bodies=256, backend="xla", cycle_demo=False,
                integrator="leapfrog", log=lambda *a: None)
    assert c.compare_results() is True
