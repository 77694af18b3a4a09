"""Sanitizer-equivalent checks (SURVEY §5): NaN guards, interpret mode.

The reference runs an ASan/UBSan CI job; the JAX analogues are
jax_debug_nans (traps NaN production) and Pallas interpret mode (already
exercised throughout the suite as the Mosaic 'racecheck' stand-in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.reference import nbody_step_xla


def test_step_clean_under_debug_nans(random_state_tiny):
    pos, vel = random_state_tiny
    jax.config.update("jax_debug_nans", True)
    try:
        p, v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.001, 0.1, 1.0)
        jax.block_until_ready((p, v))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_zero_softening_self_interaction_nan_detected():
    """softening=0 makes the self-pair 0*inf = NaN — debug_nans must trap it,
    proving the guard actually bites (and documenting why softening>0 is
    required, as in the reference's Plummer model)."""
    pos = np.zeros((8, 4), np.float32)
    pos[:, 3] = 1.0
    vel = np.zeros((8, 4), np.float32)
    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises((FloatingPointError, ZeroDivisionError)):
            p, v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.001, 0.0, 1.0)
            jax.block_until_ready((p, v))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_metrics_jsonl(tmp_path):
    import json

    from nbody_tpu.cli import main

    path = tmp_path / "metrics.jsonl"
    rc = main(["--benchmark", "--numbodies", "256", "-i", "2", "--kernel", "xla",
               "--no-cycle", "--metrics", str(path)])
    assert rc == 0
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines and lines[-1]["num_bodies"] == 256


def test_drift_check_cli(capsys):
    from nbody_tpu.cli import main

    rc = main(["--drift-check", "3", "--numbodies", "256", "--kernel", "xla",
               "--no-cycle"])
    assert rc == 0
    assert "energy drift" in capsys.readouterr().out


def test_slider_keys_via_controls():
    from nbody_tpu.compute import Compute
    from nbody_tpu.ui import Controls

    c = Compute(num_bodies=128, backend="xla", cycle_demo=False, log=lambda *a: None)
    out = []
    ctl = Controls(c, log=out.append)
    ctl.handle("`")  # open panel
    assert ctl.panel is not None
    ctl.handle("j")  # select softening_factor
    before = c.active_params.softening
    ctl.handle("l")  # increase
    assert c.active_params.softening > before
    ctl.handle("h")
    ctl.handle("h")
    assert c.active_params.softening < before
