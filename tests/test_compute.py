"""Compute facade tests: benchmark, QA compare, demo cycling, perf stats."""

import numpy as np

from nbody_tpu.compute import Compute
from nbody_tpu.config import NBodyConfig
from nbody_tpu.params import DEMO_PARAMS, tuned_scales


def _compute(n=512, **kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("log", lambda *a: None)
    return Compute(num_bodies=n, **kw)


def test_benchmark_reports_reference_formulas():
    c = _compute()
    res = c.run_benchmark(3)
    expected_ips = c.num_bodies**2 * 1e-9 * (3 * 1000.0 / res["milliseconds"])
    assert abs(res["interactions_per_second_e9"] - expected_ips) < 1e-9
    assert abs(res["gflops"] - expected_ips * 20) < 1e-6
    assert res["num_bodies"] == 512


def test_compare_passes_and_is_side_effect_free():
    c = _compute()
    pos0 = c.system.positions.copy()
    assert c.compare_results() is True
    np.testing.assert_array_equal(c.system.positions, pos0)


def test_compare_detects_wrong_dynamics():
    c = _compute()
    # sabotage: the device step uses damping=0 (zeroed velocities) while the
    # oracle still sees the real params -> position delta of order |v|*dt,
    # far above the 5e-4 tolerance
    c.system.params = c.active_params.replace(damping=0.0)
    assert c.compare_results() is False


def test_demo_cycling_state_machine():
    c = _compute(cycle_demo=False)
    assert c.active_demo == 0
    c.next_demo()
    assert c.active_demo == 1
    assert c.active_params == DEMO_PARAMS[1]
    c.previous_demo()
    assert c.active_demo == 0
    for _ in range(len(DEMO_PARAMS)):
        c.next_demo()
    assert c.active_demo == 0  # wraps


def test_tuned_scales_applied():
    c = _compute(n=4096)
    cs, vs = tuned_scales(4096)
    assert c.active_params.cluster_scale == cs
    assert c.active_params.velocity_scale == vs


def test_pause_stops_stepping():
    c = _compute(cycle_demo=False)
    c.pause()
    p0 = c.system.positions.copy()
    c.update_simulation()
    np.testing.assert_array_equal(c.system.positions, p0)
    c.pause()
    c.update_simulation()
    assert not np.allclose(c.system.positions, p0)


def test_update_params_write_through():
    c = _compute()
    c.update_params(softening=0.5, damping=0.9)
    assert c.system.params.softening == 0.5
    assert c.system.params.damping == 0.9


def test_reset_config():
    c = _compute(cycle_demo=False)
    p_shell = c.system.positions.copy()
    c.reset(NBodyConfig.EXPAND)
    assert not np.allclose(c.system.positions, p_shell)


def test_default_num_bodies_device_derived(monkeypatch):
    """Default N derives from the device (reference: 4*blockSize*SMs,
    compute_cuda.cpp:113): 16384 bodies/core on TPU, CPU reference's 4096."""
    import jax

    from nbody_tpu.compute import default_num_bodies

    assert default_num_bodies() == 4096  # tests run on the CPU backend

    class FakeDev:
        num_cores = 2

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDev()])
    assert default_num_bodies() == 16384 * 2
    assert default_num_bodies(8) == 16384 * 2 * 8
