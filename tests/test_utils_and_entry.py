"""Utils, bench entry, and driver graft-entry tests (CPU)."""

import json
import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_time_steps_counts_iterations():
    from nbody_tpu.utils.timing import time_steps

    ms, state = time_steps(lambda x: (x + 1,), (jnp.zeros(4),), iters=3, warmup=1)
    assert ms >= 0
    # warmup(1) + iters(3) applications
    np.testing.assert_allclose(np.asarray(state[0]), 4.0)


def test_trace_noop_without_dir(monkeypatch):
    from nbody_tpu.utils.profiling import trace

    monkeypatch.delenv("NBODY_TRACE_DIR", raising=False)
    with trace() as t:
        assert t is None


@pytest.mark.slow
def test_trace_writes_profile(tmp_path):
    from nbody_tpu.utils.profiling import trace

    with trace(str(tmp_path)) as t:
        jnp.ones(8).sum().block_until_ready()
    assert t == str(tmp_path)
    assert any(tmp_path.rglob("*")), "profiler should write trace files"


def test_graft_entry_single_chip():
    sys.path.insert(0, str(REPO))
    try:
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == args[0].shape
    finally:
        sys.path.remove(str(REPO))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    sys.path.insert(0, str(REPO))
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(str(REPO))


@pytest.mark.slow
def test_bench_script_emits_json_line():
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os

    env.update({k: v for k, v in os.environ.items() if k not in env})
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert set(data) == {"metric", "value", "unit", "vs_baseline"}
    assert data["value"] > 0


def test_annotate_and_memory_stats():
    from nbody_tpu.utils.profiling import annotate, device_memory_stats

    with annotate("nbody.test"):
        pass  # must be a cheap, exception-free span even with no trace
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # {} on CPU is fine


def test_format_memory_line(monkeypatch):
    from nbody_tpu.utils import profiling

    monkeypatch.setattr(profiling, "device_memory_stats",
                        lambda device=None: {"bytes_in_use": 2 << 30,
                                             "peak_bytes_in_use": 3 << 30,
                                             "bytes_limit": 16 << 30})
    line = profiling.format_memory_line()
    assert "in use 2.00 GiB" in line and "peak 3.00 GiB" in line
    monkeypatch.setattr(profiling, "device_memory_stats",
                        lambda device=None: {})
    assert profiling.format_memory_line() == ""


@pytest.mark.slow
def test_cli_profile_flag_writes_trace(tmp_path, capsys):
    from nbody_tpu.cli import main

    tdir = tmp_path / "trace"
    rc = main(["--numbodies", "128", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--profile", str(tdir)])
    assert rc == 0
    assert "profiler trace written to" in capsys.readouterr().out
    assert any(tdir.rglob("*.xplane.pb")) or any(tdir.rglob("*.trace.json*")) \
        or any(tdir.iterdir()), "trace directory is empty"


def test_generated_api_docs_current():
    """docs/API_GENERATED.md must match the live docstrings (the
    reference's Doxygen-in-CI analogue; scripts/gen_api_docs.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", REPO / "scripts" / "gen_api_docs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    current = (REPO / "docs" / "API_GENERATED.md").read_text()
    assert current == mod.generate(), (
        "stale — run python scripts/gen_api_docs.py")


def test_delta_time_rolls_positive_and_floored():
    import jax.numpy as jnp

    from nbody_tpu.utils.timing import delta_time_rolls

    def step(x, y):
        return x * 0.5 + y, y

    ms = delta_time_rolls(step, (jnp.ones(8), jnp.ones(8)), iters=3, rolls=2)
    assert ms > 0  # the 1e-6 floor guarantees positivity even under noise
