"""Native C++ CLI harness tests (built on demand; skipped without g++)."""

import os
import pathlib
import subprocess

import pytest

CLI = pathlib.Path(__file__).resolve().parent.parent / "nbody_tpu" / "oracle" / "_nbody_cli"


@pytest.fixture(scope="module", autouse=True)
def built_cli():
    if not CLI.exists():
        try:
            from nbody_tpu.oracle.build import build_cli

            build_cli(verbose=False)
        except Exception:
            pytest.skip("native toolchain unavailable")
    return CLI


def _run(*args):
    return subprocess.run([str(CLI), *args], capture_output=True, text=True, timeout=300)


def test_benchmark_output_format():
    r = _run("--benchmark", "--numbodies", "1024", "-i", "3")
    assert r.returncode == 0, r.stderr
    assert "billion interactions per second" in r.stdout
    assert "single-precision GFLOP/s at 20 flops per interaction" in r.stdout


def test_fp64_benchmark():
    r = _run("--benchmark", "--numbodies", "512", "-i", "2", "--fp64")
    assert r.returncode == 0
    assert "double-precision GFLOP/s at 30 flops per interaction" in r.stdout


def test_compare_passes():
    r = _run("--compare", "--numbodies", "1024")
    assert r.returncode == 0
    assert "OK" in r.stdout


@pytest.mark.parametrize("integ", ["leapfrog", "hermite"])
def test_compare_integrators(integ):
    """--compare --integrator leapfrog/hermite: the native fp32-vs-fp64
    QA gate runs the full chosen integrator inside the C++ engine
    (VERDICT r4 item 7)."""
    r = _run("--compare", "--numbodies", "512", "--integrator", integ)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_benchmark_integrator_flag():
    r = _run("--benchmark", "--numbodies", "512", "-i", "2",
             "--integrator", "hermite")
    assert r.returncode == 0, r.stderr
    assert "billion interactions per second" in r.stdout


def test_bad_integrator_exits_2():
    r = _run("--compare", "--integrator", "rk4")
    assert r.returncode == 2


def test_bad_flag_exits_2():
    r = _run("--bogus")
    assert r.returncode == 2


def test_bad_n_exits_2():
    r = _run("--benchmark", "--numbodies", "-5")
    assert r.returncode == 2


@pytest.mark.slow
def test_sanitized_build_runs_clean(built_cli):
    """ASan+UBSan build of the oracle + CLI passes a compare run — the
    reference's sanitize-ci analogue
    (/root/reference/.github/workflows/ci.yml:36-78)."""
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no toolchain")
    from nbody_tpu.oracle.build import build_cli

    cli = build_cli(verbose=False, sanitize=True)
    env = dict(os.environ,
               ASAN_OPTIONS="strict_string_checks=1:"
                            "detect_stack_use_after_return=1:"
                            "check_initialization_order=1:detect_leaks=1",
               UBSAN_OPTIONS="print_stacktrace=1")
    r = subprocess.run([str(cli), "--compare", "--numbodies", "512"],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_stale_library_reload_needs_dlclose(tmp_path):
    """The stale-oracle recovery in native._load depends on releasing the
    old dlopen handle before re-CDLLing the SAME path: glibc caches
    loaded objects by pathname, so without the _dlclose a rebuilt .so is
    never seen by the process (the exact round-5 review finding). Pin
    the mechanism with two tiny libraries swapped at one path."""
    import ctypes
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no toolchain")
    from nbody_tpu.oracle.native import _dlclose

    def make(src_name, code):
        src = tmp_path / src_name
        src.write_text(code)
        out = tmp_path / (src_name + ".so")
        subprocess.run(["g++", "-shared", "-fPIC", str(src), "-o",
                        str(out)], check=True)
        return out

    stale = make("stale.c", "extern \"C\" int probe(void){return 1;}\n")
    fresh = make("fresh.c",
                 "extern \"C\" int probe(void){return 2;}\n"
                 "extern \"C\" int marker(void){return 0;}\n")
    lib_path = tmp_path / "swapped.so"
    shutil.copy(stale, lib_path)
    lib = ctypes.CDLL(str(lib_path))
    assert not hasattr(lib, "marker")

    # the rebuild: atomic replace, as oracle.build._build_atomic does
    os.replace(fresh, lib_path)
    # without dlclose the pathname cache would return the stale handle
    _dlclose(lib)
    lib2 = ctypes.CDLL(str(lib_path))
    assert hasattr(lib2, "marker"), (
        "re-CDLL after _dlclose must bind the rebuilt library")
    assert lib2.probe() == 2
    _dlclose(lib2)


def test_build_leaves_no_temp_artifacts(built_cli):
    """_build_atomic must clean its temp object on success (the rename
    path) — a leftover .tmp* would accumulate per rebuild."""
    from nbody_tpu.oracle.build import HERE

    leftovers = list(HERE.glob("*.tmp*"))
    assert leftovers == []
