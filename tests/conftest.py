"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip logic is tested without a pod by forcing the host platform and
8 virtual devices (SURVEY.md §4). Pallas kernels run in interpret mode on CPU.
Set NBODY_TEST_REAL_DEVICES=1 to test on whatever hardware is attached.
"""

import os

if not os.environ.get("NBODY_TEST_REAL_DEVICES"):
    # overwrite, not setdefault: the environment may pre-set JAX_PLATFORMS to
    # the attached accelerator (e.g. "axon")
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # A sitecustomize may have imported jax at interpreter start (before this
    # conftest ran), in which case jax already latched JAX_PLATFORMS; update
    # the live config too. Backends are lazy, so this works as long as no
    # test module touched a device at import time.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite: the fast tier's cost is
# dominated by CPU XLA compiles (~0.7 s/test average), so warm reruns of an
# unchanged tree skip most of it. Keyed per-repo under .cache/ (gitignored);
# NBODY_NO_COMPILE_CACHE=1 opts out (the helper honors it), so a cold-run
# timing measurement is one env var away.
import jax  # noqa: E402  (no-op if already imported above)

from nbody_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

if _enable_cache(os.path.join(os.path.dirname(__file__), os.pardir,
                               ".cache", "test_xla")):
    # the suite's compiles are many and mid-sized (CPU), so cache far more
    # aggressively than the helper's TPU-oriented 1 s threshold
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic


@pytest.fixture
def shell_state_small():
    """4096-body shell state at demo-0 params (BASELINE config[0] geometry)."""
    pos, vel = ic.generate(NBodyConfig.SHELL, 4096, 1.68, 2.98, seed=7)
    return pos, vel


@pytest.fixture
def random_state_tiny():
    pos, vel = ic.generate(NBodyConfig.RANDOM, 512, 1.54, 8.0, seed=3)
    return pos, vel


def assert_state_close(a, b, tol=5e-4):
    """The reference's QA criterion: element-wise |delta| <= tol over x,y,z
    (/root/reference/src/nbody/compute_cuda.cpp:310-323)."""
    a = np.asarray(a)
    b = np.asarray(b)
    err = np.abs(a[:, :3] - b[:, :3]).max()
    assert err <= tol, f"max |delta| = {err} > {tol}"
