"""Multi-host (DCN) wrapper tests.

Real DCN needs a pod spanning hosts (unavailable here — docs/ROADMAP.md), so
these exercise the wrapper's contract: argument passthrough, idempotency on
re-initialization, error propagation, and the single-process integration path.
"""

import jax
import pytest

from nbody_tpu.parallel import initialize_multihost, is_multihost


def test_initialize_passes_arguments_through(monkeypatch):
    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    n = initialize_multihost("10.0.0.1:1234", num_processes=4, process_id=2)
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}
    assert n == len(jax.devices())


def test_initialize_is_idempotent(monkeypatch):
    """A second call must swallow the 'already initialized' RuntimeError."""

    def fake_init(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    n = initialize_multihost()
    assert n == len(jax.devices())


def test_initialize_propagates_real_failures(monkeypatch):
    def fake_init(**kw):
        raise RuntimeError("connection to coordinator failed")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(RuntimeError, match="coordinator failed"):
        initialize_multihost("bad:0")


def test_single_process_is_not_multihost():
    # integration (no mock): this test environment is one process
    assert jax.process_count() == 1
    assert is_multihost() is False
