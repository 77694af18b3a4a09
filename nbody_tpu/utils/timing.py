"""Device-honest timing helpers.

The reference times with CUDA events around the kernel loop
(/root/reference/src/nbody/compute_cuda.cpp:263-272). The JAX analogue is
wall-clock around dispatch bracketed by a *hard* sync: on some
remote-attached PJRT backends ``block_until_ready`` can report early, so the
barrier is block_until_ready plus a tiny device_get, which always waits.
"""

from __future__ import annotations

import time

import jax


def on_tpu() -> bool:
    """True when the default backend is an accelerator (not host CPU)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:  # pragma: no cover
        return False


def hard_sync(tree) -> None:
    """True execution barrier over a pytree of jax.Arrays."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves and hasattr(leaves[0], "device"):
        jax.device_get(leaves[0].ravel()[:1])


def time_steps(step_fn, state, iters: int = 10, *, warmup: int = 1) -> tuple[float, object]:
    """Time `iters` chained applications of step_fn(*state) -> state.

    Returns (milliseconds_total, final_state)."""
    for _ in range(warmup):
        state = step_fn(*state)
    hard_sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step_fn(*state)
    hard_sync(state)
    return (time.perf_counter() - t0) * 1e3, state
