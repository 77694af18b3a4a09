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


def delta_time_rolls(step_fn, state, *, iters: int, rolls: int = 3,
                     factor: int = 5) -> float:
    """Marginal milliseconds-per-step of ``step_fn`` via delta-timed scan
    rollouts — THE timing recipe for remote-attached chips.

    Every dispatched rollout pays a FIXED cost through the relay
    (dispatch + sync + tunnel, measured ~55-60 ms here; microseconds on a
    local host). Timing an ``iters``-step and a ``factor*iters``-step roll
    and dividing the difference by ``(factor-1)*iters`` cancels it exactly.
    Best-of-``rolls`` because relay noise is one-sided (interruptions only
    slow a roll down); the delta is floored at 1e-6 ms since the two minima
    are independent. bench.py and the measurement scripts share this helper
    so the methodology cannot drift; Compute.run_benchmark implements the
    same recipe over the stateful ``update_many`` path (it must exercise
    the product rollout machinery, not a bare step).
    """
    def make_roll(length):
        @jax.jit
        def roll(*state):
            def body(s, _):
                return step_fn(*s), None
            state, _ = jax.lax.scan(body, state, None, length=length)
            return state
        return roll

    def best(roll):
        return min(
            time_steps(lambda *s: roll(*s), state, iters=1,
                       warmup=1 if i == 0 else 0)[0]
            for i in range(rolls)
        )

    ms_a = best(make_roll(iters))
    ms_b = best(make_roll(factor * iters))
    return max(ms_b - ms_a, 1e-6) / ((factor - 1) * iters)
