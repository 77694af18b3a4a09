"""Fit a physical parameter to an observed trajectory by gradient descent.

Demonstrates the differentiable-simulation surface (nbody_tpu.ops.diff) —
something the CUDA reference cannot do at all: generate a short trajectory
with a hidden softening value, then recover it from the final positions
alone by differentiating through the rollout.

Runs anywhere (CPU included): ``python examples/fit_softening.py``.
"""

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.diff import rollout_diff

N = 256
STEPS = 8
DT = 0.005
TRUE_SOFTENING = 0.30
INIT_SOFTENING = 0.10
MAX_STEP = 0.05  # trust region for the Newton update
ITERS = 30


def main():
    pos, vel = ic.generate(NBodyConfig.SHELL, N, 1.5, 2.0, seed=11)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

    target, _ = rollout_diff(p0, v0, DT, TRUE_SOFTENING, 1.0, steps=STEPS)

    def loss(softening):
        p, _ = rollout_diff(p0, v0, DT, softening, 1.0, steps=STEPS)
        return jnp.mean((p[:, :3] - target[:, :3]) ** 2)

    # second-order fit: jax gives the curvature for free (grad of grad
    # through the whole rollout), so a trust-region Newton step handles the
    # decades-spanning gradient scale a fixed-lr descent would stall on
    grad = jax.jit(jax.value_and_grad(loss))
    curv = jax.jit(jax.grad(jax.grad(loss)))
    s = jnp.float32(INIT_SOFTENING)
    for i in range(ITERS):
        val, g = grad(s)
        h = curv(s)
        step = jnp.clip(g / jnp.maximum(jnp.abs(h), 1e-12),
                        -MAX_STEP, MAX_STEP)
        s = s - step
        if i % 5 == 0 or i == ITERS - 1:
            print(f"iter {i:3d}  loss={float(val):.3e}  softening={float(s):.4f}")

    err = abs(float(s) - TRUE_SOFTENING)
    print(f"recovered softening {float(s):.4f} (true {TRUE_SOFTENING}, "
          f"|err| {err:.2e})")
    assert err < 5e-3, "gradient fit failed to recover the parameter"


if __name__ == "__main__":
    main()
