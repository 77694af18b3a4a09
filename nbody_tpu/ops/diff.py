"""Differentiable N-body stepping.

The reference has no gradients (CUDA demo); a JAX-native framework should.
The XLA step (`ops.reference`) is differentiable for free; the Pallas kernel
is not, so `nbody_step_diff` pairs them with `jax.custom_vjp`: the forward
pass runs the fast fused kernel (on TPU), the backward pass recomputes
through the mathematically identical XLA step and differentiates that —
standard recompute-for-backward, trading one extra O(N^2) pass for not
hand-deriving the Hessian-vector products of the softened potential.

Gradients flow to positions, velocities, dt, softening, and damping — enough
to optimize initial conditions or fit physical parameters to trajectories.
"""

from __future__ import annotations

import functools

import jax

from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
from nbody_tpu.ops.reference import nbody_step_xla


from nbody_tpu.utils.timing import on_tpu as _on_tpu


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def nbody_step_diff(pos, vel, dt, softening, damping, config=()):
    """One differentiable step; config is a static dict-as-tuple of kernel
    options, e.g. (("tile_i", 256), ("variant", "vpu"))."""
    kw = dict(config)
    if _on_tpu() and pos.dtype == jax.numpy.float32:
        return nbody_step_pallas(pos, vel, dt, softening, damping, **kw)
    return nbody_step_xla(pos, vel, dt, softening, damping)


def _fwd(pos, vel, dt, softening, damping, config):
    out = nbody_step_diff(pos, vel, dt, softening, damping, config)
    return out, (pos, vel, dt, softening, damping)


def _bwd(config, residuals, cotangents):
    pos, vel, dt, softening, damping = residuals
    import jax.numpy as jnp

    dt = jnp.asarray(dt, pos.dtype)
    softening = jnp.asarray(softening, pos.dtype)
    damping = jnp.asarray(damping, pos.dtype)
    _, vjp = jax.vjp(nbody_step_xla, pos, vel, dt, softening, damping)
    return vjp(cotangents)


nbody_step_diff.defvjp(_fwd, _bwd)


def rollout_diff(pos, vel, dt, softening, damping, *, steps: int, config=()):
    """Differentiable `steps`-step rollout with per-step rematerialization.

    ``jax.checkpoint`` around each step keeps backward memory O(state)
    instead of O(steps * state): residuals are recomputed on the backward
    sweep — the standard trade of FLOPs for HBM on long trajectories.
    """
    step = jax.checkpoint(
        lambda p, v: nbody_step_diff(p, v, dt, softening, damping, config)
    )

    def body(state, _):
        p, v = state
        return step(p, v), None

    (pos, vel), _ = jax.lax.scan(body, (pos, vel), None, length=steps)
    return pos, vel


def make_sharded_step_diff(mesh, *, strategy: str = "auto",
                           tile_i=None, tile_j=None,
                           interpret: bool = False, chunk_size=None):
    """Differentiable body-sharded step over a device mesh.

    Same recompute-for-backward pairing as ``nbody_step_diff``, lifted to
    multi-chip: forward runs the fused Pallas sharded step; backward
    differentiates the mathematically identical XLA sharded step (XLA
    transposes the collectives itself — all_gather ↔ reduce-scatter,
    ppermute ↔ inverse ppermute). Gradients flow to pos/vel/dt/softening/
    damping, all staying sharded P('bodies', None).
    """
    from nbody_tpu.ops.pallas_kernel import DEFAULT_TILE_I, DEFAULT_TILE_J
    from nbody_tpu.parallel.sharded import make_sharded_step

    fast = make_sharded_step(
        mesh, kernel="pallas", strategy=strategy,
        tile_i=DEFAULT_TILE_I if tile_i is None else tile_i,
        tile_j=DEFAULT_TILE_J if tile_j is None else tile_j,
        interpret=interpret,
    )
    ref = make_sharded_step(
        mesh, kernel="xla", strategy=strategy, chunk_size=chunk_size
    )

    @jax.custom_vjp
    def step(pos, vel, dt, softening, damping):
        return fast(pos, vel, dt, softening, damping)

    def fwd(pos, vel, dt, softening, damping):
        return step(pos, vel, dt, softening, damping), (
            pos, vel, dt, softening, damping
        )

    def bwd(residuals, cotangents):
        pos, vel, dt, softening, damping = residuals
        import jax.numpy as jnp

        dt = jnp.asarray(dt, pos.dtype)
        softening = jnp.asarray(softening, pos.dtype)
        damping = jnp.asarray(damping, pos.dtype)
        _, vjp = jax.vjp(ref, pos, vel, dt, softening, damping)
        return vjp(cotangents)

    step.defvjp(fwd, bwd)
    return step
