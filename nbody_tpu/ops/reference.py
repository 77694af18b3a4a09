"""XLA (pure jnp) all-pairs N-body step.

This is the framework's *portable* compute path: it runs on TPU, CPU, and in
fp64, and it is the correctness anchor the Pallas kernel is validated against
(which in turn is validated against the native C++ / NumPy oracles,
mirroring the reference's GPU-vs-CPU QA compare,
/root/reference/src/nbody/compute_cuda.cpp:294-333).

Physics (same math as the reference's bodyBodyInteraction + integrateBodies,
/root/reference/src/nbody/bodysystemcuda.cu:98-184, re-derived not copied):

    r_ij      = p_j - p_i
    s_ij      = m_j * (|r_ij|^2 + softening^2) ** (-3/2)      (Plummer)
    a_i       = sum_j s_ij * r_ij          (self term j==i contributes 0)
    v'        = (v + a * dt) * damping     (semi-implicit Euler w/ damping)
    p'        = p + v' * dt

Memory: the naive broadcast needs O(N^2) — fine to ~16K bodies. Above that,
``chunk_size`` splits the i-rows and ``lax.map`` streams (C, N) slabs, so peak
memory is O(chunk * N) while XLA still fuses the inner elementwise chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 4096


def _chunk_and_pad(n: int, chunk_size: int | None) -> tuple[int, int]:
    """(chunk, padded_n): rows are zero-padded up to a chunk multiple rather
    than hunting for divisors (a prime N would otherwise degenerate to
    chunk=1 and a pathologically long lax.map)."""
    if chunk_size is None:
        chunk_size = DEFAULT_CHUNK
    c = min(n, int(chunk_size))
    return c, ((n + c - 1) // c) * c


def _accel_rows(rows_p, all_p, all_m, eps2):
    """Acceleration on `rows_p` (C,3) due to all bodies (N,3)/(N,)."""
    dx = all_p[None, :, :] - rows_p[:, None, :]  # (C, N, 3)
    r2 = jnp.sum(dx * dx, axis=-1) + eps2  # (C, N)
    inv = jax.lax.rsqrt(r2)
    s = all_m[None, :] * (inv * inv * inv)  # (C, N)
    return jnp.einsum("cn,cnk->ck", s, dx)


def compute_accel_xla_vs(pos_i, pos_j, softening, *, chunk_size: int | None = None):
    """Acceleration (M,3) on the i-set (M,4) due to the j-set (N,4).

    The general i-vs-j form matches the Pallas kernels and is what the
    sharded step uses (local shard vs gathered global positions)."""
    m_rows = pos_i.shape[0]
    ri = pos_i[:, :3]
    p3 = pos_j[:, :3]
    m = pos_j[:, 3]
    eps2 = jnp.asarray(softening, pos_i.dtype) ** 2
    c, m_pad = _chunk_and_pad(m_rows, chunk_size)
    if c == m_rows:
        return _accel_rows(ri, p3, m, eps2)
    if m_pad != m_rows:
        ri = jnp.pad(ri, ((0, m_pad - m_rows), (0, 0)))
    rows = ri.reshape(m_pad // c, c, 3)
    acc = jax.lax.map(lambda r: _accel_rows(r, p3, m, eps2), rows)
    return acc.reshape(m_pad, 3)[:m_rows]


def compute_accel_xla(pos, softening, *, chunk_size: int | None = None):
    """Gravitational acceleration (N,3) for AoS state pos (N,4)=[x,y,z,m]."""
    return compute_accel_xla_vs(pos, pos, softening, chunk_size=chunk_size)


def integrate(pos, vel, acc, dt, damping):
    """Damped semi-implicit Euler update; mass and the velocity w-lane pass
    through untouched."""
    dt = jnp.asarray(dt, pos.dtype)
    damping = jnp.asarray(damping, pos.dtype)
    v3 = (vel[:, :3] + acc * dt) * damping
    p3 = pos[:, :3] + v3 * dt
    new_pos = jnp.concatenate([p3, pos[:, 3:4]], axis=1)
    new_vel = jnp.concatenate([v3, vel[:, 3:4]], axis=1)
    return new_pos, new_vel


def nbody_step_xla_vs(pos_i, vel_i, pos_j, dt, softening, damping,
                      *, chunk_size: int | None = None):
    """Step the i-set under forces from the j-set (general sharded form)."""
    acc = compute_accel_xla_vs(pos_i, pos_j, softening, chunk_size=chunk_size)
    return integrate(pos_i, vel_i, acc, dt, damping)


def nbody_step_xla(pos, vel, dt, softening, damping, *, chunk_size: int | None = None):
    """One integration step; returns (new_pos, new_vel), same (N,4) layout."""
    return nbody_step_xla_vs(pos, vel, pos, dt, softening, damping, chunk_size=chunk_size)


def nbody_step_leapfrog(pos, vel, dt, softening, damping, *, accel_fn=None,
                        chunk_size: int | None = None):
    """Symplectic drift-kick-drift (leapfrog) step — a framework extension
    beyond the reference's damped semi-implicit Euler, with one force
    evaluation per step and no extra state:

        p½ = p + v·dt/2
        v' = (v + a(p½)·dt) · damping
        p' = p½ + v'·dt/2

    Energy drift is O(dt²) and bounded (vs Euler's secular drift).
    `accel_fn(pos4) -> (N,3)` lets the caller plug the Pallas accel kernel;
    defaults to the chunked XLA force.
    """
    dt = jnp.asarray(dt, pos.dtype)
    damping = jnp.asarray(damping, pos.dtype)
    if accel_fn is None:
        def accel_fn(p4):
            return compute_accel_xla(p4, softening, chunk_size=chunk_size)

    p_half = pos[:, :3] + vel[:, :3] * (dt / 2)
    pos_half = jnp.concatenate([p_half, pos[:, 3:4]], axis=1)
    acc = accel_fn(pos_half)
    v3 = (vel[:, :3] + acc * dt) * damping
    p3 = p_half + v3 * (dt / 2)
    new_pos = jnp.concatenate([p3, pos[:, 3:4]], axis=1)
    new_vel = jnp.concatenate([v3, vel[:, 3:4]], axis=1)
    return new_pos, new_vel


def _accel_jerk_rows(rows_p, rows_v, all_p, all_v, all_m, eps2):
    """(C,3) acceleration AND jerk on the row set due to all bodies.

    jerk = da/dt = sum_j m_j [ v_ij / r^3 - 3 (r_ij . v_ij) r_ij / r^5 ]
    with the softened r^2 = |r_ij|^2 + eps^2 (self pair contributes 0)."""
    dx = all_p[None, :, :] - rows_p[:, None, :]  # (C, N, 3)
    dv = all_v[None, :, :] - rows_v[:, None, :]
    r2 = jnp.sum(dx * dx, axis=-1) + eps2  # (C, N)
    inv = jax.lax.rsqrt(r2)
    inv3 = inv * inv * inv
    s = all_m[None, :] * inv3
    rv = jnp.sum(dx * dv, axis=-1)  # (C, N)
    acc = jnp.einsum("cn,cnk->ck", s, dx)
    jerk = (jnp.einsum("cn,cnk->ck", s, dv)
            - 3.0 * jnp.einsum("cn,cnk->ck", s * rv / r2, dx))
    return acc, jerk


def compute_accel_jerk_xla(pos, vel, softening, *, chunk_size: int | None = None):
    """(acc, jerk), each (N,3), for AoS state — the Hermite scheme's force
    evaluation (Makino & Aarseth 1992; the arXiv astro-ph/0511062 Hermite
    direct-integration family from PAPERS.md)."""
    n = pos.shape[0]
    p3, v3, m = pos[:, :3], vel[:, :3], pos[:, 3]
    eps2 = jnp.asarray(softening, pos.dtype) ** 2
    c, n_pad = _chunk_and_pad(n, chunk_size)
    if c == n:
        return _accel_jerk_rows(p3, v3, p3, v3, m, eps2)
    if n_pad != n:
        p3p = jnp.pad(p3, ((0, n_pad - n), (0, 0)))
        v3p = jnp.pad(v3, ((0, n_pad - n), (0, 0)))
    else:
        p3p, v3p = p3, v3
    rows_p = p3p.reshape(n_pad // c, c, 3)
    rows_v = v3p.reshape(n_pad // c, c, 3)
    acc, jerk = jax.lax.map(
        lambda rv: _accel_jerk_rows(rv[0], rv[1], p3, v3, m, eps2),
        (rows_p, rows_v),
    )
    return acc.reshape(n_pad, 3)[:n], jerk.reshape(n_pad, 3)[:n]


def nbody_step_hermite(pos, vel, dt, softening, damping,
                       *, chunk_size: int | None = None,
                       accel_jerk_fn=None):
    """4th-order Hermite predictor-corrector step, P(EC) form:

        predict:  x_p = x + v dt + a0 dt²/2 + j0 dt³/6
                  v_p = v + a0 dt + j0 dt²/2
        evaluate: (a1, j1) at the predicted state
        correct:  v1 = v + dt/2 (a0+a1) + dt²/12 (j0−j1)
                  x1 = x + dt/2 (v +v1) + dt²/12 (a0−a1)

    then the reference's damping multiplier on v1 for interface parity.
    Two force evaluations per step buy O(dt⁴) local accuracy — the
    collisional-dynamics workhorse integrator (Makino & Aarseth 1992).

    `accel_jerk_fn(pos4, vel4) -> (acc, jerk)` lets callers plug a custom
    force evaluation (the sharded step passes the collective-backed one);
    defaults to the chunked XLA pass.
    """
    dt = jnp.asarray(dt, pos.dtype)
    damping = jnp.asarray(damping, pos.dtype)
    if accel_jerk_fn is None:
        def accel_jerk_fn(p4, v4):
            return compute_accel_jerk_xla(p4, v4, softening,
                                          chunk_size=chunk_size)
    x0, v0 = pos[:, :3], vel[:, :3]
    a0, j0 = accel_jerk_fn(pos, vel)

    xp, vp = hermite_predict(x0, v0, a0, j0, dt)
    pos_p = jnp.concatenate([xp, pos[:, 3:4]], axis=1)
    vel_p = jnp.concatenate([vp, vel[:, 3:4]], axis=1)
    a1, j1 = accel_jerk_fn(pos_p, vel_p)

    x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, dt, damping)
    new_pos = jnp.concatenate([x1, pos[:, 3:4]], axis=1)
    new_vel = jnp.concatenate([v1, vel[:, 3:4]], axis=1)
    return new_pos, new_vel


def hermite_predict(x0, v0, a0, j0, dt):
    """Hermite P(EC) predictor (the Taylor expansion through the jerk) —
    the ONE home of these polynomials; the adaptive scan
    (ops/adaptive.py) composes the same helpers with an in-scan dt."""
    xp = x0 + v0 * dt + a0 * (dt * dt / 2) + j0 * (dt * dt * dt / 6)
    vp = v0 + a0 * dt + j0 * (dt * dt / 2)
    return xp, vp


def hermite_correct(x0, v0, a0, j0, a1, j1, dt, damping):
    """Hermite P(EC) corrector, with the reference's damping multiplier
    applied to the corrected velocity (interface parity)."""
    v1 = (v0 + (dt / 2) * (a0 + a1) + (dt * dt / 12) * (j0 - j1)) * damping
    x1 = x0 + (dt / 2) * (v0 + v1) + (dt * dt / 12) * (a0 - a1)
    return x1, v1


@functools.partial(jax.jit, static_argnames=("steps", "chunk_size"), donate_argnums=(0, 1))
def rollout_xla(pos, vel, dt, softening, damping, *, steps: int, chunk_size: int | None = None):
    """`steps` integration steps under one jit, via lax.scan (compiler-friendly
    loop; no per-step dispatch). Buffers are donated: the functional
    double-buffering equivalent of the reference's ping-pong position buffers
    (/root/reference/src/nbody/bodysystemcuda.hpp:68-69)."""

    def body(state, _):
        p, v = state
        return nbody_step_xla(p, v, dt, softening, damping, chunk_size=chunk_size), None

    (pos, vel), _ = jax.lax.scan(body, (pos, vel), None, length=steps)
    return pos, vel
