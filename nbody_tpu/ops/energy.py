"""Total-energy diagnostics (kinetic + softened potential).

The reference has no energy computation; SURVEY.md §4/§7 mandates energy-drift
checks as part of the test strategy the reference implies. The potential is
the Plummer-softened pair potential consistent with the force law used by the
step (a = sum_j m_j r (r^2+eps^2)^{-3/2} derives from
U = -sum_{i<j} m_i m_j (r^2+eps^2)^{-1/2}); the self pair i==j is excluded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody_tpu.ops.reference import _pick_chunk


def kinetic_energy(pos, vel):
    m = pos[:, 3]
    v2 = jnp.sum(vel[:, :3] * vel[:, :3], axis=1)
    return 0.5 * jnp.sum(m * v2)


def potential_energy(pos, softening, *, chunk_size: int | None = None):
    n = pos.shape[0]
    p3 = pos[:, :3]
    m = pos[:, 3]
    eps2 = jnp.asarray(softening, pos.dtype) ** 2

    def rows(rp, rm, ridx):
        dx = p3[None, :, :] - rp[:, None, :]  # (C, N, 3)
        r2 = jnp.sum(dx * dx, axis=-1) + eps2
        inv = jax.lax.rsqrt(r2)
        # mask the diagonal (self pair)
        col = jnp.arange(n)[None, :]
        inv = jnp.where(col == ridx[:, None], 0.0, inv)
        return jnp.sum(rm[:, None] * m[None, :] * inv, axis=1)

    c = _pick_chunk(n, chunk_size)
    idx = jnp.arange(n)
    if c == n:
        per_row = rows(p3, m, idx)
    else:
        per_row = jax.lax.map(
            lambda args: rows(*args),
            (p3.reshape(n // c, c, 3), m.reshape(n // c, c), idx.reshape(n // c, c)),
        ).reshape(n)
    return -0.5 * jnp.sum(per_row)


def total_energy(pos, vel, softening, *, chunk_size: int | None = None):
    return kinetic_energy(pos, vel) + potential_energy(pos, softening, chunk_size=chunk_size)
