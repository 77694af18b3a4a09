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

from nbody_tpu.ops.reference import _chunk_and_pad


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

    c, n_pad = _chunk_and_pad(n, chunk_size)
    idx = jnp.arange(n)
    if c == n:
        per_row = rows(p3, m, idx)
    else:
        pad = n_pad - n
        # padded rows get zero mass (no contribution) and out-of-range indices
        p3p = jnp.pad(p3, ((0, pad), (0, 0)))
        mp = jnp.pad(m, (0, pad))
        idxp = jnp.arange(n_pad)
        per_row = jax.lax.map(
            lambda args: rows(*args),
            (p3p.reshape(n_pad // c, c, 3), mp.reshape(n_pad // c, c),
             idxp.reshape(n_pad // c, c)),
        ).reshape(n_pad)[:n]
    return -0.5 * jnp.sum(per_row)


def total_energy(pos, vel, softening, *, chunk_size: int | None = None):
    return kinetic_energy(pos, vel) + potential_energy(pos, softening, chunk_size=chunk_size)
