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


def potential_energy_per_row(pos, softening, *, chunk_size: int | None = None):
    """Per-row pair-potential sums: row i holds sum_{j != i} m_i m_j /
    sqrt(r^2+eps^2); the total potential is -1/2 of their sum. Exposed so
    precise diagnostics can do the final (noise-dominant) accumulation in
    float64 on the host."""
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
    return per_row


def potential_energy(pos, softening, *, chunk_size: int | None = None):
    return -0.5 * jnp.sum(
        potential_energy_per_row(pos, softening, chunk_size=chunk_size)
    )


def total_energy(pos, vel, softening, *, chunk_size: int | None = None):
    return kinetic_energy(pos, vel) + potential_energy(pos, softening, chunk_size=chunk_size)


# ---- fp64 energy functional (state-dtype independent) ----
#
# fp32 summation noise at N >= 65k is ~1e-5 relative — the same order as the
# drifts the check reports — so an fp32-state run needs an fp64 *functional*
# for its drift numbers to mean anything (the measured-drift study,
# scripts/tpu_drift_table.py, already does this; this is the user-facing
# equivalent mandated by VERDICT r2 item 4). The reference's QA philosophy
# (one fp64-grade oracle judging the fast path,
# /root/reference/src/nbody/compute_cuda.cpp:294-333) extended to energy.

_HOST_CHUNK_ELEMS = 16 << 20  # ~128 MiB of f64 temporaries per slab


def _potential_np64(p3, m, eps2) -> float:
    """Chunked O(N^2) softened pair potential in NumPy float64."""
    import numpy as np

    n = p3.shape[0]
    chunk = max(1, _HOST_CHUNK_ELEMS // max(n, 1))
    total = np.float64(0.0)
    for s in range(0, n, chunk):
        rp = p3[s:s + chunk]
        c = rp.shape[0]
        r2 = np.full((c, n), eps2, dtype=np.float64)
        for k in range(3):
            d = p3[None, :, k] - rp[:, None, k]
            r2 += d * d
        inv = 1.0 / np.sqrt(r2)
        inv[np.arange(c), np.arange(s, s + c)] = 0.0  # self pair
        total += float((m[s:s + c, None] * m[None, :] * inv).sum())
    return -0.5 * float(total)


def total_energy_f64(pos, vel, softening) -> float:
    """Total energy with float64 arithmetic end to end, for ANY state dtype
    and backend (no jax_enable_x64 required): state is pulled to host and
    the kinetic + softened-potential functional runs in chunked NumPy f64.

    O(N^2) on the host — intended for drift diagnostics (N up to ~100k in
    seconds-to-a-minute), not per-step use. For quick f32 diagnostics at
    1M+ bodies use `total_energy` / the Pallas potential kernel."""
    import numpy as np

    pos = np.asarray(pos, dtype=np.float64)
    vel = np.asarray(vel, dtype=np.float64)
    m = pos[:, 3]
    ke = 0.5 * float((m * (vel[:, :3] ** 2).sum(axis=1)).sum())
    eps2 = float(softening) ** 2
    return ke + _potential_np64(pos[:, :3], m, eps2)


def total_energy_precise(pos, vel, softening, *, chunk_size: int | None = None,
                         host_threshold: int = 131072) -> float:
    """Drift-grade total energy for any state dtype, sized to stay usable:

    * N <= host_threshold — the full float64 functional on the host
      (`total_energy_f64`): every pair term AND the accumulation in f64.
    * N > host_threshold — hybrid: pair terms in f32 on the device (chunked
      XLA per-row sums), final accumulation over rows/bodies in host f64.
      This removes the global-summation noise — the term that actually
      swamps 1e-5-scale drifts at large N — while per-pair f32 rounding
      (~6e-8, incoherent across pairs) stays negligible.
    """
    import numpy as np

    n = int(pos.shape[0])
    if n <= host_threshold:
        return total_energy_f64(pos, vel, softening)

    per_row = np.asarray(
        potential_energy_per_row(jnp.asarray(pos), softening,
                                 chunk_size=chunk_size),
        dtype=np.float64,
    )
    pe = -0.5 * float(per_row.sum())
    posh = np.asarray(pos, dtype=np.float64)
    velh = np.asarray(vel, dtype=np.float64)
    ke = 0.5 * float((posh[:, 3] * (velh[:, :3] ** 2).sum(axis=1)).sum())
    return ke + pe
