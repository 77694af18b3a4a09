"""NumPy CPU oracle — the golden reference for every device path.

Same math as the reference CPU implementation's scalar path
(/root/reference/src/nbody/bodysystemcpu.cpp:244-299, re-derived): 1/r^3 via
sqrt + divide (not rsqrt), then v = (v + a*dt) * damping; p += v*dt.
Computed in the array dtype (float32 oracle accumulates in float32, like the
reference CPU float path).
"""

from __future__ import annotations

import numpy as np


def accel_numpy(pos: np.ndarray, softening: float, chunk: int = 2048) -> np.ndarray:
    """Acceleration (N,3) for AoS pos (N,4); chunked over i-rows."""
    n = pos.shape[0]
    dtype = pos.dtype
    p3 = pos[:, :3]
    m = pos[:, 3]
    eps2 = dtype.type(softening) ** 2
    out = np.empty((n, 3), dtype=dtype)
    for i0 in range(0, n, chunk):
        rows = p3[i0 : i0 + chunk]
        dx = p3[None, :, :] - rows[:, None, :]  # (C,N,3)
        r2 = np.einsum("cnk,cnk->cn", dx, dx) + eps2
        d = np.sqrt(r2)
        s = m[None, :] / (d * r2)  # m / r^3
        out[i0 : i0 + chunk] = np.einsum("cn,cnk->ck", s, dx)
    return out


def step_numpy(
    pos: np.ndarray,
    vel: np.ndarray,
    dt: float,
    softening: float,
    damping: float,
) -> tuple[np.ndarray, np.ndarray]:
    """One integration step on the host; returns new (pos, vel) copies."""
    dtype = pos.dtype
    acc = accel_numpy(pos, softening)
    v3 = (vel[:, :3] + acc * dtype.type(dt)) * dtype.type(damping)
    p3 = pos[:, :3] + v3 * dtype.type(dt)
    new_pos = pos.copy()
    new_vel = vel.copy()
    new_pos[:, :3] = p3
    new_vel[:, :3] = v3
    return new_pos, new_vel


def step_numpy_leapfrog(
    pos: np.ndarray,
    vel: np.ndarray,
    dt: float,
    softening: float,
    damping: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Symplectic DKD step on the host (mirrors ops.reference.nbody_step_leapfrog)."""
    dtype = pos.dtype
    half = dtype.type(dt) / 2
    p_half = pos.copy()
    p_half[:, :3] += vel[:, :3] * half
    acc = accel_numpy(p_half, softening)
    new_vel = vel.copy()
    new_vel[:, :3] = (vel[:, :3] + acc * dtype.type(dt)) * dtype.type(damping)
    new_pos = p_half
    new_pos[:, :3] += new_vel[:, :3] * half
    return new_pos, new_vel
