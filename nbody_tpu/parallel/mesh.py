"""Mesh construction and state sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BODY_AXIS = "bodies"


def make_mesh(num_devices: int | None = None, *, axis: str = BODY_AXIS) -> Mesh:
    """1-D body-sharding mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} available"
            )
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def shard_state(mesh: Mesh, pos, vel, *, axis=BODY_AXIS):
    """Place (pos, vel) sharded along bodies over the mesh.

    `axis` may be one mesh axis name or a tuple of names (the 2-D force
    decomposition shards bodies over ("rows", "cols") jointly). N must
    divide evenly by the device count (use pad_to_multiple first;
    zero-mass padding bodies exert no force)."""
    n = pos.shape[0]
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    ndev = 1
    for a in axes:
        ndev *= mesh.shape[a]
    if n % ndev:
        raise ValueError(f"N={n} not divisible by {ndev} devices; pad first")
    sh = NamedSharding(mesh, P(axis, None))
    return jax.device_put(jnp.asarray(pos), sh), jax.device_put(jnp.asarray(vel), sh)


def make_mesh_2d(rows: int, cols: int, *, axes=("rows", "cols")) -> Mesh:
    """2-D (rows x cols) mesh over the first rows*cols devices — the i-block
    x j-block force decomposition (make_sharded_step_2d)."""
    import numpy as np

    devices = jax.devices()
    if rows * cols > len(devices):
        raise ValueError(
            f"requested {rows}x{cols} devices but only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[: rows * cols]).reshape(rows, cols), axes)


def pad_to_multiple(pos, vel, multiple: int):
    """Zero-mass-pad state so N is a multiple (shards and tiles both need it).

    Returns (pos, vel, original_n)."""
    import numpy as np

    n = pos.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if n_pad == n:
        return pos, vel, n
    pad = ((0, n_pad - n), (0, 0))
    return np.pad(np.asarray(pos), pad), np.pad(np.asarray(vel), pad), n
