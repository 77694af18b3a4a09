"""Multi-chip scaling: body-sharded device meshes and sharded steps.

The reference is single-GPU (the original NVIDIA sample's multi-GPU body
partition was dropped in the port — SURVEY.md §2 parallelism table). This is
its designed TPU replacement: positions/velocities sharded over a 1-D
``jax.sharding.Mesh`` axis, with XLA collectives over ICI per step.
"""

from nbody_tpu.parallel.mesh import make_mesh, make_mesh_2d, shard_state
from nbody_tpu.parallel.sharded import (
    choose_strategy,
    make_sharded_step,
    make_sharded_ds_adaptive_rollout,
    make_sharded_ds_adaptive_rollout_2d,
    make_sharded_ds_step,
    make_sharded_ds_step_2d,
    make_sharded_step_2d,
)
from nbody_tpu.parallel.multihost import initialize_multihost, is_multihost

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_state",
    "choose_strategy",
    "make_sharded_step",
    "make_sharded_ds_adaptive_rollout",
    "make_sharded_ds_adaptive_rollout_2d",
    "make_sharded_ds_step",
    "make_sharded_ds_step_2d",
    "make_sharded_step_2d",
    "initialize_multihost",
    "is_multihost",
]
