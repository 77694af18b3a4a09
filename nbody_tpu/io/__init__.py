"""Host I/O: Tipsy galaxy files, checkpoints, PNG export."""

from nbody_tpu.io.tipsy import read_tipsy_file, write_tipsy_file
from nbody_tpu.io.checkpoint import (
    load_checkpoint,
    load_checkpoint_ds_planes,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)

__all__ = [
    "read_tipsy_file",
    "write_tipsy_file",
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_ds_planes",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
]
