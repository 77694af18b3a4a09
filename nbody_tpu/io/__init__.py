"""Host I/O: Tipsy galaxy files, checkpoints, PNG export."""

from nbody_tpu.io.tipsy import read_tipsy_file, write_tipsy_file
from nbody_tpu.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "read_tipsy_file",
    "write_tipsy_file",
    "save_checkpoint",
    "load_checkpoint",
]
