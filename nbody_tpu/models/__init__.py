"""Body systems: device-resident simulation state + stepping."""

from nbody_tpu.models.body_system import BodySystem
from nbody_tpu.models.ds_system import DSBodySystem

__all__ = ["BodySystem", "DSBodySystem"]
