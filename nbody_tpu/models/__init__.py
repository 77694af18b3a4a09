"""Body systems: device-resident simulation state + stepping."""

from nbody_tpu.models.body_system import BodySystem

__all__ = ["BodySystem"]
