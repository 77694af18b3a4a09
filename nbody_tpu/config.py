"""Initial-condition configuration enum.

Mirrors the reference's ``NBodyConfig`` (/root/reference/src/nbody/nbody_config.hpp:3):
three generators — uniform-ball RANDOM, rotating SHELL, radial EXPAND.
"""

import enum


class NBodyConfig(enum.Enum):
    RANDOM = "random"
    SHELL = "shell"
    EXPAND = "expand"

    @classmethod
    def parse(cls, name: str) -> "NBodyConfig":
        try:
            return cls(name.lower())
        except ValueError:
            raise ValueError(
                f"unknown initial condition {name!r}; "
                f"expected one of {[c.value for c in cls]}"
            ) from None
