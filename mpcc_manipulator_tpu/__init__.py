"""mpcc_manipulator_tpu — TPU-native MPCC engine for robot manipulators.

Top-level exports mirror the reference Python package surface
(`python/MPCC/__init__.py`) plus the TPU-native entry points.
"""

from .compat import (Exp, ExpMatrix, Integrator, Log, LogMatrix, QuatToRot,
                     RobotModel, RotToQuat, SelfCollisionNN, EnvCollisionNN,
                     getInverseSkewVector, getSkewMatrix)
from .config import N, NPC, NU, NX, PANDA_DOF, PANDA_NUM_LINKS

__all__ = [
    "MPCC", "RobotModel", "SelfCollisionNN", "EnvCollisionNN", "Integrator",
    "getSkewMatrix", "getInverseSkewVector", "LogMatrix", "ExpMatrix",
    "Log", "Exp", "RotToQuat", "QuatToRot",
    "N", "NX", "NU", "NPC", "PANDA_DOF", "PANDA_NUM_LINKS",
]


def __getattr__(name):
    # lazy import: api pulls in the full solver stack
    if name == "MPCC":
        from .api import MPCC
        return MPCC
    raise AttributeError(name)
