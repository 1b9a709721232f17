"""Reference-compatible convenience classes and SO(3) helper functions.

Mirrors the surface of the reference Python package (`python/MPCC/*.py`):
``RobotModel``, ``SelfCollisionNN``, ``EnvCollisionNN``, ``Integrator`` and
the free functions ``getSkewMatrix`` / ``getInverseSkewVector`` /
``LogMatrix`` / ``ExpMatrix`` / ``Log`` / ``Exp`` / ``RotToQuat`` /
``QuatToRot`` — numpy-in / numpy-out wrappers over the JAX core so existing
reference user code ports with an import change.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import NU, NX, PANDA_DOF
from .models import collision_nn as cnn
from .models import dynamics as dyn
from .models import kinematics as kin
from .utils import so3

# ------------------------------------------------------------------
# SO(3) free functions (reference `python/MPCC/utils.py`)
# ------------------------------------------------------------------


def getSkewMatrix(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v)
    assert v.size == 3
    return np.asarray(so3.hat(jnp.asarray(v, dtype=jnp.float64)))


def getInverseSkewVector(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m)
    assert m.shape == (3, 3)
    return np.asarray(so3.vee(jnp.asarray(m, dtype=jnp.float64)))


def LogMatrix(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r)
    assert r.shape == (3, 3)
    return np.asarray(so3.log_rot(jnp.asarray(r, dtype=jnp.float64)))


def ExpMatrix(sk: np.ndarray) -> np.ndarray:
    sk = np.asarray(sk)
    assert sk.shape == (3, 3)
    return np.asarray(so3.exp_rot(so3.vee(jnp.asarray(sk, dtype=jnp.float64))))


def Log(r: np.ndarray) -> np.ndarray:
    return getInverseSkewVector(LogMatrix(r))


def Exp(v: np.ndarray) -> np.ndarray:
    return ExpMatrix(getSkewMatrix(v))


def RotToQuat(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r)
    assert r.shape == (3, 3)
    return np.asarray(so3.rot_to_quat(jnp.asarray(r, dtype=jnp.float64)))


def QuatToRot(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q)
    assert q.shape == (4,)
    return np.asarray(so3.quat_to_rot(jnp.asarray(q, dtype=jnp.float64)))


# ------------------------------------------------------------------
# Wrapper classes
# ------------------------------------------------------------------


class RobotModel:
    """Reference `python/MPCC/robot_model.py` surface."""

    def __init__(self):
        self.num_q = PANDA_DOF

    def _q(self, joint_angle):
        q = np.asarray(joint_angle)
        assert q.size == self.num_q, f"Joint angle size {q.size} != {self.num_q}"
        return jnp.asarray(q, dtype=jnp.float64)

    def getEEJacobian(self, joint_angle):
        return np.asarray(kin.ee_jacobian(self._q(joint_angle)))

    def getEEJacobianv(self, joint_angle):
        return np.asarray(kin.ee_jacobian(self._q(joint_angle))[:3])

    def getEEJacobianw(self, joint_angle):
        return np.asarray(kin.ee_jacobian(self._q(joint_angle))[3:])

    def getEEPosition(self, joint_angle):
        return np.asarray(kin.ee_position(self._q(joint_angle)))

    def getEEOrientation(self, joint_angle):
        return np.asarray(kin.ee_orientation(self._q(joint_angle)))

    def getEEManipulability(self, joint_angle):
        return float(kin.manipulability(self._q(joint_angle)))

    def getDManipulability(self, joint_angle):
        return np.asarray(kin.manipulability_gradient_fd(self._q(joint_angle)))

    def getMassMatrix(self, joint_angle):
        from .models import rigid_body
        return np.asarray(rigid_body.mass_matrix(self._q(joint_angle)))

    def getNonlinearEffect(self, joint_angle, joint_velocity):
        from .models import rigid_body
        qd = jnp.asarray(np.asarray(joint_velocity), dtype=jnp.float64)
        return np.asarray(rigid_body.nonlinear_effects(self._q(joint_angle), qd))


class _CollisionNN:
    def __init__(self, loader, expected_input):
        self._loader = loader
        self._params = None
        self.input_size = expected_input

    def setNeuralNetwork(self, input_size, output_size, hidden_layer_size, is_nerf):
        """Kept for signature parity; the architecture is fixed by the
        weight files, so this just (re)loads them."""
        assert input_size == self.input_size
        self._params = self._loader()

    def _ensure(self):
        if self._params is None:
            self._params = self._loader()
        return self._params

    def calculateMlpOutput(self, input, time_verbose: bool = False):
        x = np.asarray(input)
        assert x.size == self.input_size, f"Input size {x.size} != {self.input_size}"
        y, jac = cnn.mlp_forward_jacobian(self._ensure(),
                                          jnp.asarray(x, dtype=jnp.float64))
        return np.asarray(y), np.asarray(jac)


class SelfCollisionNN(_CollisionNN):
    """Reference `python/MPCC/self_collision_nn.py` surface.  Returns
    ``(min_dist_scalar, jacobian)`` like the reference wrapper."""

    def __init__(self, model_path: str = None):
        super().__init__(cnn.load_self_collision_nn, PANDA_DOF)

    def calculateMlpOutput(self, input, time_verbose: bool = False):
        y, jac = super().calculateMlpOutput(input, time_verbose)
        return y, jac


class EnvCollisionNN(_CollisionNN):
    """Reference `python/MPCC/env_collision_nn.py` surface."""

    def __init__(self, model_path: str = None):
        super().__init__(cnn.load_env_collision_nn, PANDA_DOF + 3)


class Integrator:
    """Reference `python/MPCC/integrator.py` surface (RK4 plant at 1 ms)."""

    def __init__(self, ts: float = 0.01):
        self.Ts = ts

    def simTimeStep(self, state, input, time_step: float = None):
        x = np.asarray(state)
        u = np.asarray(input)
        assert x.size == NX and u.size == NU
        ts = time_step if time_step else self.Ts
        return np.asarray(dyn.sim_time_step(
            jnp.asarray(x, dtype=jnp.float64),
            jnp.asarray(u, dtype=jnp.float64), ts))

    def RK4(self, state, input, ts: float):
        return np.asarray(dyn.rk4_step(
            jnp.asarray(state, dtype=jnp.float64),
            jnp.asarray(input, dtype=jnp.float64), ts))

    def EF(self, state, input, ts: float):
        return np.asarray(dyn.euler_step(
            jnp.asarray(state, dtype=jnp.float64),
            jnp.asarray(input, dtype=jnp.float64), ts))
