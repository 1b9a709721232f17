"""Mobile-base (Husky + Panda) kinematics: planar base + 7-DOF arm.

The reference defines this system but never activates it (`setHusky`,
`robot_model.cpp:321-352`; `setRobot` only calls `setPanda`).  This module
provides the active TPU-native kinematics for the 10-DOF chain
(BASELINE configs 4-5): generalized coordinates

    q_m = [x_b, y_b, th_b, q1..q7]        (NQ_MOBILE = 10)

with the base modeled as planar prismatic-x / prismatic-y / revolute-z
(matching the reference's virtual-joint construction) and the Panda chain
mounted at the base origin.  The full 10-DOF MPCC built on these primitives
lives in `system.HUSKY_PANDA` + the shape-generic solver stack and is
exercised end-to-end by `tests/test_mobile_mpcc.py`; this module provides
the kinematic quantities (FK, 6x10 Jacobian, manipulability).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PANDA_DOF
from .kinematics import _det_psd6, fk_chain

NQ_MOBILE = 3 + PANDA_DOF


def _base_transform(base_pose: jnp.ndarray):
    """(x_b, y_b, th_b) -> world rotation/translation of the base frame."""
    x, y, th = base_pose[0], base_pose[1], base_pose[2]
    c, s = jnp.cos(th), jnp.sin(th)
    r = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=base_pose.dtype)
    p = jnp.array([x, y, 0.0], dtype=base_pose.dtype)
    return r, p


def split_q(q_m: jnp.ndarray):
    return q_m[:3], q_m[3:]


def ee_position(q_m: jnp.ndarray) -> jnp.ndarray:
    base, q = split_q(q_m)
    rb, pb = _base_transform(base)
    p_arm, _, _, _ = fk_chain(q)
    return pb + rb @ p_arm


def ee_orientation(q_m: jnp.ndarray) -> jnp.ndarray:
    base, q = split_q(q_m)
    rb, _ = _base_transform(base)
    _, r_arm, _, _ = fk_chain(q)
    return rb @ r_arm


def ee_position_host(q_m) -> np.ndarray:
    """Mobile FK on the host CPU backend (see kinematics.ee_position_host:
    setup paths must never trigger a tunneled-TPU readback)."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(ee_position(jnp.asarray(np.asarray(q_m))))


def ee_orientation_host(q_m) -> np.ndarray:
    """Mobile EE rotation on the host CPU backend."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(ee_orientation(jnp.asarray(np.asarray(q_m))))


def ee_jacobian(q_m: jnp.ndarray) -> jnp.ndarray:
    """6x10 point Jacobian ``[Jv; Jw]`` w.r.t. [x_b, y_b, th_b, q1..q7]."""
    base, q = split_q(q_m)
    rb, pb = _base_transform(base)
    p_arm, _, origins, axes = fk_chain(q)
    p_ee = pb + rb @ p_arm

    # arm columns, rotated into world through the base
    origins_w = pb[None, :] + origins @ rb.T
    axes_w = axes @ rb.T
    jv_arm = jnp.cross(axes_w, p_ee[None, :] - origins_w).T
    jw_arm = axes_w.T

    # base columns: prismatic x, prismatic y, revolute z about the base origin
    ez = jnp.array([0.0, 0.0, 1.0], dtype=q_m.dtype)
    jv_base = jnp.stack([
        jnp.array([1.0, 0.0, 0.0], dtype=q_m.dtype),
        jnp.array([0.0, 1.0, 0.0], dtype=q_m.dtype),
        jnp.cross(ez, p_ee - pb),
    ], axis=1)
    jw_base = jnp.stack([jnp.zeros(3, q_m.dtype), jnp.zeros(3, q_m.dtype), ez],
                        axis=1)
    jv = jnp.concatenate([jv_base, jv_arm], axis=1)
    jw = jnp.concatenate([jw_base, jw_arm], axis=1)
    return jnp.concatenate([jv, jw], axis=0)


def manipulability(q_m: jnp.ndarray) -> jnp.ndarray:
    """sqrt(det(J J^T)) of the 6x10 Jacobian."""
    j = ee_jacobian(q_m)
    return jnp.sqrt(_det_psd6(j @ j.T))


manipulability_gradient = jax.grad(manipulability)
