"""Rigid-body dynamics for the Panda: mass matrix and nonlinear effects.

API parity with the reference `RobotModel::getMassMatrix` /
`getNonlinearEffect` (`robot_model.cpp:404-415`, RBDL
CompositeRigidBodyAlgorithm / NonlinearEffects).  The MPC itself never uses
these (the plant is kinematic), but they complete the robot-model surface
for torque-level consumers.

Implementation: composite-rigid-body algorithm (CRBA) for M(q) and a
recursive Newton-Euler pass (RNEA with qddot = 0) for the nonlinear effects
C(q, qd) qd + g(q), in link coordinates, gravity (0, 0, -9.81).

Inertial constants are the public Franka Panda link parameters (same
physical data the reference hard-codes, `robot_model.cpp:70-160`).  Fixed
bodies (hand, fingers, TCP) are merged into link 7's composite inertia.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import PANDA_DOF
from .kinematics import _P_OFF, _R_OFF

# Public Franka link inertial data: mass, COM (link frame), inertia @ COM.
_MASS = np.array([4.97068, 0.646926, 3.2286, 3.5879, 1.22595, 1.66656,
                  0.735522])
_COM = np.array([
    [0.003875, 0.002081, -0.04762],
    [-0.003141, -0.02872, 0.003495],
    [2.7518e-02, 3.9252e-02, -6.6502e-02],
    [-5.317e-02, 1.04419e-01, 2.7454e-02],
    [-1.1953e-02, 4.1065e-02, -3.8437e-02],
    [6.0149e-02, -1.4117e-02, -1.0517e-02],
    [1.0517e-02, -4.252e-03, 6.1597e-02],
])
_INERTIA = np.array([
    [[0.70337, -0.000139, 0.006772], [-0.000139, 0.70661, 0.019169],
     [0.006772, 0.019169, 0.009117]],
    [[0.007962, -0.003925, 0.010254], [-0.003925, 0.02811, 0.000704],
     [0.010254, 0.000704, 0.025995]],
    [[0.037242, -0.004761, -0.011396], [-0.004761, 0.036155, -0.012805],
     [-0.011396, -0.012805, 0.01083]],
    [[0.025853, 0.007796, -0.001332], [0.007796, 0.019552, 0.008641],
     [-0.001332, 0.008641, 0.028323]],
    [[0.035549, -0.002117, -0.004037], [-0.002117, 0.029474, 0.000229],
     [-0.004037, 0.000229, 0.008627]],
    [[0.001964, 0.000109, -0.001158], [0.000109, 0.004354, 0.000341],
     [-0.001158, 0.000341, 0.005433]],
    [[0.012516, -0.000428, -0.001196], [-0.000428, 0.010027, -0.000741],
     [-0.001196, -0.000741, 0.004815]],
])

# hand + fingers + TCP, rigidly attached to link 7
_C45 = math.sqrt(0.5)
_R_L7_HAND = np.array([[_C45, _C45, 0.0], [-_C45, _C45, 0.0], [0.0, 0.0, 1.0]])
_P_L7_HAND = np.array([0.0, 0.0, 0.107])
_HAND_MASS = 0.73 + 0.015 + 0.015
_HAND_COM_H = np.array([-0.01, 0.0, 0.03])    # hand-frame COM (hand body)
_HAND_INERTIA_H = np.diag([0.001, 0.0025, 0.0017])
_FINGER_P = np.array([0.0, 0.0, 0.0584])
_FINGER_I = np.diag([2.375e-06, 2.375e-06, 7.5e-07])

_GRAVITY = np.array([0.0, 0.0, -9.81])


def _merge_hand_into_link7():
    """Fold the fixed hand/finger bodies into link 7's inertial data."""
    def to_l7(mass, com_h, inertia_h):
        com7 = _P_L7_HAND + _R_L7_HAND @ com_h
        i7 = _R_L7_HAND @ inertia_h @ _R_L7_HAND.T
        return mass, com7, i7

    bodies = [(_MASS[6], _COM[6], _INERTIA[6]),
              to_l7(0.73, _HAND_COM_H, _HAND_INERTIA_H),
              to_l7(0.015, _FINGER_P, _FINGER_I),
              to_l7(0.015, _FINGER_P, _FINGER_I)]
    m_tot = sum(b[0] for b in bodies)
    com_tot = sum(b[0] * b[1] for b in bodies) / m_tot
    i_tot = np.zeros((3, 3))
    for m, c, i in bodies:
        d = c - com_tot
        i_tot += i + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    return m_tot, com_tot, i_tot


_M7, _COM7, _I7 = _merge_hand_into_link7()
_MASS_EFF = np.concatenate([_MASS[:6], [_M7]])
_COM_EFF = np.concatenate([_COM[:6], _COM7[None]], axis=0)
_INERTIA_EFF = np.concatenate([_INERTIA[:6], _I7[None]], axis=0)


def _frames(q: jnp.ndarray):
    """World rotation/origin of each link frame 1..7."""
    dtype = q.dtype
    r = jnp.eye(3, dtype=dtype)
    p = jnp.zeros(3, dtype=dtype)
    rs, ps = [], []
    r_off = jnp.asarray(_R_OFF, dtype=dtype)
    p_off = jnp.asarray(_P_OFF, dtype=dtype)
    for i in range(PANDA_DOF):
        c, s = jnp.cos(q[i]), jnp.sin(q[i])
        rz = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=dtype)
        rz = rz.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
        p = p + r @ p_off[i]
        r = r @ r_off[i] @ rz
        rs.append(r)
        ps.append(p)
    return rs, ps


def mass_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """7x7 joint-space mass matrix via CRBA in world coordinates."""
    dtype = q.dtype
    rs, ps = _frames(q)
    axes = []
    origins = []
    # spatial inertia of each link about the world origin
    def spatial_inertia(i):
        r, p = rs[i], ps[i]
        m = jnp.asarray(_MASS_EFF[i], dtype=dtype)
        com_w = p + r @ jnp.asarray(_COM_EFF[i], dtype=dtype)
        i_com_w = r @ jnp.asarray(_INERTIA_EFF[i], dtype=dtype) @ r.T
        cx = jnp.array([[0.0, -com_w[2], com_w[1]],
                        [com_w[2], 0.0, -com_w[0]],
                        [-com_w[1], com_w[0], 0.0]], dtype=dtype)
        top_left = i_com_w + m * cx @ cx.T
        return jnp.block([[top_left, m * cx],
                          [m * cx.T, m * jnp.eye(3, dtype=dtype)]])

    for i in range(PANDA_DOF):
        axes.append(rs[i][:, 2])
        origins.append(ps[i])

    # motion subspace of joint i in world 6D (angular; linear = o_i x w)
    s_cols = []
    for i in range(PANDA_DOF):
        w = axes[i]
        v = jnp.cross(origins[i], w)
        s_cols.append(jnp.concatenate([w, v]))
    s_mat = jnp.stack(s_cols, axis=1)  # (6, 7)

    # composite inertia: I_c[i] = sum_{j >= i} I_j  (chain structure)
    inertias = [spatial_inertia(i) for i in range(PANDA_DOF)]
    comp = [None] * PANDA_DOF
    acc = jnp.zeros((6, 6), dtype=dtype)
    for i in range(PANDA_DOF - 1, -1, -1):
        acc = acc + inertias[i]
        comp[i] = acc

    m_out = jnp.zeros((PANDA_DOF, PANDA_DOF), dtype=dtype)
    for i in range(PANDA_DOF):
        fi = comp[i] @ s_mat[:, i]
        for j in range(i + 1):
            m_out = m_out.at[i, j].set(jnp.dot(s_mat[:, j], fi))
            m_out = m_out.at[j, i].set(jnp.dot(s_mat[:, j], fi))
    return m_out


def nonlinear_effects(q: jnp.ndarray, qdot: jnp.ndarray) -> jnp.ndarray:
    """C(q, qd) qd + g(q) via autodiff of energy (equivalent to RNEA with
    qddot = 0): tau_nle = d/dt (dL/dqd) - dL/dq with qdd = 0."""
    import jax

    def kinetic(qq, qd):
        return 0.5 * qd @ mass_matrix(qq) @ qd

    def potential(qq):
        rs, ps = _frames(qq)
        g = jnp.asarray(_GRAVITY, dtype=qq.dtype)
        u = 0.0
        for i in range(PANDA_DOF):
            com_w = ps[i] + rs[i] @ jnp.asarray(_COM_EFF[i], dtype=qq.dtype)
            u = u - _MASS_EFF[i] * jnp.dot(g, com_w)
        return u

    # tau = M qdd + C qd + g; with qdd = 0:
    # C qd + g = dM/dq-terms + dU/dq  (Christoffel via AD)
    dm_dq = jax.jacfwd(mass_matrix)(q)          # (7, 7, 7)
    m_dot = jnp.einsum("ijk,k->ij", dm_dq, qdot)
    dT_dq = 0.5 * jnp.einsum("jki,j,k->i", dm_dq, qdot, qdot)
    coriolis = m_dot @ qdot - dT_dq
    grav = jax.grad(potential)(q)
    return coriolis + grav
