"""Panda FK / Jacobian / manipulability — independent numpy implementation.

Chain data transcribed from the reference's hard-coded RBDL model
(`robot_model.cpp:68-319`, `setPanda`): per-body joint frame (rotation E,
translation r relative to the parent), revolute joints 1..7 about the local
z axis, then the fixed hand (Rz(+45deg), +0.107 z on link7) and hand-tcp
(+0.1034 z on the hand).  The EE frame is `panda_hand_tcp`
(`robot_model.cpp:316-318`).

RBDL conventions mirrored here: ``SpatialTransform(E, r)`` places the child
frame at parent-coordinates ``r`` with ``E`` mapping parent coordinates into
child coordinates, so the world rotation accumulates as
``R_child = R_parent @ E.T`` (`CalcBodyWorldOrientation` returns the inverse
map; the reference transposes it back, `robot_model.cpp:396`).
``CalcPointJacobian6D`` columns are ``[w; v]``; the reference reorders to
``[v; w]`` (`robot_model.cpp:361-364`).
"""

from __future__ import annotations

import numpy as np

# joint frame translations r_i (in the parent frame), links 1..7
_R_OFFSETS = np.array([
    [0.0, 0.0, 0.333],      # link0 -> link1
    [0.0, 0.0, 0.0],        # link1 -> link2
    [0.0, -0.316, 0.0],     # link2 -> link3
    [0.0825, 0.0, 0.0],     # link3 -> link4
    [-0.0825, 0.384, 0.0],  # link4 -> link5
    [0.0, 0.0, 0.0],        # link5 -> link6
    [0.088, 0.0, 0.0],      # link6 -> link7
])

def _rx(c, s):
    return np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])

# joint frame rotations E_i (parent -> child coordinates), links 1..7,
# transcribed row-for-row from `robot_model.cpp:188-236`
_E = np.stack([
    np.eye(3),              # link0 -> link1
    _rx(0.0, 1.0),          # link1 -> link2: [[1,0,0],[0,0,-1],[0,1,0]]
    _rx(0.0, -1.0),         # link2 -> link3: [[1,0,0],[0,0,1],[0,-1,0]]
    _rx(0.0, -1.0),         # link3 -> link4
    _rx(0.0, 1.0),          # link4 -> link5
    _rx(0.0, -1.0),         # link5 -> link6
    _rx(0.0, -1.0),         # link6 -> link7
])

# The reference hard-codes the hand rotation as the rounded literal
# 0.707107 (`robot_model.cpp:238-241`), ~3e-7 off a true 45-degree
# rotation; the production kinematics uses the exact value, so the oracle
# does too (using the literal shifts heading-cost Hessian blocks by ~1e-3,
# measured) — the rounding is reference data noise, not semantics.
_SQ2 = np.sqrt(0.5)
_E_HAND = np.array([[_SQ2, -_SQ2, 0.0], [_SQ2, _SQ2, 0.0], [0.0, 0.0, 1.0]])
_R_HAND = np.array([0.0, 0.0, 0.107])
_R_TCP = np.array([0.0, 0.0, 0.1034])


def _rz(q):
    c, s = np.cos(q), np.sin(q)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def fk_frames(q: np.ndarray):
    """World position & rotation of joint frames 1..7 plus the EE (tcp).

    Returns (p_joints (7,3), z_axes (7,3), p_ee (3,), R_ee (3,3)).
    ``z_axes[i]`` is the world direction of revolute joint i+1's axis.
    """
    q = np.asarray(q, dtype=np.float64)
    p = np.zeros(3)
    r = np.eye(3)
    p_j = np.zeros((7, 3))
    z_j = np.zeros((7, 3))
    for i in range(7):
        p = p + r @ _R_OFFSETS[i]
        r = r @ _E[i].T
        p_j[i] = p
        z_j[i] = r[:, 2]
        r = r @ _rz(q[i])
    p_ee = p + r @ _R_HAND
    r_ee = r @ _E_HAND.T
    p_ee = p_ee + r_ee @ _R_TCP
    return p_j, z_j, p_ee, r_ee


def ee_pose(q: np.ndarray):
    _, _, p_ee, r_ee = fk_frames(q)
    return p_ee, r_ee


def jacobian(q: np.ndarray) -> np.ndarray:
    """6x7 point Jacobian at the EE origin, rows ``[Jv; Jw]``."""
    p_j, z_j, p_ee, _ = fk_frames(q)
    j = np.zeros((6, 7))
    for i in range(7):
        j[:3, i] = np.cross(z_j[i], p_ee - p_j[i])
        j[3:, i] = z_j[i]
    return j


def manipulability(q: np.ndarray) -> float:
    """m = sqrt(det(J J^T)) (`robot_model.cpp:431-435`)."""
    j = jacobian(q)
    return float(np.sqrt(max(np.linalg.det(j @ j.T), 0.0)))


def d_manipulability(q: np.ndarray) -> np.ndarray:
    """Central finite difference, delta = 1e-4 (`robot_model.cpp:437-450`)."""
    delta = 1e-4
    g = np.zeros(7)
    for i in range(7):
        dq = np.zeros(7)
        dq[i] = delta
        g[i] = (manipulability(q + dq) - manipulability(q - dq)) / (2 * delta)
    return g
