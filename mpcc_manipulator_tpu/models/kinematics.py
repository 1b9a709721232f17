"""Franka Panda forward kinematics, Jacobian, and manipulability in pure JAX.

The reference builds an RBDL rigid-body chain from hard-coded frame data
(`cpp/src/Model/robot_model.cpp:68-319`) and queries FK / 6x7 point Jacobian /
manipulability per horizon knot.  Here the same physical chain (public Franka
Panda URDF frame constants) is expressed as static numpy tables and the
kinematics is a short unrolled JAX chain — jit/vmap-friendly, differentiable,
and batchable over (scenarios x knots) in one shot.

Frame convention: each joint i contributes a fixed parent<-child transform
``(R_off[i], p_off[i])`` followed by a revolute rotation ``Rz(q_i)``; after
joint 7 a fixed flange->hand->TCP transform yields the end-effector frame
(the reference's ``panda_hand_tcp`` body, `robot_model.cpp:314-319`).

The manipulability gradient defaults to the reference's central finite
difference with delta=1e-4 (`robot_model.cpp:437-450`) for conformance; an
exact autodiff version is provided as well.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PANDA_DOF

# Fixed parent<-child rotations for joints 1..7 (transpose of the RBDL
# spatial-transform E matrices; equal to the URDF rpy rotations).
_RX_P90 = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])   # Rx(+pi/2)
_RX_M90 = np.array([[1.0, 0, 0], [0, 0, 1], [0, -1, 0]])   # Rx(-pi/2)
_EYE = np.eye(3)

_R_OFF = np.stack([
    _EYE,       # joint 1: link0 -> link1
    _RX_M90,    # joint 2
    _RX_P90,    # joint 3
    _RX_P90,    # joint 4
    _RX_M90,    # joint 5
    _RX_P90,    # joint 6
    _RX_P90,    # joint 7
])

_P_OFF = np.array([
    [0.0, 0.0, 0.333],
    [0.0, 0.0, 0.0],
    [0.0, -0.316, 0.0],
    [0.0825, 0.0, 0.0],
    [-0.0825, 0.384, 0.0],
    [0.0, 0.0, 0.0],
    [0.088, 0.0, 0.0],
])

# flange -> hand: Rz(-45 deg), translate 0.107 along z; hand -> TCP: +0.1034 z.
_C45 = math.sqrt(0.5)
_R_HAND = np.array([[_C45, _C45, 0.0], [-_C45, _C45, 0.0], [0.0, 0.0, 1.0]])
_P_HAND = np.array([0.0, 0.0, 0.107])
_P_TCP = np.array([0.0, 0.0, 0.1034])
# combined fixed post-transform applied after joint 7
_R_POST = _R_HAND
_P_POST = _P_HAND + _R_HAND @ _P_TCP

# Per-link frame origins used for intermediate frames (link0..link7, hand):
# frame k (0-indexed link k) is the chain state after joint k.


def _rz(q):
    c, s = jnp.cos(q), jnp.sin(q)
    z = jnp.zeros_like(q)
    o = jnp.ones_like(q)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def fk_chain(q: jnp.ndarray):
    """Full chain FK.

    Returns ``(p_ee, r_ee, origins, axes)`` where ``origins``/``axes`` are
    (7, 3) world joint origins and world joint axes (for the point Jacobian).
    """
    dtype = q.dtype
    r = jnp.eye(3, dtype=dtype)
    p = jnp.zeros(3, dtype=dtype)
    origins = []
    axes = []
    r_off = jnp.asarray(_R_OFF, dtype=dtype)
    p_off = jnp.asarray(_P_OFF, dtype=dtype)
    for i in range(PANDA_DOF):
        p = p + r @ p_off[i]
        r_fixed = r @ r_off[i]
        origins.append(p)
        axes.append(r_fixed[:, 2])
        r = r_fixed @ _rz(q[i])
    p_ee = p + r @ jnp.asarray(_P_POST, dtype=dtype)
    r_ee = r @ jnp.asarray(_R_POST, dtype=dtype)
    return p_ee, r_ee, jnp.stack(origins), jnp.stack(axes)


def ee_position(q: jnp.ndarray) -> jnp.ndarray:
    """End-effector (hand TCP) position, world frame."""
    return fk_chain(q)[0]


def ee_position_host(q) -> np.ndarray:
    """FK evaluated on the host CPU backend, returning numpy.

    Setup paths (track shifting, API entry) need the EE position as host
    data.  On remote-tunneled TPU platforms a device->host readback
    permanently switches the process into a slow synchronous dispatch mode
    (~25-35 ms per blocked launch; see docs/ARCHITECTURE.md "remote-TPU
    dispatch gotcha"), so setup-time FK runs on the CPU backend instead.
    ``q`` must be host data (numpy / list), never a TPU-resident array.

    Multi-process note: under `jax.distributed`, ``jax.devices("cpu")[0]``
    is the GLOBAL first CPU device — non-addressable from every process but
    0, and fetching the result would fail there.  Always use this process's
    own device.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(ee_position(jnp.asarray(np.asarray(q))))


def ee_orientation(q: jnp.ndarray) -> jnp.ndarray:
    """End-effector rotation matrix, world frame."""
    return fk_chain(q)[1]


def ee_jacobian(q: jnp.ndarray) -> jnp.ndarray:
    """6x7 point Jacobian ``[Jv; Jw]`` of the TCP (reference row order after
    the swap in `robot_model.cpp:354-377`)."""
    p_ee, _, origins, axes = fk_chain(q)
    jv = jnp.cross(axes, p_ee[None, :] - origins).T   # (3, 7)
    jw = axes.T                                        # (3, 7)
    return jnp.concatenate([jv, jw], axis=0)


def _det_psd6(a: jnp.ndarray) -> jnp.ndarray:
    """Determinant of a 6x6 symmetric PSD matrix via an unrolled Cholesky.

    ``jnp.linalg.det`` lowers to an LU custom call that is latency-bound on
    TPU (and unsupported in f64 there); this unrolled LDL-style recursion is
    ~30 fused elementwise ops and batches perfectly under vmap.  Returns 0
    for singular input (clamped pivots).
    """
    det = jnp.ones((), dtype=a.dtype)
    m = a
    for i in range(6):
        pivot = m[0, 0]
        det = det * pivot
        safe = jnp.where(pivot > 1e-30, pivot, 1.0)
        if i < 5:
            col = m[1:, 0]
            m = m[1:, 1:] - jnp.outer(col, col) / safe
    return jnp.clip(det, 0.0, None)


def manipulability(q: jnp.ndarray) -> jnp.ndarray:
    """Yoshikawa manipulability ``sqrt(det(J J^T))`` of the 6x7 TCP Jacobian."""
    j = ee_jacobian(q)
    return jnp.sqrt(_det_psd6(j @ j.T))


def manipulability_gradient_fd(q: jnp.ndarray, delta: float = 1e-4) -> jnp.ndarray:
    """Central finite-difference gradient of manipulability (reference
    `dManipulability`, delta=1e-4) evaluated as one batched FK sweep."""
    eye = jnp.eye(PANDA_DOF, dtype=q.dtype) * delta
    qs = jnp.concatenate([q[None, :] + eye, q[None, :] - eye], axis=0)  # (14, 7)
    m = jax.vmap(manipulability)(qs)
    return (m[:PANDA_DOF] - m[PANDA_DOF:]) / (2.0 * delta)


manipulability_gradient_ad = jax.grad(manipulability)


def _cholesky6(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled lower Cholesky of a 6x6 PD matrix (damped, clamped pivots).

    Near a kinematic singularity A = J J' is rank-deficient; a raw 1e-30
    pivot floor lets A^-1 J reach ~1e15-scale intermediates that overflow
    in float32 (the production dtype) and NaN the analytic manipulability
    gradient where the fd/ad paths merely degrade (ADVICE r3).  A
    trace-scaled Tikhonov shift plus a dtype-relative pivot floor keeps the
    solve finite: the gradient then degrades smoothly toward zero exactly
    like the damped least-squares solves used elsewhere in the stack.
    """
    n = 6
    eps = jnp.finfo(a.dtype).eps
    scale = jnp.trace(a) / n + eps
    m = a + (10.0 * eps * scale) * jnp.eye(n, dtype=a.dtype)
    floor = eps * scale
    cols = []
    for j in range(n):
        dgj = jnp.sqrt(jnp.maximum(m[j, j], floor))
        col = m[:, j].at[:j].set(0.0) / dgj
        cols.append(col)
        if j < n - 1:
            m = m - jnp.outer(col, col)
    return jnp.stack(cols, axis=1)


def _cho_solve6(l_mat: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') X = rhs for 6x6 lower L, rhs (6, k) — unrolled."""
    n = 6
    ys = []
    for i in range(n):
        acc = rhs[i]
        for j in range(i):
            acc = acc - l_mat[i, j] * ys[j]
        ys.append(acc / l_mat[i, i])
    xs = [None] * n
    for i in reversed(range(n)):
        acc = ys[i]
        for j in range(i + 1, n):
            acc = acc - l_mat[j, i] * xs[j]
        xs[i] = acc / l_mat[i, i]
    return jnp.stack(xs, axis=0)


def jacobian_derivative(p_ee: jnp.ndarray, origins: jnp.ndarray,
                        axes: jnp.ndarray) -> jnp.ndarray:
    """Closed-form dJ/dq of the 6x7 point Jacobian: (7, 6, 7), entry
    ``[i, :, j] = d(J column j)/dq_i``.

    Revolute serial chain identities (world frame; z_j = joint axes,
    p_j = joint origins, p_e = EE):

      Jv_j = z_j x (p_e - p_j),   Jw_j = z_j
      dz_j/dq_i  = z_i x z_j            (i < j, else 0)
      dp_j/dq_i  = z_i x (p_j - p_i)    (i < j, else 0)
      dp_e/dq_i  = z_i x (p_e - p_i) = Jv_i

      d(Jv_j)/dq_i = (z_i x z_j) x (p_e - p_j) + z_j x (z_i x (p_e - p_j))   (i < j)
                   = z_j x Jv_i                                              (i >= j)
      d(Jw_j)/dq_i = z_i x z_j  (i < j, else 0)
    """
    dof = axes.shape[0]
    re = p_ee[None, :] - origins                    # (dof, 3): p_e - p_j
    jv_cols = jnp.cross(axes, re)                   # (dof, 3) = Jv columns
    z_i = axes[:, None, :]                          # (i, 1, 3)
    z_j = axes[None, :, :]                          # (1, j, 3)
    re_j = re[None, :, :]                           # (1, j, 3)
    zixzj = jnp.cross(z_i, z_j)                     # (i, j, 3)
    lt = (jnp.arange(dof)[:, None] < jnp.arange(dof)[None, :])[..., None]
    djv_lt = jnp.cross(zixzj, re_j) + jnp.cross(z_j, jnp.cross(z_i, re_j))
    djv_ge = jnp.cross(z_j, jv_cols[:, None, :])    # (i, j, 3): z_j x Jv_i
    djv = jnp.where(lt, djv_lt, djv_ge)             # (i, j, 3)
    djw = jnp.where(lt, zixzj, 0.0)                 # (i, j, 3)
    # -> (i, 6, j): rows [dJv; dJw] per column j
    return jnp.concatenate(
        [jnp.swapaxes(djv, 1, 2), jnp.swapaxes(djw, 1, 2)], axis=1)


def manipulability_and_grad_from_frames(p_ee: jnp.ndarray,
                                        origins: jnp.ndarray,
                                        axes: jnp.ndarray):
    """(m, dm/dq) from an already-computed FK pass (frame sharing for
    RobotData, which needs the frames anyway)."""
    jv = jnp.cross(axes, p_ee[None, :] - origins).T
    j = jnp.concatenate([jv, axes.T], axis=0)       # (6, 7)
    a = j @ j.T
    m = jnp.sqrt(_det_psd6(a))
    dj = jacobian_derivative(p_ee, origins, axes)   # (7, 6, 7)
    ainv_j = _cho_solve6(_cholesky6(a), j)          # (6, 7)
    dm = m * jnp.einsum("ibc,bc->i", dj, ainv_j)
    return m, dm


def manipulability_and_grad_analytic(q: jnp.ndarray):
    """(m, dm/dq) in closed form — exact (equals the AD gradient to
    roundoff) at a fraction of the cost: one FK pass, a (7, 6, 7) cross-
    product tensor, one 6x6 Cholesky solve.

      dm/dq_i = m/2 tr(A^-1 dA_i) = m tr(A^-1 dJ_i J'),  A = J J'
              = m sum_{b,c} dJ_i[b, c] (A^-1 J)[b, c]
    """
    p_ee, _, origins, axes = fk_chain(q)
    return manipulability_and_grad_from_frames(p_ee, origins, axes)


def ee_velocity(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Linear EE velocity ``Jv(q) @ dq``."""
    return ee_jacobian(q)[:3] @ dq
