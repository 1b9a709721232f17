"""Dense QP assembly: stage blocks -> (P, q, A, l, u) in normalized space.

Reproduces the reference QP layout exactly (`osqp_interface.cpp:129-396`):

  decision vector  z = [x_0..x_N, u_0..u_{N-1}]              (N_var = 179)
  rows             [ equality (99) | bounds (259) | polytopic (121) ]

with the state/input normalization T_x/T_u folded into every block, the
cross-knot smoothness cost ``r_ddq ||u_{i+1}-u_i||^2`` assembled into the
u-part of the Hessian/gradient, and the ddq rate rows (including the
current-input coupling at i = 0).

TPU-first mechanics: all per-knot quantities come from **one vmapped sweep**
over the horizon (cost, constraints, bounds), then land in the dense matrices
via precomputed static index grids (single scatters — no Python-loop
tracing).  The dense 179x179 / 479x179 matrices are small enough that the
structured sparsity isn't worth exploiting at this size on the MXU; the ADMM
solver consumes them directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (INF, N, N_CONSTR, N_EQ, N_INEQB, N_INEQP, N_VAR, NPC,
                      NU, NX, PANDA_DOF, input_offset, state_offset)
from ..params import MPCCParams
from ..system import PANDA, System
from ..splines.arc_length import TrackSpline
from .constraints import stage_constraints, state_bounds
from .cost import stage_cost
from .robot_data import RobotData, index_robot_data

# ------------------------------------------------------------------
# Static index grids (numpy, computed once at import)
# ------------------------------------------------------------------


def _block_grid(row0: np.ndarray, col0: np.ndarray, h: int, w: int):
    """(K, h, w) row/col index grids for K dense blocks at given offsets."""
    r = row0[:, None, None] + np.arange(h)[None, :, None]
    c = col0[:, None, None] + np.arange(w)[None, None, :]
    return np.broadcast_to(r, (len(row0), h, w)), np.broadcast_to(c, (len(row0), h, w))


_X_OFF = np.array([state_offset(k) for k in range(N + 1)])
_U_OFF = np.array([input_offset(k) for k in range(N)])

# Hessian blocks
_HXX = _block_grid(_X_OFF, _X_OFF, NX, NX)
_HUU = _block_grid(_U_OFF, _U_OFF, NU, NU)
_HXU = _block_grid(_X_OFF[:N], _U_OFF, NX, NU)
_HUX = _block_grid(_U_OFF, _X_OFF[:N], NU, NX)
_HUU_OFFDIAG = _block_grid(_U_OFF[:N - 1], _U_OFF[1:], NU, NU)   # (u_i, u_{i+1})
_HUU_OFFDIAG_T = _block_grid(_U_OFF[1:], _U_OFF[:N - 1], NU, NU)

# Equality rows: row block i couples x_{i-1}, x_i, u_{i-1}
_EQ_ROW = np.array([NX * k for k in range(N + 1)])
_EQ_AXPREV = _block_grid(_EQ_ROW[1:], _X_OFF[:N], NX, NX)
_EQ_AX = _block_grid(_EQ_ROW, _X_OFF, NX, NX)
_EQ_BU = _block_grid(_EQ_ROW[1:], _U_OFF, NX, NU)

# Bound rows.  NOTE deliberate deviation: the reference writes the
# input-box Jacobian identity into columns ``NU*i``
# (`osqp_interface.cpp:273`) — i.e. misaligned into the *state* region of z
# (stride 8 against the 9-wide x blocks), so its input-bound rows actually
# constrain a shifting window of state deltas around the value u_i.  That is
# an indexing bug, not a modeling choice; we place the identity on the input
# columns (the evident intent, and what the row VALUES u_i/l_u/u_u mean).
_BX_ROW = np.array([N_EQ + NX * k for k in range(N + 1)])
_BU_ROW = np.array([N_EQ + NX * (N + 1) + NU * k for k in range(N)])
_BDDQ_ROW = np.array([N_EQ + NX * (N + 1) + NU * N + NU * k for k in range(N)])
_BX = _block_grid(_BX_ROW, _X_OFF, NX, NX)
_BU = _block_grid(_BU_ROW, _U_OFF, NU, NU)
_BDDQ_UI = _block_grid(_BDDQ_ROW, _U_OFF, PANDA_DOF, PANDA_DOF)
_BDDQ_UIM1 = _block_grid(_BDDQ_ROW[1:], _U_OFF[:N - 1], PANDA_DOF, PANDA_DOF)

# Polytopic rows
_P_ROW = np.array([N_EQ + N_INEQB + NPC * k for k in range(N + 1)])
_P_CX = _block_grid(_P_ROW, _X_OFF, NPC, NX)
_P_CU = _block_grid(_P_ROW[:N], _U_OFF, NPC, NU)


# ------------------------------------------------------------------
# Decision-vector helpers
# ------------------------------------------------------------------


def split_z(z: jnp.ndarray, system: System = PANDA):
    """z (n_var,) -> xs (N+1, nx), us (N, nu)."""
    nx, nu, n = system.nx, system.nu, system.horizon
    xs = z[:nx * (n + 1)].reshape(n + 1, nx)
    us = z[nx * (n + 1):].reshape(n, nu)
    return xs, us


def join_z(xs: jnp.ndarray, us: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([xs.reshape(-1), us.reshape(-1)])


def us_padded(us: jnp.ndarray) -> jnp.ndarray:
    """(N+1, nu) inputs with a zero terminal input (cost at knot N sees u=0,
    matching the reference which never stores u_N)."""
    return jnp.concatenate([us, jnp.zeros((1, us.shape[1]), dtype=us.dtype)],
                           axis=0)


# Host-side (numpy) constants, deliberately NOT jnp: a module-level device
# array would be captured by every trace as a committed device buffer, which
# on the tunneled-TPU backend permanently flips the process into slow
# synchronous dispatch (docs/ARCHITECTURE.md "remote-TPU dispatch gotcha").
_IS_TERMINAL = np.arange(N + 1) == N


def _is_terminal(n: int) -> np.ndarray:
    """Per-knot terminal mask for an ``n``-stage horizon (host numpy)."""
    return np.arange(n + 1) == n


# ------------------------------------------------------------------
# Objective / constraint values (no derivatives): line-search evaluations
# ------------------------------------------------------------------


def total_objective(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                    params: MPCCParams, exact_heading_jac: bool = False,
                    system: System = PANDA) -> jnp.ndarray:
    """Scalar objective including the ddq smoothness term
    (`setCost` obj path, `osqp_interface.cpp:132-175`)."""
    n = system.horizon
    xs, us = split_z(z, system)
    up = us_padded(us)
    objs = jax.vmap(
        lambda x, u, k, t: stage_cost(track, x, u, index_robot_data(rb, k), t,
                                      params, exact_heading_jac,
                                      with_derivatives=False, system=system)
    )(xs, up, jnp.arange(n + 1), _is_terminal(n))
    obj = jnp.sum(objs)
    ddq = us[1:, :system.dof] - us[:-1, :system.dof]
    obj = obj + params.cost.r_ddq * jnp.sum(ddq * ddq)
    return obj


def constraint_values(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                      params: MPCCParams, current_u: jnp.ndarray, ts,
                      system: System = PANDA):
    """(constr, l, u) stacked over all rows, value-only
    (`setConstraints` without Jacobians) — used by the filter line search."""
    dtype = z.dtype
    dof, nx, nu, n = system.dof, system.nx, system.nu, system.horizon
    xs, us = split_z(z, system)
    up = us_padded(us)

    # equality: defect d_i = T_x_inv (x_i - (Ad x_{i-1} + Bd u_{i-1} + gd));
    # row 0 pins x_0 with value 0
    tx_inv = params.normalization.t_x_inv
    ad, bd = _discrete_ab(ts, dtype, system)
    pred = xs[:-1] @ ad.T + us @ bd.T
    defect = (xs[1:] - pred) * tx_inv[None, :]
    c_eq = jnp.concatenate([jnp.zeros(nx, dtype=dtype), defect.reshape(-1)])
    l_eq = jnp.zeros(system.n_eq, dtype=dtype)
    u_eq = jnp.zeros(system.n_eq, dtype=dtype)

    # bounds rows: values are the raw states/inputs/rates
    bx_l, bx_u = jax.vmap(
        lambda x: state_bounds(x, params, track.length, system))(xs)
    c_bx = xs.reshape(-1)
    c_bu = us.reshape(-1)
    rate = jnp.concatenate([
        (us[0, :dof] / ts)[None, :],
        (us[1:, :dof] - us[:-1, :dof]) / ts,
    ], axis=0)  # (N, dof)
    rate_pad = jnp.concatenate([rate, jnp.zeros((n, nu - dof), dtype=dtype)], axis=1)
    c_rate = rate_pad.reshape(-1)
    b = params.bounds
    l_bu = jnp.tile(b.u_l, n)
    u_bu = jnp.tile(b.u_u, n)
    ddq_l0 = b.ddq_l + current_u[:dof] / ts
    ddq_u0 = b.ddq_u + current_u[:dof] / ts
    zpad = jnp.zeros(nu - dof, dtype=dtype)
    l_rate = jnp.concatenate([
        jnp.concatenate([ddq_l0, zpad]),
        jnp.tile(jnp.concatenate([b.ddq_l, zpad]), n - 1)])
    u_rate = jnp.concatenate([
        jnp.concatenate([ddq_u0, zpad]),
        jnp.tile(jnp.concatenate([b.ddq_u, zpad]), n - 1)])
    c_ineqb = jnp.concatenate([c_bx, c_bu, c_rate])
    l_ineqb = jnp.concatenate([bx_l.reshape(-1), l_bu, l_rate])
    u_ineqb = jnp.concatenate([bx_u.reshape(-1), u_bu, u_rate])

    # polytopic rows
    cp, cpl, cpu = jax.vmap(
        lambda x, u, k, t: stage_constraints(x, u, index_robot_data(rb, k), t,
                                             params, with_jacobian=False,
                                             system=system)
    )(xs, up, jnp.arange(n + 1), _is_terminal(n))

    constr = jnp.concatenate([c_eq, c_ineqb, cp.reshape(-1)])
    lvec = jnp.concatenate([l_eq, l_ineqb, cpl.reshape(-1)])
    uvec = jnp.concatenate([u_eq, u_ineqb, cpu.reshape(-1)])
    return constr, lvec, uvec


def _discrete_ab(ts, dtype, system: System = PANDA):
    from ..models.dynamics import discrete_ab
    ad, bd, _ = discrete_ab(float(ts), system)
    return jnp.asarray(ad, dtype=dtype), jnp.asarray(bd, dtype=dtype)


# ------------------------------------------------------------------
# Full QP assembly (with derivatives)
# ------------------------------------------------------------------


def build_qp(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
             params: MPCCParams, current_u: jnp.ndarray, ts,
             exact_heading_jac: bool = False):
    """Assemble the dense normalized QP around iterate ``z``.

    Returns ``(P, qvec, A, l, u, obj, constr)`` where the QP step ``dz``
    (normalized) solves  min 1/2 dz'P dz + qvec'dz  s.t.
    l - constr <= A dz <= u - constr  (the caller forms those offsets).

    Panda-only, default horizon only: this dense layout exists for
    OSQP-conformance of the reference's active system (its static index
    grids are built from the Panda dims and N=10 at import; a z of any
    other horizon fails loudly in split_z).  The system- and
    horizon-generic path is the stage-separable assembly in
    `qp_stages.py` + the Riccati/IPM backend.
    """
    dtype = z.dtype
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    tx_inv = params.normalization.t_x_inv
    xs, us = split_z(z)
    up = us_padded(us)

    # ---- vmapped stage sweep: cost derivatives
    obj_k, fx, fu, fxx, fuu, fxu = jax.vmap(
        lambda x, u, k, t: stage_cost(track, x, u, index_robot_data(rb, k), t,
                                      params, exact_heading_jac, with_derivatives=True)
    )(xs, up, jnp.arange(N + 1), _IS_TERMINAL)

    # normalized gradient / Hessian blocks (osqp_interface.cpp:157-164)
    g_x = fx * tx[None, :]                      # (N+1, NX)
    g_u = (fu * tu[None, :])[:N]                # (N, NU)
    h_xx = tx[None, :, None] * fxx * tx[None, None, :]
    h_uu = (tu[None, :, None] * fuu * tu[None, None, :])[:N]
    h_xu = (tx[None, :, None] * fxu * tu[None, None, :])[:N]

    # ---- ddq smoothness cost in the u blocks (osqp_interface.cpp:166-217)
    r_ddq = params.cost.r_ddq
    tudq = tu[:PANDA_DOF]
    dq_all = us[:, :PANDA_DOF]
    # gradient: interior knots get 2r(2u_i - u_{i+1} - u_{i-1}); ends one-sided
    nbr_sum = jnp.concatenate([dq_all[1:2], dq_all[:-2] + dq_all[2:], dq_all[-2:-1]])
    count = jnp.concatenate([jnp.ones(1), 2.0 * jnp.ones(N - 2), jnp.ones(1)]).astype(dtype)
    ddq_grad = 2.0 * r_ddq * (count[:, None] * dq_all - nbr_sum)
    g_u = g_u.at[:, :PANDA_DOF].add(tudq[None, :] * ddq_grad)
    # Hessian: diag blocks 2r (ends) / 4r (interior); off-diag -2r
    diag_coef = 2.0 * r_ddq * count
    tu2 = tudq[:, None] * tudq[None, :] * jnp.eye(PANDA_DOF, dtype=dtype)
    h_uu = h_uu.at[:, :PANDA_DOF, :PANDA_DOF].add(diag_coef[:, None, None] * tu2)
    off = -2.0 * r_ddq * tu2

    obj = jnp.sum(obj_k) + r_ddq * jnp.sum((dq_all[1:] - dq_all[:-1]) ** 2)

    # ---- scatter Hessian + gradient
    p_mat = jnp.zeros((N_VAR, N_VAR), dtype=dtype)
    p_mat = p_mat.at[_HXX[0], _HXX[1]].add(h_xx)
    p_mat = p_mat.at[_HUU[0], _HUU[1]].add(h_uu)
    p_mat = p_mat.at[_HXU[0], _HXU[1]].add(h_xu)
    p_mat = p_mat.at[_HUX[0], _HUX[1]].add(jnp.swapaxes(h_xu, -1, -2))
    off_pad = jnp.zeros((NU, NU), dtype=dtype).at[:PANDA_DOF, :PANDA_DOF].set(off)
    p_mat = p_mat.at[_HUU_OFFDIAG[0], _HUU_OFFDIAG[1]].add(
        jnp.tile(off_pad[None], (N - 1, 1, 1)))
    p_mat = p_mat.at[_HUU_OFFDIAG_T[0], _HUU_OFFDIAG_T[1]].add(
        jnp.tile(off_pad[None], (N - 1, 1, 1)))
    qvec = jnp.concatenate([g_x.reshape(-1), g_u.reshape(-1)])

    # ---- constraint matrix
    a_mat = jnp.zeros((N_CONSTR, N_VAR), dtype=dtype)

    # equality rows (osqp_interface.cpp:221-252)
    ad, bd = _discrete_ab(ts, dtype)
    a_blk = -(tx_inv[:, None] * ad * tx[None, :])       # -T_x_inv Ad T_x
    b_blk = -(tx_inv[:, None] * bd * tu[None, :])       # -T_x_inv Bd T_u
    eye_x = jnp.eye(NX, dtype=dtype)
    a_mat = a_mat.at[_EQ_AX[0], _EQ_AX[1]].add(jnp.tile(eye_x[None], (N + 1, 1, 1)))
    a_mat = a_mat.at[_EQ_AXPREV[0], _EQ_AXPREV[1]].add(jnp.tile(a_blk[None], (N, 1, 1)))
    a_mat = a_mat.at[_EQ_BU[0], _EQ_BU[1]].add(jnp.tile(b_blk[None], (N, 1, 1)))

    # bound rows (osqp_interface.cpp:254-300)
    a_mat = a_mat.at[_BX[0], _BX[1]].add(jnp.tile(jnp.diag(tx)[None], (N + 1, 1, 1)))
    a_mat = a_mat.at[_BU[0], _BU[1]].add(jnp.tile(jnp.diag(tu)[None], (N, 1, 1)))
    rate_blk = jnp.diag(tudq) / ts
    a_mat = a_mat.at[_BDDQ_UI[0], _BDDQ_UI[1]].add(jnp.tile(rate_blk[None], (N, 1, 1)))
    a_mat = a_mat.at[_BDDQ_UIM1[0], _BDDQ_UIM1[1]].add(
        jnp.tile(-rate_blk[None], (N - 1, 1, 1)))

    # polytopic rows (osqp_interface.cpp:302-344)
    _, _, _, cx, cu = jax.vmap(
        lambda x, u, k, t: stage_constraints(x, u, index_robot_data(rb, k), t,
                                             params, with_jacobian=True)
    )(xs, up, jnp.arange(N + 1), _IS_TERMINAL)
    a_mat = a_mat.at[_P_CX[0], _P_CX[1]].add(cx * tx[None, None, :])
    a_mat = a_mat.at[_P_CU[0], _P_CU[1]].add(cu[:N] * tu[None, None, :])

    # ---- constraint values and limits
    constr, lvec, uvec = constraint_values(track, z, rb, params, current_u, ts)

    return p_mat, qvec, a_mat, lvec, uvec, obj, constr


def denormalize_step(step: jnp.ndarray, params: MPCCParams,
                     system: System = PANDA) -> jnp.ndarray:
    """Normalized QP step -> raw decision-space step (`deNormalizeStep`)."""
    nx, nu, n = system.nx, system.nu, system.horizon
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    sx = step[:nx * (n + 1)].reshape(n + 1, nx) * tx[None, :]
    su = step[nx * (n + 1):].reshape(n, nu) * tu[None, :]
    return jnp.concatenate([sx.reshape(-1), su.reshape(-1)])
