"""Stage-wise (OCP-structured) QP assembly for the Riccati/IPM solver.

The dense assembly (`qp_data.build_qp`) flattens the QP for the ADMM
backend.  This module assembles the *same normalized QP* in stage-separable
form for a block-structured solver, using the classic state augmentation

    x~_k = [x^_k (NX);  u^_{k-1} (NU)]        (NXT = 17)

which makes both the cross-knot smoothness cost  r_ddq ||u_k - u_{k-1}||^2
and the joint-acceleration rate rows stage-local (the only couplings that
break stage separability in the reference layout,
`osqp_interface.cpp:166-217, 279-297`).  All quantities are in the
normalized Delta coordinates of the dense QP, so steps from either backend
are interchangeable.

Stage layout (k = 0..N-1):  variables (x~_k, u_k);  stage N: x~_N only.
x~_0 is fully pinned (x0 is data; u_{-1} is the measured current input).

Inequality rows per stage (static masks; padded to NC_STAGE = 59):

    [ 0..8 ]  state box upper      (x part)        k >= 1
    [ 9..17]  state box lower                      k >= 1
    [18..25]  input box upper      (u_k)           k <= N-1
    [26..33]  input box lower                      k <= N-1
    [34..40]  ddq rate upper       (u_k, u^_{k-1}) k <= N-1
    [41..47]  ddq rate lower                       k <= N-1
    [48..58]  polytopic upper (RBF rows)           k <= N-1

(The reference's terminal polytopic rows and the dVs rate slots are
structurally zero — dropped here statically.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..params import MPCCParams
from ..splines.arc_length import TrackSpline
from ..system import PANDA, System
from .constraints import stage_constraints, state_bounds
from .cost import stage_cost
from .qp_data import _discrete_ab, _is_terminal, split_z, us_padded
from .robot_data import RobotData, index_robot_data

# Panda-instance dims kept as module constants for backward compatibility
# (tests, solver shape docs); the functions below derive everything from the
# `system` argument.
NXT = PANDA.nxt       # augmented state dim (17)
NZT = PANDA.nzt       # stage variable dim (25)
NC_STAGE = PANDA.nc_stage   # 59


@struct.dataclass
class StageQP:
    """All blocks of the stage-separable normalized QP (leading axis = stage)."""

    # cost: stages 0..N-1 over (x~, u); terminal over x~ only
    h: jnp.ndarray        # (N, NZT, NZT)
    g: jnp.ndarray        # (N, NZT)
    h_term: jnp.ndarray   # (NXT, NXT)
    g_term: jnp.ndarray   # (NXT,)
    # dynamics: Delta x~_{k+1} = at @ Delta x~_k + bt @ Delta u_k + e_k
    at: jnp.ndarray       # (NXT, NXT)  constant across stages
    bt: jnp.ndarray       # (NXT, NU)
    e: jnp.ndarray        # (N, NXT)
    # inequalities: rows @ (x~_k, u_k) <= d, with static activity mask
    c_rows: jnp.ndarray   # (N+1, NC_STAGE, NZT)
    d_vec: jnp.ndarray    # (N+1, NC_STAGE)
    mask: jnp.ndarray     # (N+1, NC_STAGE) 1.0 active / 0.0 inactive


def _row_masks(system: System, dtype):
    nx, nu, dof, n_h = system.nx, system.nu, system.dof, system.horizon
    m = np.zeros((n_h + 1, system.nc_stage))
    m[1:, 0:2 * nx] = 1.0                        # state box k >= 1
    m[:n_h, 2 * nx:2 * nx + 2 * nu] = 1.0        # input box k <= N-1
    m[:n_h, 2 * nx + 2 * nu:2 * nx + 2 * nu + 2 * dof] = 1.0  # rate rows
    m[:n_h, 2 * nx + 2 * nu + 2 * dof:] = 1.0                 # polytopic
    return jnp.asarray(m, dtype=dtype)


def _cost_blocks_raw(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                     params: MPCCParams, current_u: jnp.ndarray, ts,
                     exact_heading_jac: bool, system: System):
    """Raw normalized cost/dynamics blocks — no packing into stage matrices.

    Returns ``(g_x (N+1,nx), g_u (N,nu), h_xx (N+1,nx,nx), h_uu (N,nu,nu),
    h_xu (N,nx,nu), two_r (N,), ddq_pair (N,dof), defect (N,nx),
    xs, us, up)``.
    """
    dtype = z.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    n_h = system.horizon
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    tx_inv = params.normalization.t_x_inv
    xs, us = split_z(z, system)
    up = us_padded(us)

    # ---- normalized per-knot cost blocks (same math as build_qp)
    obj_k, fx, fu, fxx, fuu, fxu = jax.vmap(
        lambda x, u, k, t: stage_cost(track, x, u, index_robot_data(rb, k), t,
                                      params, exact_heading_jac,
                                      with_derivatives=True, system=system)
    )(xs, up, jnp.arange(n_h + 1), _is_terminal(n_h))
    g_x = fx * tx[None, :]
    g_u = (fu * tu[None, :])[:n_h]
    h_xx = tx[None, :, None] * fxx * tx[None, None, :]
    h_uu = (tu[None, :, None] * fuu * tu[None, None, :])[:n_h]
    h_xu = (tx[None, :, None] * fxu * tu[None, None, :])[:n_h]

    # ddq smoothness: stage k covers the pair (u_k, u_{k-1}) for k = 1..N-1
    r_ddq = params.cost.r_ddq
    pair_mask = jnp.concatenate([jnp.zeros(1, dtype=dtype),
                                 jnp.ones(n_h - 1, dtype=dtype)])
    two_r = 2.0 * r_ddq * pair_mask  # (N,)
    dq_all = us[:, :dof]
    dq_prev = jnp.concatenate([current_u[None, :dof], dq_all[:-1]], axis=0)
    ddq_pair = dq_all - dq_prev     # (N, dof); stage k pair diff

    # defect: -T_x_inv (x_{k+1} - (Ad x_k + Bd u_k)) (sign folded in later)
    ad, bd = _discrete_ab(ts, dtype, system)
    pred = xs[:-1] @ ad.T + us @ bd.T
    defect = (xs[1:] - pred) * tx_inv[None, :]
    return g_x, g_u, h_xx, h_uu, h_xu, two_r, ddq_pair, defect, xs, us, up


def _cost_blocks(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                 params: MPCCParams, current_u: jnp.ndarray, ts,
                 exact_heading_jac: bool, system: System):
    """Shared normalized cost/dynamics assembly for both stage layouts.

    Returns ``(h, g, h_term, g_term, e, xs, us, up, ddq_pair)``.
    """
    dtype = z.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    nxt, nzt = system.nxt, system.nzt
    n_h = system.horizon
    tu = params.normalization.t_u
    tudq = tu[:dof]

    (g_x, g_u, h_xx, h_uu, h_xu, two_r, ddq_pair, defect,
     xs, us, up) = _cost_blocks_raw(track, z, rb, params, current_u, ts,
                                    exact_heading_jac, system)

    # ---- stage Hessians/gradients in augmented coordinates
    h = jnp.zeros((n_h, nzt, nzt), dtype=dtype)
    g = jnp.zeros((n_h, nzt), dtype=dtype)
    # x-part cost of knot k lives in stage k's x~ block (k = 0..N-1)
    h = h.at[:, :nx, :nx].set(h_xx[:n_h])
    h = h.at[:, :nx, nxt:].set(h_xu)
    h = h.at[:, nxt:, :nx].set(jnp.swapaxes(h_xu, -1, -2))
    h = h.at[:, nxt:, nxt:].set(h_uu)
    g = g.at[:, :nx].set(g_x[:n_h])
    g = g.at[:, nxt:].set(g_u)

    tu2 = tudq[:, None] * tudq[None, :] * jnp.eye(dof, dtype=dtype)
    # blocks: +2r on u_k, +2r on u^_{k-1}, -2r cross
    h = h.at[:, nxt:nxt + dof, nxt:nxt + dof].add(
        two_r[:, None, None] * tu2)
    h = h.at[:, nx:nx + dof, nx:nx + dof].add(
        two_r[:, None, None] * tu2)
    h = h.at[:, nx:nx + dof, nxt:nxt + dof].add(
        -two_r[:, None, None] * tu2)
    h = h.at[:, nxt:nxt + dof, nx:nx + dof].add(
        -two_r[:, None, None] * tu2)
    # gradient: +-2r T (dq_k - dq_{k-1})
    g = g.at[:, nxt:nxt + dof].add(
        two_r[:, None] * tudq[None, :] * ddq_pair)
    g = g.at[:, nx:nx + dof].add(
        -two_r[:, None] * tudq[None, :] * ddq_pair)

    # terminal cost: knot N x-part only
    h_term = jnp.zeros((nxt, nxt), dtype=dtype).at[:nx, :nx].set(h_xx[n_h])
    g_term = jnp.zeros(nxt, dtype=dtype).at[:nx].set(g_x[n_h])

    e = jnp.zeros((n_h, nxt), dtype=dtype).at[:, :nx].set(-defect)
    return h, g, h_term, g_term, e, xs, us, up, ddq_pair


def build_qp_stages(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                    params: MPCCParams, current_u: jnp.ndarray, ts,
                    exact_heading_jac: bool = False,
                    system: System = PANDA) -> StageQP:
    dtype = z.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    nxt, nzt = system.nxt, system.nzt
    nc_stage = system.nc_stage
    n_h = system.horizon
    s_idx = system.s_idx
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    tx_inv = params.normalization.t_x_inv
    tudq = tu[:dof]

    h, g, h_term, g_term, e, xs, us, up, ddq_pair = _cost_blocks(
        track, z, rb, params, current_u, ts, exact_heading_jac, system)

    # ---- dynamics in augmented normalized coordinates
    ad, bd = _discrete_ab(ts, dtype, system)
    ad_n = tx_inv[:, None] * ad * tx[None, :]
    bd_n = tx_inv[:, None] * bd * tu[None, :]
    at = jnp.zeros((nxt, nxt), dtype=dtype).at[:nx, :nx].set(ad_n)
    bt = jnp.zeros((nxt, nu), dtype=dtype).at[:nx, :].set(bd_n)
    bt = bt.at[nx:, :].set(jnp.eye(nu, dtype=dtype))

    # ---- inequality rows
    c_rows = jnp.zeros((n_h + 1, nc_stage, nzt), dtype=dtype)
    d_vec = jnp.zeros((n_h + 1, nc_stage), dtype=dtype)

    # state box: T_x dx^ <= ux - x ; -T_x dx^ <= x - lx
    bx_l, bx_u = jax.vmap(
        lambda x: state_bounds(x, params, track.length, system))(xs)
    tx_diag = jnp.diag(tx)
    c_rows = c_rows.at[:, 0:nx, :nx].set(jnp.tile(tx_diag[None], (n_h + 1, 1, 1)))
    c_rows = c_rows.at[:, nx:2 * nx, :nx].set(
        jnp.tile(-tx_diag[None], (n_h + 1, 1, 1)))
    d_vec = d_vec.at[:, 0:nx].set(bx_u - xs)
    d_vec = d_vec.at[:, nx:2 * nx].set(xs - bx_l)
    # The path-parameter rows are only weakly controllable over the first
    # stages (s_1 is fully determined by the pinned x~_0; s_k moves at most
    # O(Ts^2 k^2 dVs)), so a guess with s marginally outside its box makes
    # those rows structurally infeasible and blows up the IPM duals.  Clamp
    # their offsets to a tiny feasible margin — the dense OSQP-style path
    # converges to the same "stay at the violation" compromise numerically.
    s_rows = jnp.array([s_idx, nx + s_idx])
    d_vec = d_vec.at[:, s_rows].set(jnp.maximum(d_vec[:, s_rows], 1e-6))

    # input box on u_k
    b = params.bounds
    tu_diag = jnp.diag(tu)
    o = 2 * nx
    c_rows = c_rows.at[:n_h, o:o + nu, nxt:].set(
        jnp.tile(tu_diag[None], (n_h, 1, 1)))
    c_rows = c_rows.at[:n_h, o + nu:o + 2 * nu, nxt:].set(
        jnp.tile(-tu_diag[None], (n_h, 1, 1)))
    d_vec = d_vec.at[:n_h, o:o + nu].set(b.u_u[None, :] - us)
    d_vec = d_vec.at[:n_h, o + nu:o + 2 * nu].set(us - b.u_l[None, :])

    # ddq rate rows: (1/Ts) T_dq (du_k - du^_{k-1})
    o = 2 * nx + 2 * nu
    rate_blk = jnp.diag(tudq) / ts
    c_rows = c_rows.at[:n_h, o:o + dof, nxt:nxt + dof].set(
        jnp.tile(rate_blk[None], (n_h, 1, 1)))
    c_rows = c_rows.at[:n_h, o:o + dof, nx:nx + dof].set(
        jnp.tile(-rate_blk[None], (n_h, 1, 1)))
    c_rows = c_rows.at[:n_h, o + dof:o + 2 * dof,
                       nxt:nxt + dof].set(
        jnp.tile(-rate_blk[None], (n_h, 1, 1)))
    c_rows = c_rows.at[:n_h, o + dof:o + 2 * dof,
                       nx:nx + dof].set(
        jnp.tile(rate_blk[None], (n_h, 1, 1)))
    rate_val = ddq_pair / ts   # (N, dof) current rate values
    d_vec = d_vec.at[:n_h, o:o + dof].set(b.ddq_u[None, :] - rate_val)
    d_vec = d_vec.at[:n_h, o + dof:o + 2 * dof].set(
        rate_val - b.ddq_l[None, :])

    # polytopic rows (upper-only): cx T_x dx^ + cu T_u du <= -c
    cvals, _, _, cx, cu = jax.vmap(
        lambda x, u, k, t: stage_constraints(x, u, index_robot_data(rb, k), t,
                                             params, with_jacobian=True,
                                             system=system)
    )(xs, up, jnp.arange(n_h + 1), _is_terminal(n_h))
    o = 2 * nx + 2 * nu + 2 * dof
    c_rows = c_rows.at[:, o:, :nx].set(cx * tx[None, None, :])
    c_rows = c_rows.at[:n_h, o:, nxt:].set(cu[:n_h] * tu[None, None, :])
    d_vec = d_vec.at[:, o:].set(-cvals)

    return StageQP(h=h, g=g, h_term=h_term, g_term=g_term, at=at, bt=bt, e=e,
                   c_rows=c_rows, d_vec=d_vec, mask=_row_masks(system, dtype))


def stage_step_to_dense(dx_tilde: jnp.ndarray, du: jnp.ndarray,
                        system: System = PANDA) -> jnp.ndarray:
    """(N+1, nxt) augmented-state deltas + (N, nu) input deltas -> the dense
    decision-vector layout (normalized step, `qp_data.split_z` ordering)."""
    dxs = dx_tilde[:, :system.nx]           # (N+1, nx)
    return jnp.concatenate([dxs.reshape(-1), du.reshape(-1)])


# ------------------------------------------------------------------
# Structure-exploiting stage representation
# ------------------------------------------------------------------
#
# The packed StageQP treats all 59 rows/stage as a dense (nc, nzt) block and
# the dynamics as dense (nxt, nxt) maps.  Almost all of that is structural
# zero: the discrete dynamics are I plus ONE off-diagonal element (ZOH of a
# nilpotent A, `models/dynamics.py:40-47`), bt is [bd; I], and 48 of the 59
# rows are +-diagonal (state/input boxes) or two-entry rows (ddq rate).
# Only the npc polytopic rows are dense.  StageQPS stores exactly the
# nonzero content; the structured IPM (`solver/qp_ipm.py::solve_qp_ipm_s`)
# consumes it with O(structure) work per Newton step instead of dense
# matmuls — ~4x fewer FLOPs and, more importantly on TPU, ~5x less HBM
# traffic per sweep at batch scale.


@struct.dataclass
class StageQPS:
    """Structured stage-separable normalized QP (leading axis = stage)."""

    # cost blocks (identical content to StageQP)
    h: jnp.ndarray        # (N, NZT, NZT)
    g: jnp.ndarray        # (N, NZT)
    h_term: jnp.ndarray   # (NXT, NXT)
    g_term: jnp.ndarray   # (NXT,)
    # dynamics: x'_{k+1} = (I + a_sv E_{s,vs}) x'_k + bd u_k (x rows);
    #           u'_{k+1} = u_k
    a_sv: jnp.ndarray     # scalar: Ts * tx[vs] / tx[s]
    bd: jnp.ndarray       # (NX, NU) normalized Bd (sparse-ish, small)
    e: jnp.ndarray        # (N, NXT) defect (x rows only nonzero)
    # box rows: diag scales (traced params) + offsets
    tx: jnp.ndarray       # (NX,)  state-box row scale
    tu: jnp.ndarray       # (NU,)  input-box row scale
    t_rate: jnp.ndarray   # (DOF,) rate row scale = tu[:dof] / ts
    d_xu: jnp.ndarray     # (N+1, NX) upper state box offsets
    d_xl: jnp.ndarray     # (N+1, NX) lower
    d_uu: jnp.ndarray     # (N, NU)
    d_ul: jnp.ndarray     # (N, NU)
    d_ru: jnp.ndarray     # (N, DOF)
    d_rl: jnp.ndarray     # (N, DOF)
    # polytopic rows (the only dense ones)
    cpx: jnp.ndarray      # (N+1, NPC, NX) normalized x-jacobian rows
    cpu: jnp.ndarray      # (N, NPC, NU)   normalized u-jacobian rows
    d_p: jnp.ndarray      # (N+1, NPC)
    # per-stage activity masks (group-wide, float 0/1)
    m_x: jnp.ndarray      # (N+1,) state box active for k >= 1
    m_u: jnp.ndarray      # (N+1,) input/rate/polytopic active for k <= N-1


def build_qp_stages_s(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                      params: MPCCParams, current_u: jnp.ndarray, ts,
                      exact_heading_jac: bool = False,
                      system: System = PANDA) -> StageQPS:
    """Assemble the same normalized QP as :func:`build_qp_stages`, in
    structured form (equivalence is tested by packing: `tests/test_qp_ipm.py`)."""
    dtype = z.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    n_h = system.horizon
    s_idx, vs_idx = system.s_idx, system.vs_idx
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    tx_inv = params.normalization.t_x_inv
    tudq = tu[:dof]

    h, g, h_term, g_term, e, xs, us, up, ddq_pair = _cost_blocks(
        track, z, rb, params, current_u, ts, exact_heading_jac, system)

    # dynamics structure: ad_n = I + a_sv E_{s,vs} exactly (diag entries are
    # tx_inv_i * tx_i = 1); verified against the dense _discrete_ab in tests
    a_sv = jnp.asarray(float(ts), dtype=dtype) * tx[vs_idx] * tx_inv[s_idx]
    ad, bd_raw = _discrete_ab(ts, dtype, system)
    bd = tx_inv[:, None] * bd_raw * tu[None, :]

    # box offsets (same values as the packed d_vec)
    bx_l, bx_u = jax.vmap(
        lambda x: state_bounds(x, params, track.length, system))(xs)
    d_xu = bx_u - xs
    d_xl = xs - bx_l
    # s-row reachability clamp (see build_qp_stages)
    d_xu = d_xu.at[:, s_idx].set(jnp.maximum(d_xu[:, s_idx], 1e-6))
    d_xl = d_xl.at[:, s_idx].set(jnp.maximum(d_xl[:, s_idx], 1e-6))
    b = params.bounds
    d_uu = b.u_u[None, :] - us
    d_ul = us - b.u_l[None, :]
    rate_val = ddq_pair / ts
    d_ru = b.ddq_u[None, :] - rate_val
    d_rl = rate_val - b.ddq_l[None, :]

    # polytopic rows
    cvals, _, _, cx, cu = jax.vmap(
        lambda x, u, k, t: stage_constraints(x, u, index_robot_data(rb, k), t,
                                             params, with_jacobian=True,
                                             system=system)
    )(xs, up, jnp.arange(n_h + 1), _is_terminal(n_h))
    cpx = cx * tx[None, None, :]
    cpu = (cu * tu[None, None, :])[:n_h]
    d_p = -cvals

    m_x = jnp.concatenate([jnp.zeros(1, dtype=dtype),
                           jnp.ones(n_h, dtype=dtype)])
    m_u = jnp.concatenate([jnp.ones(n_h, dtype=dtype),
                           jnp.zeros(1, dtype=dtype)])
    return StageQPS(h=h, g=g, h_term=h_term, g_term=g_term,
                    a_sv=a_sv, bd=bd, e=e,
                    tx=tx, tu=tu, t_rate=tudq / ts,
                    d_xu=d_xu, d_xl=d_xl, d_uu=d_uu, d_ul=d_ul,
                    d_ru=d_ru, d_rl=d_rl, cpx=cpx, cpu=cpu, d_p=d_p,
                    m_x=m_x, m_u=m_u)


def pack_stage_qp(qps: StageQPS, system: System = PANDA) -> StageQP:
    """StageQPS -> packed StageQP (testing/interop; reproduces the exact
    row layout of :func:`build_qp_stages`)."""
    dtype = qps.e.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    nxt, nzt = system.nxt, system.nzt
    nc_stage = system.nc_stage
    n_stages = qps.e.shape[0]

    at = jnp.zeros((nxt, nxt), dtype=dtype).at[:nx, :nx].set(
        jnp.eye(nx, dtype=dtype)).at[system.s_idx, system.vs_idx].add(qps.a_sv)
    bt = jnp.zeros((nxt, nu), dtype=dtype).at[:nx, :].set(qps.bd)
    bt = bt.at[nx:, :].set(jnp.eye(nu, dtype=dtype))

    c_rows = jnp.zeros((n_stages + 1, nc_stage, nzt), dtype=dtype)
    d_vec = jnp.zeros((n_stages + 1, nc_stage), dtype=dtype)
    tx_diag = jnp.diag(qps.tx)
    tu_diag = jnp.diag(qps.tu)
    c_rows = c_rows.at[:, 0:nx, :nx].set(tx_diag[None])
    c_rows = c_rows.at[:, nx:2 * nx, :nx].set(-tx_diag[None])
    d_vec = d_vec.at[:, 0:nx].set(qps.d_xu)
    d_vec = d_vec.at[:, nx:2 * nx].set(qps.d_xl)
    o = 2 * nx
    c_rows = c_rows.at[:n_stages, o:o + nu, nxt:].set(tu_diag[None])
    c_rows = c_rows.at[:n_stages, o + nu:o + 2 * nu, nxt:].set(-tu_diag[None])
    d_vec = d_vec.at[:n_stages, o:o + nu].set(qps.d_uu)
    d_vec = d_vec.at[:n_stages, o + nu:o + 2 * nu].set(qps.d_ul)
    o = 2 * nx + 2 * nu
    rate_blk = jnp.diag(qps.t_rate)
    c_rows = c_rows.at[:n_stages, o:o + dof, nxt:nxt + dof].set(rate_blk[None])
    c_rows = c_rows.at[:n_stages, o:o + dof, nx:nx + dof].set(-rate_blk[None])
    c_rows = c_rows.at[:n_stages, o + dof:o + 2 * dof,
                       nxt:nxt + dof].set(-rate_blk[None])
    c_rows = c_rows.at[:n_stages, o + dof:o + 2 * dof,
                       nx:nx + dof].set(rate_blk[None])
    d_vec = d_vec.at[:n_stages, o:o + dof].set(qps.d_ru)
    d_vec = d_vec.at[:n_stages, o + dof:o + 2 * dof].set(qps.d_rl)
    o = 2 * nx + 2 * nu + 2 * dof
    c_rows = c_rows.at[:, o:, :nx].set(qps.cpx)
    c_rows = c_rows.at[:n_stages, o:, nxt:].set(qps.cpu)
    d_vec = d_vec.at[:, o:].set(qps.d_p)

    return StageQP(h=qps.h, g=qps.g, h_term=qps.h_term, g_term=qps.g_term,
                   at=at, bt=bt, e=qps.e, c_rows=c_rows, d_vec=d_vec,
                   mask=_row_masks(system, dtype))


# ------------------------------------------------------------------
# Kernel-direct representation
# ------------------------------------------------------------------
#
# The fused Pallas IPM kernel consumes the QP as compact cost/constraint
# BLOCKS; packing those blocks into (nzt, nzt) stage matrices (StageQP /
# StageQPS) just so the kernel wrapper can slice them back out again costs
# ~29 ms per SQP iteration at batch 1024 — every `.at[...].set` on the big
# batched arrays is a full-array copy under XLA.  StageQPK stores exactly
# the blocks the kernel reads, with NO packing step: assembly cost drops to
# the underlying derivative math.


@struct.dataclass
class StageQPK:
    """Compact stage blocks for the Pallas IPM kernel (leading axis = stage).

    Same normalized QP content as :class:`StageQPS`; related by the pure
    repacking in :func:`qpk_to_qps` (tested for equivalence).
    """

    hxx: jnp.ndarray      # (N+1, NX, NX) per-knot x Hessian (incl. terminal)
    hux: jnp.ndarray      # (N, NU, NX)   cross term, u-major
    huu: jnp.ndarray      # (N, NU, NU)   input Hessian incl. ddq smoothness
    r2: jnp.ndarray       # (N, DOF)      2 r_ddq tudq^2 per stage (u_prev diag)
    gx: jnp.ndarray       # (N+1, NX)
    gu: jnp.ndarray       # (N, NU)       incl. +smoothness gradient
    gxu: jnp.ndarray      # (N, DOF)      -smoothness gradient (u_prev slots)
    e: jnp.ndarray        # (N, NX)       dynamics defect
    a_sv: jnp.ndarray     # scalar
    bd: jnp.ndarray       # (NX, NU)
    tx: jnp.ndarray       # (NX,)
    tu: jnp.ndarray       # (NU,)
    t_rate: jnp.ndarray   # (DOF,)
    d_xu: jnp.ndarray     # (N, NX)  state box offsets, knots 1..N
    d_xl: jnp.ndarray     # (N, NX)
    d_uu: jnp.ndarray     # (N, NU)
    d_ul: jnp.ndarray     # (N, NU)
    d_ru: jnp.ndarray     # (N, DOF)
    d_rl: jnp.ndarray     # (N, DOF)
    d_p: jnp.ndarray      # (N, NPC)
    cpx: jnp.ndarray      # (N, NPC, NX)
    cpu: jnp.ndarray      # (N, NPC, NU)


def build_qp_stages_k(track: TrackSpline, z: jnp.ndarray, rb: RobotData,
                      params: MPCCParams, current_u: jnp.ndarray, ts,
                      exact_heading_jac: bool = False,
                      system: System = PANDA) -> StageQPK:
    """Assemble the normalized QP directly in kernel-block form."""
    dtype = z.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    s_idx, vs_idx = system.s_idx, system.vs_idx
    tx = params.normalization.t_x
    tu = params.normalization.t_u
    tx_inv = params.normalization.t_x_inv
    tudq = tu[:dof]

    (g_x, g_u, h_xx, h_uu, h_xu, two_r, ddq_pair, defect,
     xs, us, up) = _cost_blocks_raw(track, z, rb, params, current_u, ts,
                                    exact_heading_jac, system)

    tu2 = tudq * tudq
    r2 = two_r[:, None] * tu2[None, :]
    eye_u = jnp.eye(nu, dtype=dtype)
    huu = h_uu + eye_u[None] * jnp.concatenate(
        [r2, jnp.zeros((system.horizon, nu - dof), dtype=dtype)],
        axis=1)[:, None, :]
    g_sm = two_r[:, None] * tudq[None, :] * ddq_pair
    gu = g_u.at[:, :dof].add(g_sm)
    gxu = -g_sm

    a_sv = jnp.asarray(float(ts), dtype=dtype) * tx[vs_idx] * tx_inv[s_idx]
    ad, bd_raw = _discrete_ab(ts, dtype, system)
    bd = tx_inv[:, None] * bd_raw * tu[None, :]

    bx_l, bx_u = jax.vmap(
        lambda x: state_bounds(x, params, track.length, system))(xs)
    d_xu = (bx_u - xs)[1:]
    d_xl = (xs - bx_l)[1:]
    d_xu = d_xu.at[:, s_idx].set(jnp.maximum(d_xu[:, s_idx], 1e-6))
    d_xl = d_xl.at[:, s_idx].set(jnp.maximum(d_xl[:, s_idx], 1e-6))
    b = params.bounds
    d_uu = b.u_u[None, :] - us
    d_ul = us - b.u_l[None, :]
    rate_val = ddq_pair / ts
    d_ru = b.ddq_u[None, :] - rate_val
    d_rl = rate_val - b.ddq_l[None, :]

    cvals, _, _, cx, cu = jax.vmap(
        lambda x, u, k, t: stage_constraints(x, u, index_robot_data(rb, k), t,
                                             params, with_jacobian=True,
                                             system=system)
    )(xs, up, jnp.arange(system.horizon + 1), _is_terminal(system.horizon))
    cpx = (cx * tx[None, None, :])[:system.horizon]
    cpu = (cu * tu[None, None, :])[:system.horizon]
    d_p = -cvals[:system.horizon]

    return StageQPK(hxx=h_xx, hux=jnp.swapaxes(h_xu, -1, -2), huu=huu,
                    r2=r2, gx=g_x, gu=gu, gxu=gxu, e=-defect,
                    a_sv=a_sv, bd=bd, tx=tx, tu=tu, t_rate=tudq / ts,
                    d_xu=d_xu, d_xl=d_xl, d_uu=d_uu, d_ul=d_ul,
                    d_ru=d_ru, d_rl=d_rl, d_p=d_p, cpx=cpx, cpu=cpu)


def qpk_to_qps(qpk: StageQPK, system: System = PANDA) -> StageQPS:
    """StageQPK -> StageQPS (testing/interop repack)."""
    dtype = qpk.e.dtype
    nx, nu, dof = system.nx, system.nu, system.dof
    nxt, nzt = system.nxt, system.nzt
    n_st = qpk.e.shape[0]
    h = jnp.zeros((n_st, nzt, nzt), dtype=dtype)
    h = h.at[:, :nx, :nx].set(qpk.hxx[:n_st])
    h_xu = jnp.swapaxes(qpk.hux, -1, -2)
    h = h.at[:, :nx, nxt:].set(h_xu)
    h = h.at[:, nxt:, :nx].set(qpk.hux)
    h = h.at[:, nxt:, nxt:].set(qpk.huu)
    ar = jnp.arange(dof)
    h = h.at[:, nx + ar, nx + ar].add(qpk.r2)
    h = h.at[:, nx + ar, nxt + ar].add(-qpk.r2)
    h = h.at[:, nxt + ar, nx + ar].add(-qpk.r2)
    g = jnp.zeros((n_st, nzt), dtype=dtype)
    g = g.at[:, :nx].set(qpk.gx[:n_st])
    g = g.at[:, nxt:].set(qpk.gu)
    g = g.at[:, nx + ar].set(qpk.gxu)
    h_term = jnp.zeros((nxt, nxt), dtype=dtype).at[:nx, :nx].set(qpk.hxx[n_st])
    g_term = jnp.zeros(nxt, dtype=dtype).at[:nx].set(qpk.gx[n_st])
    e = jnp.zeros((n_st, nxt), dtype=dtype).at[:, :nx].set(qpk.e)
    pad1 = lambda a: jnp.concatenate([jnp.zeros((1,) + a.shape[1:],
                                                dtype=dtype), a], axis=0)
    padN = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:],
                                                   dtype=dtype)], axis=0)
    m_x = jnp.concatenate([jnp.zeros(1, dtype=dtype),
                           jnp.ones(n_st, dtype=dtype)])
    m_u = jnp.concatenate([jnp.ones(n_st, dtype=dtype),
                           jnp.zeros(1, dtype=dtype)])
    return StageQPS(h=h, g=g, h_term=h_term, g_term=g_term,
                    a_sv=qpk.a_sv, bd=qpk.bd, e=e,
                    tx=qpk.tx, tu=qpk.tu, t_rate=qpk.t_rate,
                    d_xu=pad1(qpk.d_xu), d_xl=pad1(qpk.d_xl),
                    d_uu=qpk.d_uu, d_ul=qpk.d_ul,
                    d_ru=qpk.d_ru, d_rl=qpk.d_rl,
                    cpx=padN(qpk.cpx), cpu=qpk.cpu, d_p=padN(qpk.d_p),
                    m_x=m_x, m_u=m_u)
