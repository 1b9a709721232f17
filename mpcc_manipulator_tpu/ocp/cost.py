"""MPCC stage cost: value, gradient, Gauss-Newton Hessian — pure functions.

Functional re-expression of the reference ``Cost`` class
(`cpp/src/Cost/cost.cpp:36-357`), per horizon knot:

* contouring/lag error split through the track tangent (``getErrorInfo``),
* progress-velocity tracking with terminal taper of the desired speed,
* SO(3) heading cost with right-Jacobian-inverse linearization,
* input regularization (``r_dq``, ``r_dVs``; zero at the terminal knot),
* singularity reward ``-q_sing * m(q)``,
* proximity-triggered weight scheduling (cubic blend when close to
  self-collision or singularity),
* Gauss-Newton Hessians + 1e-6 Tikhonov.

Derivatives are written out explicitly (not via AD) to reproduce the
reference's *model*, including its deliberate omissions: the frozen RobotData
linearization point, the non-differentiated desired-velocity taper, and the
heading Jacobian variant (see ``so3.right_jacobian_inverse_ref``).  One
deliberate *deviation* from the reference: the lag-error derivative uses the
signed tangential error ``t·e`` where `cost.cpp:110` uses the unsigned norm
``||e_lag||`` — the reference formula's sign is wrong when the EE is behind
the reference point (verified against autodiff/finite differences, exact to
~1e-15; the reference errs by O(1) in that regime).  Each
function is scalar-per-knot and is vmapped over the horizon by the QP
assembly; under vmap the whole horizon becomes one batched computation.

The cross-knot smoothness cost ``r_ddq ||u_{i+1} - u_i||^2`` lives in the QP
assembly (`qp_data.py`), matching where the reference puts it
(`osqp_interface.cpp:166-217`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import MPCCParams
from ..system import PANDA, System
from ..splines import arc_length as als
from ..splines.arc_length import TrackSpline
from ..utils import so3
from .robot_data import RobotData


def _cubic_blend(x, x0, xf, y0, yf):
    """Reference ``CubicSpline`` helper (`cost.cpp:36-43`): smoothstep from
    (x0, y0) to (xf, yf) — evaluated as-is, unclamped, like the reference."""
    t = (x - x0) / (xf - x0)
    return y0 + (yf - y0) * (3.0 * t * t - 2.0 * t * t * t)


def scheduled_weights(params: MPCCParams, rb: RobotData):
    """Proximity-triggered weight scheduling (`cost.cpp:290-308`)."""
    ratio = jnp.minimum(rb.sel_dist / (params.model.tol_selcol * 2.0),
                        rb.manipul / (params.model.tol_sing * 2.0))
    c = params.cost
    blended_qc = c.q_c * _cubic_blend(ratio, 0.5, 1.0, c.q_c_red_ratio, 1.0)
    blended_ql = c.q_l * _cubic_blend(ratio, 0.5, 1.0, c.q_l_inc_ratio, 1.0)
    blended_qo = c.q_ori * _cubic_blend(ratio, 0.5, 1.0, c.q_ori_red_ratio, 1.0)
    near = ratio <= 1.0
    q_c = jnp.where(near, blended_qc, c.q_c)
    q_l = jnp.where(near, blended_ql, c.q_l)
    q_ori = jnp.where(near, blended_qo, c.q_ori)
    return q_c, q_l, q_ori


def error_info(track: TrackSpline, x: jnp.ndarray, rb: RobotData,
               system: System = PANDA):
    """Contouring/lag error decomposition + state Jacobians
    (`Cost::getErrorInfo`, `cost.cpp:82-117`)."""
    s = x[system.s_idx]
    p_ref = als.track_position(track, s)
    tangent = als.track_derivative(track, s)
    normal = als.track_second_derivative(track, s)
    total_err = rb.ee_pos - p_ref
    lag_err = jnp.dot(tangent, total_err) * tangent
    cont_err = total_err - lag_err

    d_total = jnp.zeros((3, system.nx), dtype=x.dtype)
    d_total = d_total.at[:, :system.dof].set(rb.jv)
    d_total = d_total.at[:, system.s_idx].set(-tangent)

    d_tangent = jnp.zeros((3, system.nx), dtype=x.dtype)
    d_tangent = d_tangent.at[:, system.s_idx].set(normal)

    # NOTE deliberate deviation from the reference: `cost.cpp:110` scales the
    # identity term by ||lag_err|| = |t.e|, which flips the sign of the
    # d_tangent contribution whenever the EE is *behind* the reference point
    # (t.e < 0) and breaks the first-order model there.  The signed t.e is
    # the exact derivative of lag_err = (t.e) t (verified against jax.grad).
    d_lag = (jnp.outer(tangent, tangent) @ d_total
             + (jnp.outer(tangent, total_err)
                + jnp.dot(tangent, total_err) * jnp.eye(3, dtype=x.dtype)) @ d_tangent)
    d_cont = d_total - d_lag
    return cont_err, lag_err, d_cont, d_lag, tangent, normal


def desired_velocity(params: MPCCParams, s, s_max):
    """Desired path speed with terminal taper (`cost.cpp:133-141`)."""
    m = params.model
    taper = -m.desired_ee_velocity / (s_max * m.deacc_ratio) * (s - s_max)
    return jnp.where(s < s_max * m.deacc_ratio, m.desired_ee_velocity, taper)


def stage_cost(track: TrackSpline, x: jnp.ndarray, u: jnp.ndarray,
               rb: RobotData, is_terminal, params: MPCCParams,
               exact_heading_jac: bool = False, with_derivatives: bool = True,
               system: System = PANDA):
    """Full stage cost at one knot.

    Returns ``obj`` if ``with_derivatives`` is False, else
    ``(obj, f_x, f_u, f_xx, f_uu, f_xu)``.  ``is_terminal`` is a traced
    boolean (knot == N).
    """
    dtype = x.dtype
    q_c, q_l, q_ori = scheduled_weights(params, rb)
    c = params.cost

    # ---- contouring + progress (`getContouringCost`)
    cont_err, lag_err, d_cont, d_lag, _, _ = error_info(track, x, rb, system)
    qc_k = jnp.where(is_terminal, c.q_c_N_mult * q_c, q_c)
    v_des = desired_velocity(params, x[system.s_idx], track.length)
    dv = x[system.vs_idx] - v_des
    obj_cont = (qc_k * jnp.dot(cont_err, cont_err)
                + q_l * jnp.dot(lag_err, lag_err) + c.q_vs * dv * dv)

    # ---- heading (`getHeadingCost`)
    r_ref = als.track_orientation(track, x[system.s_idx])
    dr_ref = als.track_orientation_derivative(track, x[system.s_idx])
    r_cur = rb.ee_rot
    r_bar = r_ref.T @ r_cur
    log_rbar = so3.log_rot_vec(r_bar)
    obj_head = q_ori * jnp.dot(log_rbar, log_rbar)

    # ---- input (`getInputCost`; zero at terminal knot)
    dq = u[:system.dof]
    obj_input = jnp.where(is_terminal, 0.0,
                          c.r_dq * jnp.dot(dq, dq) + c.r_dVs * u[system.dvs_idx] ** 2)

    # ---- singularity (`getSingularityCost`)
    obj_sing = -c.q_sing * rb.manipul

    obj = obj_cont + obj_head + obj_input + obj_sing
    if not with_derivatives:
        return obj

    # ---------------- gradients ----------------
    f_x = (2.0 * qc_k * d_cont.T @ cont_err + 2.0 * q_l * d_lag.T @ lag_err)
    f_x = f_x.at[system.vs_idx].add(2.0 * c.q_vs * dv)

    jr_inv = (so3.right_jacobian_inverse(log_rbar) if exact_heading_jac
              else so3.right_jacobian_inverse_ref(log_rbar))
    d_log = jnp.zeros((3, system.nx), dtype=dtype)
    d_log = d_log.at[:, :system.dof].set(jr_inv @ r_cur.T @ rb.jw)
    d_log = d_log.at[:, system.s_idx].set(-jr_inv @ r_cur.T @ dr_ref)
    f_x = f_x + 2.0 * q_ori * d_log.T @ log_rbar

    f_x = f_x.at[:system.dof].add(-c.q_sing * rb.d_manipul)

    f_u = jnp.zeros(system.nu, dtype=dtype)
    not_term = jnp.where(is_terminal, 0.0, 1.0)
    f_u = f_u.at[:system.dof].set(not_term * 2.0 * c.r_dq * dq)
    f_u = f_u.at[system.dvs_idx].set(not_term * 2.0 * c.r_dVs * u[system.dvs_idx])

    # ---------------- Gauss-Newton Hessians ----------------
    f_xx = (2.0 * qc_k * d_cont.T @ d_cont + 2.0 * q_l * d_lag.T @ d_lag
            + 2.0 * q_ori * d_log.T @ d_log)
    f_xx = f_xx.at[system.vs_idx, system.vs_idx].add(2.0 * c.q_vs)

    f_uu = jnp.zeros((system.nu, system.nu), dtype=dtype)
    f_uu = f_uu.at[jnp.arange(system.dof), jnp.arange(system.dof)].set(
        not_term * 2.0 * c.r_dq)
    f_uu = f_uu.at[system.dvs_idx, system.dvs_idx].set(not_term * 2.0 * c.r_dVs)

    f_xu = jnp.zeros((system.nx, system.nu), dtype=dtype)

    # Tikhonov regularization (`cost.cpp:353-354`)
    eye_reg = 1e-6
    f_xx = f_xx + eye_reg * jnp.eye(system.nx, dtype=dtype)
    f_uu = f_uu + eye_reg * jnp.eye(system.nu, dtype=dtype)

    return obj, f_x, f_u, f_xx, f_uu, f_xu
