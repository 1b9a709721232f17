"""Polytopic constraints (RBF-softened barrier rows) and box bounds.

Functional equivalent of `cpp/src/Constraints/constraints.cpp:34-243` and
`bounds.cpp:85-128`.  Per knot the NPC = 11 rows are, in order
(`config.h` ``si_index``):

  0: self-collision    -d_gamma(q)^T dq + RBF(0.01*gamma(q) - 0.01*tol_selcol) <= 0
  1: singularity       -d_mu(q)^T dq + RBF(mu(q) - tol_sing) <= 0
  2..10: env-collision  -d_gamma_l(q)^T dq + RBF(0.01*(gamma_l - 1.2*r_obs) - 0.01*tol_envcol) <= 0

where RBF is the relaxed log barrier of Grandia et al. (delta = -0.5) and the
NN distances are converted cm -> m.  All rows are zeroed at the terminal knot
(0 in [0, 0]).  Everything is branch-free jnp.where math, vmapped over knots.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import INF, ConstraintIndex
from ..params import MPCCParams
from ..system import PANDA, System
from .robot_data import RobotData

RBF_DELTA = -0.5  # switching point (`constraints.cpp:87` et al.)


def rbf(h, delta=RBF_DELTA):
    """Relaxed barrier function (`getRBF`): -log(h+1) above delta, quadratic
    extension below."""
    above = -jnp.log(jnp.maximum(h, delta) + 1.0)
    below = (-jnp.log(delta + 1.0) - (h - delta) / (delta + 1.0)
             + (h - delta) ** 2 / (2.0 * (delta + 1.0) ** 2))
    return jnp.where(h >= delta, above, below)


def drbf(h, delta=RBF_DELTA):
    """Derivative of :func:`rbf` (`getDRBF`)."""
    above = -1.0 / (jnp.maximum(h, delta) + 1.0)
    below = -1.0 / (delta + 1.0) + (h - delta) / (delta + 1.0) ** 2
    return jnp.where(h >= delta, above, below)


def stage_constraints(x: jnp.ndarray, u: jnp.ndarray, rb: RobotData,
                      is_terminal, params: MPCCParams, with_jacobian: bool = True,
                      system: System = PANDA):
    """All NPC rows at one knot.

    Returns ``(c, c_l, c_u)`` or ``(c, c_l, c_u, c_x (NPC,NX), c_u_jac (NPC,NU))``.
    """
    dtype = x.dtype
    dq = u[:system.dof]
    m = params.model
    not_term = jnp.where(is_terminal, 0.0, 1.0)

    # ---- self-collision (cm -> m)
    sel_h = 0.01 * rb.sel_dist - 0.01 * m.tol_selcol
    d_sel = 0.01 * rb.d_sel_dist
    c_sel = not_term * (-jnp.dot(d_sel, dq) + rbf(sel_h))

    # ---- singularity (manipulability units)
    sing_h = rb.manipul - m.tol_sing
    d_sing = rb.d_manipul
    c_sing = not_term * (-jnp.dot(d_sing, dq) + rbf(sing_h))

    # ---- env-collision (per link; obstacle radius inflated by 1.2x)
    env_h = 0.01 * (rb.env_dist - 1.2 * rb.obs_radius) - 0.01 * m.tol_envcol
    d_env = 0.01 * rb.d_env_dist
    c_env = not_term * (-(d_env @ dq) + rbf(env_h))

    c = jnp.concatenate([c_sel[None], c_sing[None], c_env])
    c_l = jnp.where(is_terminal, 0.0, -INF) * jnp.ones(system.npc, dtype=dtype)
    c_u = jnp.zeros(system.npc, dtype=dtype)

    if not with_jacobian:
        return c, c_l, c_u

    dof = system.dof
    c_x = jnp.zeros((system.npc, system.nx), dtype=dtype)
    c_x = c_x.at[ConstraintIndex.con_selcol, :dof].set(
        not_term * drbf(sel_h) * d_sel)
    c_x = c_x.at[ConstraintIndex.con_sing, :dof].set(
        not_term * drbf(sing_h) * d_sing)
    c_x = c_x.at[ConstraintIndex.con_envcol1:, :dof].set(
        not_term * drbf(env_h)[:, None] * d_env)

    c_u_jac = jnp.zeros((system.npc, system.nu), dtype=dtype)
    c_u_jac = c_u_jac.at[ConstraintIndex.con_selcol, :dof].set(not_term * -d_sel)
    c_u_jac = c_u_jac.at[ConstraintIndex.con_sing, :dof].set(not_term * -d_sing)
    c_u_jac = c_u_jac.at[ConstraintIndex.con_envcol1:, :dof].set(not_term * -d_env)

    return c, c_l, c_u, c_x, c_u_jac


def state_bounds(x: jnp.ndarray, params: MPCCParams, track_length,
                 system: System = PANDA):
    """Per-knot state box with the s trust region
    (`bounds.cpp:85-108`): s in [max(s_k - tr, 0), min(s_k + tr, L)]."""
    b = params.bounds
    s = x[system.s_idx]
    l = b.x_l.at[system.s_idx].set(
        jnp.maximum(s - params.model.s_trust_region, 0.0))
    u = b.x_u.at[system.s_idx].set(
        jnp.minimum(s + params.model.s_trust_region, track_length))
    return l, u
