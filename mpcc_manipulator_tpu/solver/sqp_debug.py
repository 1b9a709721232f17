"""Host-driven SQP with per-phase wall-clock timing ("ComputeTime" parity).

The production path (`solver.sqp.solve_ocp`) fuses the whole SQP loop into
one XLA computation, so the reference's per-phase timers
(`ComputeTime {set_qp, solve_qp, get_alpha, total}`,
`osqp_interface.h:71-79`) have no direct analog.  This module provides the
diagnostic equivalent: the same SQP iteration driven from the host with each
phase a separately jitted call and ``block_until_ready`` timing — for
profiling, debugging, and timing-breakdown parity with the reference logs.

Semantics match `solve_ocp` (same QP assembly, ADMM solve, filter line
search); small numeric differences can arise only from the host-side loop
control being eager.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import N_CONSTR, N_VAR, NU, NX, N
from ..ocp import qp_data
from ..ocp.robot_data import RobotData
from ..params import MPCCParams, SQPConfig
from ..splines.arc_length import TrackSpline
from . import qp_admm
from .sqp import Status, constraint_norm


@dataclass
class ComputeTime:
    """Per-phase cumulative seconds (reference `ComputeTime` struct)."""

    set_qp: float = 0.0
    solve_qp: float = 0.0
    get_alpha: float = 0.0
    set_env: float = 0.0
    total: float = 0.0

    def as_dict(self):
        return {"set_qp": self.set_qp, "solve_qp": self.solve_qp,
                "get_alpha": self.get_alpha, "set_env": self.set_env,
                "total": self.total}


@partial(jax.jit, static_argnames=("ts", "exact_heading_jac"))
def _build_qp_jit(track, z, rb, params, current_u, ts, exact_heading_jac=False):
    return qp_data.build_qp(track, z, rb, params, current_u, ts,
                            exact_heading_jac)


@partial(jax.jit, static_argnames=("ts", "exact_heading_jac"))
def _eval_point_jit(track, z, rb, params, current_u, ts, exact_heading_jac=False):
    obj = qp_data.total_objective(track, z, rb, params, exact_heading_jac)
    constr, l, u = qp_data.constraint_values(track, z, rb, params, current_u, ts)
    return obj, constraint_norm(constr, l, u)


@jax.jit
def _denorm_jit(step, params):
    return qp_data.denormalize_step(step, params)


def solve_ocp_timed(track: TrackSpline, rb: RobotData, params: MPCCParams,
                    cfg: SQPConfig, z0: jnp.ndarray, current_u: jnp.ndarray,
                    ts: float, exact_heading_jac: bool = False):
    """Host-level SQP loop with phase timing.  Returns (z, status, times)."""
    t_total0 = time.perf_counter()
    times = ComputeTime()
    dtype = z0.dtype
    z = z0
    lam = jnp.zeros(N_CONSTR, dtype=dtype)
    filter_list: list[tuple[float, float]] = []
    alpha_fail = float(params.sqp.line_search_tau) ** cfg.line_search_max_iter
    status = Status.MAX_ITER_EXCEEDED

    for it in range(cfg.max_iter):
        t0 = time.perf_counter()
        p_mat, qvec, a_mat, lvec, uvec, obj, constr = _build_qp_jit(
            track, z, rb, params, current_u, ts, exact_heading_jac)
        p_mat.block_until_ready()
        times.set_qp += time.perf_counter() - t0

        if bool(jnp.any(jnp.isnan(p_mat))):
            status = Status.NAN_HESSIAN
            break
        jitter = (N_VAR * jnp.finfo(dtype).eps) * jnp.max(jnp.abs(jnp.diag(p_mat)))
        chol = jnp.linalg.cholesky(p_mat + jitter * jnp.eye(N_VAR, dtype=dtype))
        if bool(jnp.any(jnp.isnan(chol))):
            status = Status.NON_PD_HESSIAN
            break

        t0 = time.perf_counter()
        qp_sol = qp_admm.solve_qp(p_mat, qvec, a_mat, lvec - constr,
                                  uvec - constr, max_iter=cfg.qp_max_iter,
                                  check_every=cfg.qp_check_every)
        qp_sol.x.block_until_ready()
        times.solve_qp += time.perf_counter() - t0

        step = qp_sol.x
        step_lambda = qp_sol.y - lam

        t0 = time.perf_counter()
        z_try = z + _denorm_jit(step, params)
        obj_try, vio_try = _eval_point_jit(track, z_try, rb, params, current_u,
                                           ts, exact_heading_jac)
        obj_try, vio_try = float(obj_try), float(vio_try)
        dominated = any(obj_try >= fo and vio_try >= fv for fo, fv in filter_list)
        if not dominated:
            alpha = 1.0
            filter_list = [(fo, fv) for fo, fv in filter_list
                           if obj_try > fo or vio_try > fv]
            filter_list.append((obj_try, vio_try))
        else:
            alpha = alpha_fail
        times.get_alpha += time.perf_counter() - t0

        z = z + alpha * _denorm_jit(step, params)
        lam = lam + alpha * step_lambda
        prim_norm = alpha * float(jnp.max(jnp.abs(step)))
        if prim_norm < float(params.sqp.eps_prim):
            status = Status.SOLVED
            break

    if status != Status.SOLVED:
        xs0 = jnp.tile(z0[:NX], N + 1)
        z = jnp.concatenate([xs0, jnp.zeros(NU * N, dtype=dtype)])
    times.total = time.perf_counter() - t_total0
    return z, status, times
