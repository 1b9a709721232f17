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
from ..ocp import qp_stages as qps
from ..ocp.robot_data import RobotData
from ..params import MPCCParams, SQPConfig
from ..splines.arc_length import TrackSpline
from ..system import PANDA
from . import qp_admm, qp_ipm
from .sqp import Status, constraint_norm, _soc_corrected_rep, _stage_model_terms


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
    """Host-level SQP loop with phase timing.
    Returns ``(z, status, times, sqp_iters)``."""
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
    return z, status, times, it + 1


# ------------------------------------------------------------------
# Riccati-family phase-timed SQP + the fully profiled MPC tick
# ------------------------------------------------------------------


@partial(jax.jit, static_argnames=("ts", "exact_heading_jac", "solver",
                                   "assembly"))
def _build_stages_jit(track, z, rb, params, current_u, ts, exact_heading_jac,
                      solver, assembly="xla"):
    if solver == "riccati_pallas" and assembly == "pallas":
        # production assembly kernel (profiled set_qp phase matches the
        # shipped configuration)
        from ..ops import pallas_assembly as pasm
        return pasm.build_qp_stages_k_pallas(track, z, rb, params, current_u,
                                             ts, exact_heading_jac)
    if solver == "riccati_pallas":
        return qps.build_qp_stages_k(track, z, rb, params, current_u, ts,
                                     exact_heading_jac)
    if solver == "riccati_struct":
        return qps.build_qp_stages_s(track, z, rb, params, current_u, ts,
                                     exact_heading_jac)
    return qps.build_qp_stages(track, z, rb, params, current_u, ts,
                               exact_heading_jac)


@partial(jax.jit, static_argnames=("solver",))
def _soc_rep_jit(rep, sol, z, length, params, solver):
    return _soc_corrected_rep(rep, sol, z, length, params, solver, PANDA)


@partial(jax.jit, static_argnames=("solver",))
def _model_terms_jit(rep, sol, solver):
    return _stage_model_terms(rep, sol, solver, PANDA)


def _ipm_solve(rep, cfg, warm_s=None, warm_lam=None):
    if cfg.qp_solver == "riccati_pallas":
        from . import qp_ipm_pallas
        return qp_ipm_pallas.solve_qp_ipm_pallas(
            rep, max_iter=cfg.ipm_max_iter, scheme=cfg.ipm_scheme,
            warm_s=warm_s, warm_lam=warm_lam)
    if cfg.qp_solver == "riccati_struct":
        return qp_ipm.solve_qp_ipm_s(rep, max_iter=cfg.ipm_max_iter,
                                     scheme=cfg.ipm_scheme,
                                     warm_s=warm_s, warm_lam=warm_lam)
    return qp_ipm.solve_qp_ipm(rep, max_iter=cfg.ipm_max_iter,
                               scheme=cfg.ipm_scheme,
                               warm_s=warm_s, warm_lam=warm_lam)


def solve_ocp_timed_riccati(track: TrackSpline, rb: RobotData,
                            params: MPCCParams, cfg: SQPConfig,
                            z0: jnp.ndarray, current_u: jnp.ndarray,
                            ts: float, exact_heading_jac: bool = False):
    """Phase-timed SQP on the structured Riccati/IPM family (set_qp =
    stage assembly, solve_qp = IPM (+SOC re-solve), get_alpha = line
    search).  Same semantics as the fused `solve_ocp` riccati path.
    Returns ``(z, status, times, sqp_iters)``."""
    t_total0 = time.perf_counter()
    times = ComputeTime()
    dtype = z0.dtype
    z = z0
    filter_list: list[tuple[float, float]] = []
    alpha_fail = float(params.sqp.line_search_tau) ** cfg.line_search_max_iter
    status = Status.MAX_ITER_EXCEEDED
    solver = cfg.qp_solver
    # cross-iteration IPM warm state (mirrors solve_ocp's carry so the
    # profiled Newton iteration counts match the production path when
    # cfg.ipm_warm_start is on — ADVICE r3)
    warm_s = warm_lam = None
    if cfg.ipm_warm_start:
        _clip = lambda a: jnp.clip(a, cfg.ipm_warm_clip_lo,
                                   cfg.ipm_warm_clip_hi)

    for it in range(cfg.max_iter):
        t0 = time.perf_counter()
        rep = _build_stages_jit(track, z, rb, params, current_u, ts,
                                exact_heading_jac, solver, cfg.qp_assembly)
        jax.block_until_ready(rep)
        times.set_qp += time.perf_counter() - t0

        t0 = time.perf_counter()
        sol = _ipm_solve(rep, cfg, warm_s, warm_lam)
        if cfg.do_SOC:
            rep_soc = _soc_rep_jit(rep, sol, z, track.length, params, solver)
            if cfg.ipm_warm_start:
                sol = _ipm_solve(rep_soc, cfg, _clip(sol.s_rows),
                                 _clip(sol.lam_rows))
            else:
                sol = _ipm_solve(rep_soc, cfg)
        if cfg.ipm_warm_start and not bool(jnp.any(jnp.isnan(sol.s_rows))):
            warm_s, warm_lam = _clip(sol.s_rows), _clip(sol.lam_rows)
        step = qps.stage_step_to_dense(sol.dx_tilde, sol.du)
        jax.block_until_ready(step)
        times.solve_qp += time.perf_counter() - t0

        if bool(jnp.any(jnp.isnan(step))):
            status = Status.NAN_HESSIAN
            break

        t0 = time.perf_counter()
        if cfg.line_search == "merit":
            obj0, vio0 = _eval_point_jit(track, z, rb, params, current_u, ts,
                                         exact_heading_jac)
            q_dot, quad = _model_terms_jit(rep, sol, solver)
            rho = float(params.sqp.line_search_rho)
            eta = float(params.sqp.line_search_eta)
            tau = float(params.sqp.line_search_tau)
            mu = float((q_dot + 0.5 * quad)
                       / ((1.0 - rho) * max(float(vio0), 1e-12)))
            phi0 = float(obj0) + mu * float(vio0)
            dp_phi = float(q_dot) - mu * float(vio0)
            alpha = 1.0
            for _ in range(cfg.line_search_max_iter):
                obj_a, vio_a = _eval_point_jit(
                    track, z + alpha * _denorm_jit(step, params), rb, params,
                    current_u, ts, exact_heading_jac)
                if float(obj_a) + mu * float(vio_a) <= phi0 + alpha * eta * dp_phi:
                    break
                alpha *= tau
        else:
            z_try = z + _denorm_jit(step, params)
            obj_try, vio_try = _eval_point_jit(track, z_try, rb, params,
                                               current_u, ts, exact_heading_jac)
            obj_try, vio_try = float(obj_try), float(vio_try)
            dominated = any(obj_try >= fo and vio_try >= fv
                            for fo, fv in filter_list)
            if not dominated:
                alpha = 1.0
                filter_list = [(fo, fv) for fo, fv in filter_list
                               if obj_try > fo or vio_try > fv]
                filter_list.append((obj_try, vio_try))
            else:
                alpha = alpha_fail
        times.get_alpha += time.perf_counter() - t0

        z = z + alpha * _denorm_jit(step, params)
        prim_norm = alpha * float(jnp.max(jnp.abs(step)))
        if prim_norm < float(params.sqp.eps_prim):
            status = Status.SOLVED
            break

    if status != Status.SOLVED:
        xs0 = jnp.tile(z0[:NX], N + 1)
        z = jnp.concatenate([xs0, jnp.zeros(NU * N, dtype=dtype)])
    times.total = time.perf_counter() - t_total0
    return z, status, times, it + 1


def mpc_step_profiled(track, params, sel_nn, env_nn, carry, x0, u0, obs_pos,
                      obs_radius, ts: float, cfg: SQPConfig,
                      exact_heading_jac: bool = False):
    """One MPC tick with per-phase wall-clock timing — the diagnostic
    equivalent of the reference's `ComputeTime` surface
    (`osqp_interface.h:71-79`, `python/MPCC/MPCC.py:108-112`).

    Mirrors `mpc.mpc_step` orchestration (projection, warm start, RobotData
    sweep, SQP, status machine) with each phase a separately synchronized
    call; `set_env` times the kinematics + NN linearization sweep (the
    reference's setEnvData/RobotData update).  Returns
    ``(new_carry, MPCOutput, ComputeTime)``; equivalence with the fused
    tick is pinned by tests/test_profile_api.py.
    """
    from .. import mpc as mpc_mod
    from ..models import kinematics as kin
    from ..ocp.robot_data import compute_robot_data
    from ..splines import arc_length as als

    t_total0 = time.perf_counter()
    dtype = x0.dtype
    system = PANDA
    q = x0[:system.dof]
    dq = u0[:system.dof]

    # projection + vs re-derivation + warm-start select (host-driven)
    last_s = x0[system.s_idx]
    s_proj = als.project_on_spline(track, last_s, kin.ee_position(q),
                                   params.model.max_dist_proj)
    jv = kin.ee_jacobian(q)[:3]
    vs = jnp.dot(jv @ dq, als.track_derivative(track, s_proj))
    x0_new = x0.at[system.s_idx].set(s_proj).at[system.vs_idx].set(vs)

    jumped = bool(jnp.abs(last_s - s_proj) > params.model.max_dist_proj)
    valid = bool(carry.valid_guess) and not jumped
    n_failed = int(carry.num_guess_failed) + (1 if jumped else 0)

    if valid:
        z0 = mpc_mod._unwrap_s(
            mpc_mod._shift_warm_start(carry.z_guess, x0_new, ts, system),
            track.length, system)
    else:
        z0 = mpc_mod._unwrap_s(mpc_mod._cold_start(x0_new, dtype, system),
                               track.length, system)

    # RobotData sweep = the reference's set_env + per-knot RobotData update
    t0 = time.perf_counter()
    xs0, _ = qp_data.split_z(z0, system)
    rb = compute_robot_data(xs0[:, :system.dof], obs_pos, obs_radius, sel_nn,
                            env_nn, mani_grad=cfg.mani_grad, system=system,
                            kin_backend=cfg.kin_backend,
                            kin_interpret=cfg.ipm_interpret)
    jax.block_until_ready(rb)
    set_env = time.perf_counter() - t0

    if cfg.qp_solver.startswith("riccati"):
        z, status, times, sqp_iters = solve_ocp_timed_riccati(
            track, rb, params, cfg, z0, u0, ts, exact_heading_jac)
    else:
        z, status, times, sqp_iters = solve_ocp_timed(
            track, rb, params, cfg, z0, u0, ts, exact_heading_jac)
    times.set_env = set_env

    solved = status == Status.SOLVED
    n_failed_next = 0 if solved else n_failed + 1
    ok = solved or (status == Status.MAX_ITER_EXCEEDED and n_failed_next < 5)

    xs, us = qp_data.split_z(z, system)
    new_carry = mpc_mod.MPCCarry(
        z_guess=z, valid_guess=jnp.asarray(solved),
        num_guess_failed=jnp.asarray(n_failed_next, dtype=jnp.int32),
        qp_x=carry.qp_x, qp_y=carry.qp_y,
        ipm_s=carry.ipm_s, ipm_lam=carry.ipm_lam)
    out = mpc_mod.MPCOutput(
        u0=us[0], x0_updated=x0_new, horizon_x=xs, horizon_u=us,
        status=jnp.asarray(status), ok=jnp.asarray(ok),
        sqp_iters=jnp.asarray(sqp_iters), qp_iters=jnp.asarray(-1))
    times.total = time.perf_counter() - t_total0
    return new_carry, out, times
