"""Dense QP solver + SQP loop + MPC tick — numpy oracle.

The QP is solved by a standard dense Mehrotra predictor-corrector
interior-point method (equalities kept explicit, two-sided rows split into
one-sided inequalities, KKT systems by ``numpy.linalg.solve``) to ~1e-10
residuals — deliberately a *different algorithm family* from both the
production ADMM and the structured Riccati IPM, so its solutions are an
independent near-exact ground truth for the same QP data.

The SQP loop mirrors `OsqpInterface::solveOCP` (`osqp_interface.cpp:398-590`)
including the filter line search with its acceptance latch
(`filterLineSearch`, :759-808: ``is_alpha_accepted`` is never reset after
the first rejection, so only the alpha = 1 trial can be accepted and a
rejection decays alpha through all trials to tau^max_iter).

The MPC tick mirrors `MPC::runMPC_` (`mpc.cpp:104-190`): projection,
vs re-derivation, warm-start shift + RK4 tail rollout, s-unwrap,
per-tick frozen KnotData, 5-strike status machine.
"""

from __future__ import annotations

import numpy as np

from . import nlp
from .nlp import (DOF, N, N_VAR, NU, NX, S_IDX, VS_IDX, KnotData,
                  OracleParams, split_z)
from .track_eval import OracleTrack

STATUS_SOLVED = 0
STATUS_MAX_ITER = 1
STATUS_NAN_HESSIAN = 2
STATUS_NON_PD = 3


def solve_qp_dense(h, g, a, l, u, tol=1e-10, max_iter=60):
    """min 1/2 d'Hd + g'd  s.t.  l <= A d <= u   (near-exact IPM).

    Rows with l == u and a nonzero Jacobian become equalities; zero rows
    (structural padding: terminal polytopic, unused rate slots) are dropped.
    Returns (d, lam_rows) with lam_rows the signed row duals in the original
    row order (upper minus lower multiplier), OSQP's dual convention.
    """
    n = h.shape[0]
    row_nonzero = np.abs(a).max(axis=1) > 0.0
    is_eq = row_nonzero & (np.abs(u - l) < 1e-12)
    e_mat = a[is_eq]
    b_eq = u[is_eq]
    # one-sided inequalities
    iu = row_nonzero & ~is_eq & (u < 1e20)
    il = row_nonzero & ~is_eq & (l > -1e20)
    g_mat = np.concatenate([a[iu], -a[il]], axis=0)
    h_vec = np.concatenate([u[iu], -l[il]])
    m_eq, m_in = e_mat.shape[0], g_mat.shape[0]

    d = np.zeros(n)
    nu = np.zeros(m_eq)
    s = np.ones(m_in)
    lam = np.ones(m_in)
    for _ in range(max_iter):
        r_dual = h @ d + g + e_mat.T @ nu + g_mat.T @ lam
        r_eq = e_mat @ d - b_eq
        r_in = g_mat @ d + s - h_vec
        mu = float(s @ lam) / max(m_in, 1)
        if (max(np.abs(r_dual).max(), np.abs(r_eq).max() if m_eq else 0.0,
                np.abs(r_in).max() if m_in else 0.0) < tol and mu < tol):
            break

        def kkt_solve(rd, re, ri, rc):
            # eliminate (ds, dlam):  dlam = (rc - lam*ds)/s,
            # ds = -ri - G dd  ->  reduced H + G'(lam/s)G bordered system
            w = lam / s
            h_bar = h + g_mat.T @ (w[:, None] * g_mat)
            top = np.concatenate([h_bar, e_mat.T], axis=1)
            bot = np.concatenate([e_mat, np.zeros((m_eq, m_eq))], axis=1)
            kkt = np.concatenate([top, bot], axis=0)
            r1 = -rd - g_mat.T @ ((rc + lam * ri) / s)
            sol = np.linalg.solve(kkt, np.concatenate([r1, -re]))
            dd = sol[:n]
            dnu = sol[n:]
            ds = -ri - g_mat @ dd
            dlam = (rc - lam * ds) / s
            return dd, dnu, ds, dlam

        # predictor
        rc_aff = -s * lam
        dd_a, dnu_a, ds_a, dlam_a = kkt_solve(r_dual, r_eq, r_in, rc_aff)

        def max_step(v, dv):
            neg = dv < 0
            return min(1.0, float(np.min(-v[neg] / dv[neg])) if neg.any() else 1.0)

        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dlam_a)
        mu_aff = float((s + a_p * ds_a) @ (lam + a_d * dlam_a)) / max(m_in, 1)
        sigma = (mu_aff / max(mu, 1e-300)) ** 3
        # corrector
        rc = sigma * mu - s * lam - ds_a * dlam_a
        dd, dnu, ds, dlam = kkt_solve(r_dual, r_eq, r_in, rc)
        a_p = 0.995 * max_step(s, ds)
        a_d = 0.995 * max_step(lam, dlam)
        al = min(a_p, a_d)
        d += al * dd
        nu += al * dnu
        s += al * ds
        lam += al * dlam

    # map duals back to the original row order (OSQP sign convention:
    # positive at the upper bound, negative at the lower bound)
    lam_rows = np.zeros(a.shape[0])
    lam_rows[is_eq] = nu
    lam_u = lam[:int(iu.sum())]
    lam_l = lam[int(iu.sum()):]
    lam_rows[iu] += lam_u
    lam_rows[il] -= lam_l
    return d, lam_rows


def solve_ocp(tr: OracleTrack, p: OracleParams, rbs, z0, current_u, ts):
    """SQP loop (`solveOCP`).  Returns (z, status, n_iters)."""
    z = z0.copy()
    lam = np.zeros(nlp.N_CONSTR)
    filters: list[tuple[float, float]] = []
    status = STATUS_MAX_ITER
    it = 0
    for it in range(p.sqp_max_iter):
        hess, grad, a, l, u, obj, constr = nlp.build_dense_qp(
            tr, p, z, rbs, current_u, ts)
        if np.isnan(hess).any():
            status = STATUS_NAN_HESSIAN
            break
        try:
            np.linalg.cholesky(hess + 1e-14 * np.eye(N_VAR))
        except np.linalg.LinAlgError:
            status = STATUS_NON_PD
            break
        step, lam_qp = solve_qp_dense(hess, grad, a, l - constr, u - constr)
        step_lambda = lam_qp - lam

        # filter line search with the reference's acceptance latch
        alpha = 1.0
        accepted_once = True
        for _ in range(p.ls_max_iter):
            z_try = z + alpha * nlp.denormalize_step(p, step)
            obj_t = nlp.total_objective(tr, p, z_try, rbs)
            c_t, l_t, u_t = nlp.constraint_values(tr, p, z_try, rbs,
                                                  current_u, ts)
            vio_t = float(np.maximum(l_t - c_t, 0).sum()
                          + np.maximum(c_t - u_t, 0).sum())
            for fo, fv in filters:
                if obj_t >= fo and vio_t >= fv:
                    accepted_once = False
                    break
            if accepted_once:
                filters = [(fo, fv) for fo, fv in filters
                           if obj_t > fo or vio_t > fv]
                filters.append((obj_t, vio_t))
                break
            alpha *= p.ls_tau

        z = z + alpha * nlp.denormalize_step(p, step)
        lam = lam + alpha * step_lambda
        prim_norm = alpha * float(np.abs(step).max())
        if prim_norm < p.eps_prim:
            status = STATUS_SOLVED
            break

    if status != STATUS_SOLVED:
        z = np.concatenate([np.tile(z0[:NX], N + 1), np.zeros(NU * N)])
    return z, status, it + 1


class OracleMPC:
    """Closed-loop controller state (`MPC::runMPC_`, `mpc.cpp:104-190`)."""

    def __init__(self, track: OracleTrack, params: OracleParams,
                 sel_net, env_net, ts=0.01):
        self.tr = track
        self.p = params
        self.sel = sel_net
        self.env = env_net
        self.ts = ts
        self.z_guess = None
        self.valid = False
        self.n_failed = 0

    def _warm_start(self, x0):
        xs, us = split_z(self.z_guess)
        xs_s = np.concatenate([x0[None], xs[2:], xs[-1:]], axis=0)
        us_s = np.concatenate([us[1:], us[-1:]], axis=0)
        xs_s[N - 1] = xs_s[N - 2]
        us_s[N - 1] = us_s[N - 2]
        x_term = nlp.rk4_step(xs_s[N - 1], us_s[N - 1], self.ts)
        xs_new = np.concatenate([xs_s[:N], x_term[None]], axis=0)
        return np.concatenate([xs_new.reshape(-1), us_s.reshape(-1)])

    def step(self, x0, u0, obs_pos=(3.0, 3.0, 3.0), obs_radius=0.0):
        """Returns (ok, x0_updated, u0_opt, horizon_z, status)."""
        x0 = np.asarray(x0, dtype=np.float64).copy()
        u0 = np.asarray(u0, dtype=np.float64)
        q, dq = x0[:DOF], u0[:DOF]
        from . import panda
        ee_pos, _ = panda.ee_pose(q)
        last_s = x0[S_IDX]
        s_proj = self.tr.project(last_s, ee_pos, self.p.max_dist_proj)
        jv = panda.jacobian(q)[:3]
        vs = float((jv @ dq) @ self.tr.dpos(s_proj))
        x0[S_IDX], x0[VS_IDX] = s_proj, vs

        jumped = abs(last_s - s_proj) > self.p.max_dist_proj
        valid = self.valid and not jumped
        if jumped:
            self.n_failed += 1

        if valid:
            z0 = self._warm_start(x0)
        else:
            z0 = np.concatenate([np.tile(x0, N + 1), np.zeros(NU * N)])
        # unwrap: clamp s of knots 1..N to <= L (`unwrapInitialGuess`)
        xs, us = split_z(z0)
        xs[1:, S_IDX] = np.minimum(xs[1:, S_IDX], self.tr.length)
        z0 = np.concatenate([xs.reshape(-1), us.reshape(-1)])

        rbs = [KnotData(xs[k, :DOF], self.sel, self.env, obs_pos, obs_radius)
               for k in range(N + 1)]
        z, status, _ = solve_ocp(self.tr, self.p, rbs, z0, u0, self.ts)

        solved = status == STATUS_SOLVED
        self.valid = solved
        self.n_failed = 0 if solved else self.n_failed + 1
        ok = solved or (status == STATUS_MAX_ITER and self.n_failed < 5)
        self.z_guess = z
        _, us_sol = split_z(z)
        return ok, x0, us_sol[0].copy(), z, status
