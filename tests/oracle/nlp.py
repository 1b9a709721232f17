"""Cost, constraints, bounds, dynamics + dense QP assembly — numpy oracle.

Transcribed from the reference equations, with explicit per-knot loops and
the exact dense row layout of `osqp_interface.cpp:104-396`:

  z = [x_0..x_N, u_0..u_{N-1}]   (179 vars)
  rows = [ eq (99) | state box (99) | input box (80) | ddq rate (80) |
           polytopic (121) ]     (479 rows)

Deviations reproduced on purpose (see tests/oracle/__init__.py): signed
lag-error derivative, input-box Jacobians on the input columns, true z
second derivative in the track normal.
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import panda
from .track_eval import OracleTrack, log_rot, skew

N = 10
NX = 9
NU = 8
DOF = 7
NPC = 11
N_LINKS = 9
INF = 1e30
N_VAR = NX * (N + 1) + NU * N
N_EQ = NX * (N + 1)
N_BOUND = NX * (N + 1) + NU * N + NU * N
N_POLY = NPC * (N + 1)
N_CONSTR = N_EQ + N_BOUND + N_POLY
S_IDX, VS_IDX = 7, 8

_PARAM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "..", "assets", "params")


class OracleParams:
    """Flat f64 parameter set read straight from the JSON assets."""

    def __init__(self, param_dir: str | None = None):
        d = param_dir or _PARAM_DIR
        def load(name):
            with open(os.path.join(d, name)) as f:
                return json.load(f)
        cost = load("cost.json")
        model = load("model.json")
        bounds = load("bounds.json")
        norm = load("normalization.json")
        sqp = load("sqp.json")
        self.q_c = float(cost["qC"]); self.q_c_N_mult = float(cost["qCNmult"])
        self.q_l = float(cost["qL"]); self.q_vs = float(cost["qVs"])
        self.q_ori = float(cost["qOri"]); self.q_sing = float(cost["qSing"])
        self.r_dq = float(cost["rdq"]); self.r_ddq = float(cost["rddq"])
        self.r_dvs = float(cost["rdVs"])
        self.q_c_red = float(cost["qC_reduction_ratio"])
        self.q_l_inc = float(cost["qL_increase_ratio"])
        self.q_ori_red = float(cost["qOri_reduction_ratio"])
        self.desired_ee_vel = float(model["desired_ee_velocity"])
        self.deacc_ratio = float(model["deaccelerate_ratio"])
        self.tol_selcol = float(model["tol_selcol"])
        self.tol_sing = float(model["tol_sing"])
        self.tol_envcol = float(model["tol_envcol"])
        self.s_trust_region = float(model["s_trust_region"])
        self.max_dist_proj = float(model["max_dist_proj"])
        qk = [f"q{i}" for i in range(1, 8)]
        dqk = [f"dq{i}" for i in range(1, 8)]
        self.x_l = np.array([bounds[k + "l"] for k in qk] + [bounds["sl"], bounds["vsl"]])
        self.x_u = np.array([bounds[k + "u"] for k in qk] + [bounds["su"], bounds["vsu"]])
        self.u_l = np.array([bounds[k + "l"] for k in dqk] + [bounds["dVsl"]])
        self.u_u = np.array([bounds[k + "u"] for k in dqk] + [bounds["dVsu"]])
        self.ddq_l = np.array([bounds[f"ddq{i}l"] for i in range(1, 8)])
        self.ddq_u = np.array([bounds[f"ddq{i}u"] for i in range(1, 8)])
        self.t_x = np.array([norm[k] for k in qk] + [norm["s"], norm["vs"]])
        self.t_u = np.array([norm[k] for k in dqk] + [norm["dVs"]])
        self.eps_prim = float(sqp["eps_prim"])
        self.ls_tau = float(sqp["line_search_tau"])
        self.ls_max_iter = int(sqp["line_search_max_iter"])
        self.sqp_max_iter = int(sqp["max_iter"])


def discrete_model(ts: float):
    """Exact ZOH of the (nilpotent) linear model (`model.cpp:31-124`)."""
    a = np.zeros((NX, NX)); a[S_IDX, VS_IDX] = 1.0
    b = np.zeros((NX, NU))
    b[:DOF, :DOF] = np.eye(DOF)
    b[VS_IDX, DOF] = 1.0
    ad = np.eye(NX) + a * ts
    bd = (np.eye(NX) * ts + a * ts * ts / 2.0) @ b
    gd = np.zeros(NX)
    return ad, bd, gd


def rk4_step(x: np.ndarray, u: np.ndarray, ts: float) -> np.ndarray:
    def f(xx):
        dx = np.zeros(NX)
        dx[:DOF] = u[:DOF]
        dx[S_IDX] = xx[VS_IDX]
        dx[VS_IDX] = u[DOF]
        return dx
    k1 = f(x); k2 = f(x + ts / 2 * k1)
    k3 = f(x + ts / 2 * k2); k4 = f(x + ts * k3)
    return x + ts / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def sim_time_step(x, u, ts, fine=0.001):
    n = int(round(ts / fine))
    for _ in range(n):
        x = rk4_step(x, u, fine)
    return x


class KnotData:
    """The reference's per-knot RobotData cache (`robot_data.h:11-94`)."""

    def __init__(self, q, sel_net, env_net, obs_pos, obs_radius):
        self.q = np.asarray(q, dtype=np.float64)
        self.ee_pos, self.ee_rot = panda.ee_pose(self.q)
        j = panda.jacobian(self.q)
        self.jv, self.jw = j[:3], j[3:]
        self.mani = panda.manipulability(self.q)
        self.d_mani = panda.d_manipulability(self.q)
        v, jac = sel_net.value_and_jacobian(self.q)
        self.sel_dist = float(v[0])
        self.d_sel = jac[0]
        ve, je = env_net.value_and_jacobian(
            np.concatenate([self.q, np.asarray(obs_pos, dtype=np.float64)]))
        self.env_dist = ve
        self.d_env = je[:, :DOF]
        self.obs_radius = float(obs_radius)


def rbf(h, delta=-0.5):
    if h >= delta:
        return -np.log(h + 1.0)
    return (-np.log(delta + 1.0) - (h - delta) / (delta + 1.0)
            + (h - delta) ** 2 / (2.0 * (delta + 1.0) ** 2))


def drbf(h, delta=-0.5):
    if h >= delta:
        return -1.0 / (h + 1.0)
    return -1.0 / (delta + 1.0) + (h - delta) / (delta + 1.0) ** 2


def _cubic_blend(x, x0, xf, y0, yf):
    t = (x - x0) / (xf - x0)
    return y0 + (yf - y0) * (3.0 * t * t - 2.0 * t ** 3)


def knot_cost(tr: OracleTrack, p: OracleParams, x, u, rb: KnotData, k,
              want_derivs=True):
    """obj, f_x, f_u, f_xx, f_uu, f_xu at one knot (`Cost::getCost`)."""
    x = np.asarray(x); u = np.asarray(u)
    s, vs = x[S_IDX], x[VS_IDX]
    dq = u[:DOF]

    # proximity-triggered weight scheduling (`cost.cpp:290-308`)
    ratio = min(rb.sel_dist / (p.tol_selcol * 2.0), rb.mani / (p.tol_sing * 2.0))
    if ratio <= 1.0:
        q_c = p.q_c * _cubic_blend(ratio, 0.5, 1.0, p.q_c_red, 1.0)
        q_l = p.q_l * _cubic_blend(ratio, 0.5, 1.0, p.q_l_inc, 1.0)
        q_ori = p.q_ori * _cubic_blend(ratio, 0.5, 1.0, p.q_ori_red, 1.0)
    else:
        q_c, q_l, q_ori = p.q_c, p.q_l, p.q_ori
    qc_k = q_c if k < N else p.q_c_N_mult * q_c

    # ---- contouring / lag (`getContouringCost`)
    pos_ref = tr.pos(s)
    tangent = tr.dpos(s)
    normal = tr.ddpos(s)       # true ddz (documented deviation)
    e_tot = rb.ee_pos - pos_ref
    te = float(tangent @ e_tot)
    e_lag = te * tangent
    e_cont = e_tot - e_lag

    s_max = tr.length
    if s < s_max * p.deacc_ratio:
        v_des = p.desired_ee_vel
    else:
        v_des = -p.desired_ee_vel / (s_max * p.deacc_ratio) * (s - s_max)

    obj = (qc_k * float(e_cont @ e_cont) + q_l * float(e_lag @ e_lag)
           + p.q_vs * (vs - v_des) ** 2)

    # ---- heading (`getHeadingCost`)
    r_ref = tr.rot(s)
    r_bar = r_ref.T @ rb.ee_rot
    log_rb = log_rot(r_bar)
    obj += q_ori * float(log_rb @ log_rb)

    # ---- input (`getInputCost`)
    if k != N:
        obj += p.r_dq * float(dq @ dq) + p.r_dvs * u[DOF] ** 2

    # ---- singularity (`getSingularityCost`)
    obj += -p.q_sing * rb.mani

    if not want_derivs:
        return obj, None, None, None, None, None

    d_tot = np.zeros((3, NX))
    d_tot[:, :DOF] = rb.jv
    d_tot[:, S_IDX] = -tangent
    d_tan = np.zeros((3, NX))
    d_tan[:, S_IDX] = normal
    # signed t.e (documented deviation from `cost.cpp:110`)
    d_lag = (np.outer(tangent, tangent) @ d_tot
             + (np.outer(tangent, e_tot) + te * np.eye(3)) @ d_tan)
    d_cont = d_tot - d_lag

    f_x = 2.0 * qc_k * d_cont.T @ e_cont + 2.0 * q_l * d_lag.T @ e_lag
    f_x[VS_IDX] += 2.0 * p.q_vs * (vs - v_des)
    f_xx = 2.0 * qc_k * d_cont.T @ d_cont + 2.0 * q_l * d_lag.T @ d_lag
    f_xx[VS_IDX, VS_IDX] += 2.0 * p.q_vs

    # heading linearization (`cost.cpp:186-192`)
    th = np.linalg.norm(log_rb)
    if th < 1e-8:
        j_r_inv = np.eye(3)
    else:
        k_m = skew(log_rb)
        j_r_inv = (np.eye(3) + 0.5 * k_m
                   + (1.0 / th ** 2 + (1.0 + np.cos(th))
                      / (2.0 * th * np.sin(th))) * (k_m @ k_m))
    d_log = np.zeros((3, NX))
    d_log[:, :DOF] = j_r_inv @ rb.ee_rot.T @ rb.jw
    d_log[:, S_IDX] = -j_r_inv @ rb.ee_rot.T @ tr.drot(s)
    f_x += 2.0 * q_ori * d_log.T @ log_rb
    f_xx += 2.0 * q_ori * d_log.T @ d_log

    f_u = np.zeros(NU)
    f_uu = np.zeros((NU, NU))
    if k != N:
        f_u[:DOF] = 2.0 * p.r_dq * dq
        f_u[DOF] = 2.0 * p.r_dvs * u[DOF]
        f_uu[:DOF, :DOF] = 2.0 * p.r_dq * np.eye(DOF)
        f_uu[DOF, DOF] = 2.0 * p.r_dvs

    f_x[:DOF] += -p.q_sing * rb.d_mani

    f_xu = np.zeros((NX, NU))
    # Tikhonov (`cost.cpp:349-354`)
    f_xx += np.eye(NX) * 1e-6
    f_uu += np.eye(NU) * 1e-6
    return obj, f_x, f_u, f_xx, f_uu, f_xu


def knot_constraints(p: OracleParams, u, rb: KnotData, k, want_jac=True):
    """NPC rows at one knot (`Constraints::getConstraints`)."""
    dq = np.asarray(u)[:DOF]
    c = np.zeros(NPC); c_l = np.zeros(NPC); c_u = np.zeros(NPC)
    c_x = np.zeros((NPC, NX)); c_uj = np.zeros((NPC, NU))
    if k != N:
        # self-collision
        h_sel = 0.01 * rb.sel_dist - 0.01 * p.tol_selcol
        d_sel = 0.01 * rb.d_sel
        c[0] = -float(d_sel @ dq) + rbf(h_sel)
        c_l[0] = -INF
        c_x[0, :DOF] = drbf(h_sel) * d_sel
        c_uj[0, :DOF] = -d_sel
        # singularity
        h_sing = rb.mani - p.tol_sing
        c[1] = -float(rb.d_mani @ dq) + rbf(h_sing)
        c_l[1] = -INF
        c_x[1, :DOF] = drbf(h_sing) * rb.d_mani
        c_uj[1, :DOF] = -rb.d_mani
        # env-collision
        h_env = 0.01 * (rb.env_dist - 1.2 * rb.obs_radius) - 0.01 * p.tol_envcol
        d_env = 0.01 * rb.d_env
        for j in range(N_LINKS):
            c[2 + j] = -float(d_env[j] @ dq) + rbf(h_env[j])
            c_l[2 + j] = -INF
            c_x[2 + j, :DOF] = drbf(h_env[j]) * d_env[j]
            c_uj[2 + j, :DOF] = -d_env[j]
    if not want_jac:
        return c, c_l, c_u
    return c, c_l, c_u, c_x, c_uj


def split_z(z):
    xs = z[:NX * (N + 1)].reshape(N + 1, NX)
    us = z[NX * (N + 1):].reshape(N, NU)
    return xs, us


def total_objective(tr, p, z, rbs):
    xs, us = split_z(z)
    obj = 0.0
    for k in range(N + 1):
        u_k = us[k] if k < N else np.zeros(NU)
        obj += knot_cost(tr, p, xs[k], u_k, rbs[k], k, want_derivs=False)[0]
    for k in range(N - 1):
        d = us[k + 1, :DOF] - us[k, :DOF]
        obj += p.r_ddq * float(d @ d)
    return obj


def constraint_values(tr, p, z, rbs, current_u, ts):
    """(constr, l, u) stacked, value-only (line-search evaluations)."""
    xs, us = split_z(z)
    ad, bd, gd = discrete_model(ts)
    t_x_inv = 1.0 / p.t_x
    c = np.zeros(N_CONSTR); l = np.zeros(N_CONSTR); u = np.zeros(N_CONSTR)
    # equality
    for i in range(1, N + 1):
        c[NX * i:NX * (i + 1)] = t_x_inv * (
            xs[i] - (ad @ xs[i - 1] + bd @ us[i - 1] + gd))
    # state box
    o = N_EQ
    for i in range(N + 1):
        c[o + NX * i:o + NX * (i + 1)] = xs[i]
        li = p.x_l.copy(); ui = p.x_u.copy()
        li[S_IDX] = max(xs[i][S_IDX] - p.s_trust_region, 0.0)
        ui[S_IDX] = min(xs[i][S_IDX] + p.s_trust_region, tr.length)
        l[o + NX * i:o + NX * (i + 1)] = li
        u[o + NX * i:o + NX * (i + 1)] = ui
    # input box
    o = N_EQ + NX * (N + 1)
    for i in range(N):
        c[o + NU * i:o + NU * (i + 1)] = us[i]
        l[o + NU * i:o + NU * (i + 1)] = p.u_l
        u[o + NU * i:o + NU * (i + 1)] = p.u_u
    # ddq rate
    o = N_EQ + NX * (N + 1) + NU * N
    for i in range(N):
        if i == 0:
            c[o + NU * i:o + NU * i + DOF] = us[0, :DOF] / ts
            l[o + NU * i:o + NU * i + DOF] = p.ddq_l + current_u[:DOF] / ts
            u[o + NU * i:o + NU * i + DOF] = p.ddq_u + current_u[:DOF] / ts
        else:
            c[o + NU * i:o + NU * i + DOF] = (us[i, :DOF] - us[i - 1, :DOF]) / ts
            l[o + NU * i:o + NU * i + DOF] = p.ddq_l
            u[o + NU * i:o + NU * i + DOF] = p.ddq_u
    # polytopic
    o = N_EQ + N_BOUND
    for k in range(N + 1):
        u_k = us[k] if k < N else np.zeros(NU)
        ck, clk, cuk = knot_constraints(p, u_k, rbs[k], k, want_jac=False)
        c[o + NPC * k:o + NPC * (k + 1)] = ck
        l[o + NPC * k:o + NPC * (k + 1)] = clk
        u[o + NPC * k:o + NPC * (k + 1)] = cuk
    return c, l, u


def build_dense_qp(tr, p, z, rbs, current_u, ts):
    """Full normalized dense QP: (H, g, A, l, u, obj, constr)."""
    xs, us = split_z(z)
    t_x, t_u = p.t_x, p.t_u
    t_x_inv = 1.0 / t_x
    tudq = t_u[:DOF]
    x_off = lambda i: NX * i
    u_off = lambda i: NX * (N + 1) + NU * i

    hess = np.zeros((N_VAR, N_VAR))
    grad = np.zeros(N_VAR)
    obj = 0.0
    for k in range(N + 1):
        u_k = us[k] if k < N else np.zeros(NU)
        o_k, f_x, f_u, f_xx, f_uu, f_xu = knot_cost(tr, p, xs[k], u_k, rbs[k], k)
        obj += o_k
        grad[x_off(k):x_off(k) + NX] = t_x * f_x
        hess[x_off(k):x_off(k) + NX, x_off(k):x_off(k) + NX] = (
            np.diag(t_x) @ f_xx @ np.diag(t_x))
        if k != N:
            grad[u_off(k):u_off(k) + NU] = t_u * f_u
            hess[u_off(k):u_off(k) + NU, u_off(k):u_off(k) + NU] = (
                np.diag(t_u) @ f_uu @ np.diag(t_u))
            blk = np.diag(t_x) @ f_xu @ np.diag(t_u)
            hess[x_off(k):x_off(k) + NX, u_off(k):u_off(k) + NU] = blk
            hess[u_off(k):u_off(k) + NU, x_off(k):x_off(k) + NX] = blk.T
    # ddq smoothness (`setCost`, osqp_interface.cpp:166-217)
    for i in range(N):
        if i != N - 1:
            d = us[i + 1, :DOF] - us[i, :DOF]
            obj += p.r_ddq * float(d @ d)
        if i == 0:
            g_dd = 2.0 * p.r_ddq * (us[0, :DOF] - us[1, :DOF])
            h_ii = 2.0 * p.r_ddq * np.eye(DOF)
            h_ij = -2.0 * p.r_ddq * np.eye(DOF)
        elif i == N - 1:
            g_dd = 2.0 * p.r_ddq * (us[i, :DOF] - us[i - 1, :DOF])
            h_ii = 2.0 * p.r_ddq * np.eye(DOF)
            h_ij = None
        else:
            g_dd = 2.0 * p.r_ddq * (2 * us[i, :DOF] - us[i + 1, :DOF]
                                    - us[i - 1, :DOF])
            h_ii = 4.0 * p.r_ddq * np.eye(DOF)
            h_ij = -2.0 * p.r_ddq * np.eye(DOF)
        grad[u_off(i):u_off(i) + DOF] += tudq * g_dd
        hess[u_off(i):u_off(i) + DOF, u_off(i):u_off(i) + DOF] += (
            np.diag(tudq) @ h_ii @ np.diag(tudq))
        if h_ij is not None:
            blk = np.diag(tudq) @ h_ij @ np.diag(tudq)
            hess[u_off(i):u_off(i) + DOF, u_off(i + 1):u_off(i + 1) + DOF] += blk
            hess[u_off(i + 1):u_off(i + 1) + DOF, u_off(i):u_off(i) + DOF] += blk

    # ---- constraint Jacobian
    a = np.zeros((N_CONSTR, N_VAR))
    ad, bd, gd = discrete_model(ts)
    a[0:NX, 0:NX] = np.eye(NX)
    for i in range(1, N + 1):
        a[NX * i:NX * (i + 1), x_off(i - 1):x_off(i - 1) + NX] = (
            -np.diag(t_x_inv) @ ad @ np.diag(t_x))
        a[NX * i:NX * (i + 1), x_off(i):x_off(i) + NX] = np.eye(NX)
        a[NX * i:NX * (i + 1), u_off(i - 1):u_off(i - 1) + NU] = (
            -np.diag(t_x_inv) @ bd @ np.diag(t_u))
    o = N_EQ
    for i in range(N + 1):
        a[o + NX * i:o + NX * (i + 1), x_off(i):x_off(i) + NX] = np.diag(t_x)
    o = N_EQ + NX * (N + 1)
    for i in range(N):
        # input columns (documented deviation from osqp_interface.cpp:273)
        a[o + NU * i:o + NU * (i + 1), u_off(i):u_off(i) + NU] = np.diag(t_u)
    o = N_EQ + NX * (N + 1) + NU * N
    for i in range(N):
        a[o + NU * i:o + NU * i + DOF, u_off(i):u_off(i) + DOF] = (
            np.diag(tudq) / ts)
        if i > 0:
            a[o + NU * i:o + NU * i + DOF,
              u_off(i - 1):u_off(i - 1) + DOF] = -np.diag(tudq) / ts
    o = N_EQ + N_BOUND
    for k in range(N + 1):
        u_k = us[k] if k < N else np.zeros(NU)
        _, _, _, c_x, c_uj = knot_constraints(p, u_k, rbs[k], k)
        a[o + NPC * k:o + NPC * (k + 1), x_off(k):x_off(k) + NX] = (
            c_x @ np.diag(t_x))
        if k != N:
            a[o + NPC * k:o + NPC * (k + 1), u_off(k):u_off(k) + NU] = (
                c_uj @ np.diag(t_u))

    constr, l, u = constraint_values(tr, p, z, rbs, current_u, ts)
    return hess, grad, a, l, u, obj, constr


def denormalize_step(p: OracleParams, step):
    out = np.zeros(N_VAR)
    for i in range(N + 1):
        out[NX * i:NX * (i + 1)] = p.t_x * step[NX * i:NX * (i + 1)]
    o = NX * (N + 1)
    for i in range(N):
        out[o + NU * i:o + NU * (i + 1)] = p.t_u * step[o + NU * i:o + NU * (i + 1)]
    return out
