"""Dense ADMM QP solver — the TPU-native replacement for OSQP.

Solves   min 1/2 x'Px + q'x   s.t.  l <= Ax <= u
with the operator-splitting iteration of OSQP (Stellato et al.):

    x+ = solve(P + sigma I + A' diag(rho) A,  sigma x - q + A'(rho z - y))
    zt = A x+
    z+ = clip(alpha zt + (1-alpha) z + y/rho, l, u)
    y+ = y + rho (alpha zt + (1-alpha) z - z+)

TPU-first design decisions:

* the KKT system is solved via an explicitly formed inverse (one 179x179
  Cholesky + triangular inversions per factorization): each ADMM iteration
  then costs one dense matvec, which maps onto the MXU and — crucially —
  batches perfectly under vmap (thousands of scenario QPs become batched
  matmuls);
* Ruiz equilibration (OSQP's default scaling) is a fixed 10-sweep loop of
  row/column inf-norms — branch-free, batchable;
* per-constraint rho with the OSQP convention (equality rows get 1e3 x) and
  one adaptive-rho refactorization when the primal/dual residual ratio
  drifts, checked every ``check_every`` iterations;
* termination mirrors OSQP's eps_abs/eps_rel criteria on the unscaled
  residuals; the iteration cap plays the role of the reference's
  ``time_limit = Ts/5`` (`osqp_interface.cpp:625`) — the reference *accepts*
  time-limited inexact solutions, so running out of iterations is not a
  failure (`osqp_interface.cpp:644`).

Everything is fixed-shape; the while-loop carries a small pytree and is
jit/vmap-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..config import INF, N_CONSTR, N_EQ, N_VAR

SIGMA = 1e-6
ALPHA = 1.6            # relaxation
RHO_BASE = 0.1
RHO_EQ_SCALE = 1e3     # OSQP: equality rows get rho * 1e3
RHO_MIN, RHO_MAX = 1e-6, 1e6
EPS_ABS = 1e-4         # matches reference (`osqp_interface.cpp:623`)
EPS_REL = 1e-5
RUIZ_ITERS = 10


@struct.dataclass
class QPSolution:
    x: jnp.ndarray         # primal step (N_VAR,)
    y: jnp.ndarray         # dual (N_CONSTR,)
    solved: jnp.ndarray    # bool: converged to eps tolerances
    iters: jnp.ndarray     # iterations used
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray


def _ruiz_equilibrate(p, q, a, l, u):
    """Modified Ruiz equilibration on the stacked KKT matrix (OSQP scaling).

    Returns scaled (P, q, A, l, u) and the scalings (d (n,), e (m,), c cost
    scalar) with  P_s = c D P D,  A_s = E A D,  q_s = c D q,  l_s = E l.
    """
    n = p.shape[0]
    m = a.shape[0]
    d = jnp.ones(n, dtype=p.dtype)
    e = jnp.ones(m, dtype=p.dtype)
    c = jnp.asarray(1.0, dtype=p.dtype)

    def body(_, carry):
        p_s, q_s, a_s, d, e, c = carry
        # column norms of [P; A] -> d update; row norms of A -> e update.
        # Structurally zero rows (e.g. the dVs slots of the ddq rate blocks,
        # `osqp_interface.cpp:279-297`) keep scale 1 — amplifying them blows
        # up to inf in float32.
        one = jnp.ones((), dtype=p_s.dtype)
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(p_s), axis=0), jnp.max(jnp.abs(a_s), axis=0))
        delta_d = jnp.where(col_norm < 1e-12, one, one / jnp.sqrt(col_norm))
        row_norm = jnp.max(jnp.abs(a_s), axis=1)
        delta_e = jnp.where(row_norm < 1e-12, one, one / jnp.sqrt(row_norm))
        p_s = delta_d[:, None] * p_s * delta_d[None, :]
        q_s = delta_d * q_s
        a_s = delta_e[:, None] * a_s * delta_d[None, :]
        d = d * delta_d
        e = e * delta_e
        # cost scaling: normalize mean column norm of P / inf-norm of q
        p_col = jnp.max(jnp.abs(p_s), axis=0)
        gamma = one / jnp.maximum(
            jnp.maximum(jnp.mean(p_col), jnp.max(jnp.abs(q_s))),
            jnp.asarray(1e-12, dtype=p_s.dtype))
        p_s = p_s * gamma
        q_s = q_s * gamma
        c = c * gamma
        return p_s, q_s, a_s, d, e, c

    p_s, q_s, a_s, d, e, c = jax.lax.fori_loop(
        0, RUIZ_ITERS, body, (p, q, a, d, e, c))
    # scale bounds; keep +-inf entries infinite
    l_s = jnp.where(jnp.isfinite(l) & (jnp.abs(l) < INF / 2), e * l, l)
    u_s = jnp.where(jnp.isfinite(u) & (jnp.abs(u) < INF / 2), e * u, u)
    return p_s, q_s, a_s, l_s, u_s, d, e, c


def _factor(p, a, rho):
    """Inverse of the reduced KKT matrix K = P + sigma I + A' diag(rho) A."""
    n = p.shape[0]
    k = p + SIGMA * jnp.eye(n, dtype=p.dtype) + (a.T * rho[None, :]) @ a
    # Cholesky-based inverse: stable for the PD K, one-time cost per QP
    chol = jnp.linalg.cholesky(k)
    inv_l = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(n, dtype=p.dtype), lower=True)
    return inv_l.T @ inv_l


@partial(jax.jit, static_argnames=("max_iter", "check_every", "backend"))
def solve_qp(p, q, a, l, u, max_iter: int = 400, check_every: int = 25,
             x_warm=None, y_warm=None, backend: str = "xla") -> QPSolution:
    """Solve one dense QP.

    Default is cold start (x=z=y=0), matching the reference's
    fresh-OSQP-instance-per-QP usage (`osqp_interface.cpp:620-622`).
    ``x_warm``/``y_warm`` (unscaled) warm-start the splitting — successive
    SQP iterations' QPs differ only by relinearization, so reusing the
    previous primal/dual solution typically cuts ADMM iterations several-fold
    while converging to the same QP solution (a speed-only deviation).
    """
    dtype = p.dtype
    m, n = a.shape

    p_s, q_s, a_s, l_s, u_s, d_scl, e_scl, c_scl = _ruiz_equilibrate(p, q, a, l, u)

    is_eq = jnp.abs(u_s - l_s) < 1e-12
    rho0 = jnp.where(is_eq, RHO_BASE * RHO_EQ_SCALE, RHO_BASE).astype(dtype)

    kinv0 = _factor(p_s, a_s, rho0)

    def residuals(x, z, y):
        """Unscaled OSQP residuals + their relative scalings."""
        ax = a_s @ x
        px = p_s @ x
        aty = a_s.T @ y
        # unscale: x_u = D x, z_u = E^{-1} z, y_u = c^{-1} E y
        r_prim = jnp.max(jnp.abs((ax - z) / e_scl))
        r_dual = jnp.max(jnp.abs(d_scl * (px + q_s + aty) / c_scl))
        s_prim = jnp.maximum(jnp.max(jnp.abs(ax / e_scl)),
                             jnp.max(jnp.abs(z / e_scl)))
        s_dual = jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(d_scl * px)), jnp.max(jnp.abs(d_scl * aty))),
            jnp.max(jnp.abs(d_scl * q_s))) / c_scl
        return r_prim, r_dual, s_prim, s_dual

    def admm_iters(x, z, y, rho, kinv, n_iters):
        """``n_iters`` plain ADMM iterations (no termination checks)."""

        def one(_, xs):
            x, z, y = xs
            rhs = SIGMA * x - q_s + a_s.T @ (rho * z - y)
            x1 = kinv @ rhs
            zt = a_s @ x1
            z_relax = ALPHA * zt + (1.0 - ALPHA) * z
            z1 = jnp.clip(z_relax + y / rho, l_s, u_s)
            y1 = y + rho * (z_relax - z1)
            return x1, z1, y1

        return jax.lax.fori_loop(0, n_iters, one, (x, z, y))

    if x_warm is None:
        x0 = jnp.zeros(n, dtype=dtype)
        z0 = jnp.zeros(m, dtype=dtype)
        y0 = jnp.zeros(m, dtype=dtype)
    else:
        # scale the unscaled warm start into the equilibrated space
        x0 = x_warm / d_scl
        z0 = a_s @ x0
        y0 = c_scl * y_warm / e_scl

    def run_chunks(x, z, y, rho, kinv, budget: int, done_init):
        """Iterate in ``check_every`` chunks until converged or ``budget``
        iterations are spent.  Returns (x, z, y, iters_used, done).

        backend="pallas": the whole loop runs inside one fused TPU kernel
        with K^-1/P/A pinned in VMEM (ops/pallas_admm.py).
        backend="pallas_interpret": same kernel, interpreter mode (tests).
        backend="xla": plain lax.while_loop (CPU / float64 path).
        """
        if backend.startswith("pallas"):
            from ..ops.pallas_admm import fused_admm
            x, z, y, it = fused_admm(
                kinv, p_s, a_s, q_s, rho, l_s, u_s, d_scl, e_scl, c_scl,
                x, z, y, max_iter=budget, check_every=check_every,
                sigma=SIGMA, alpha=ALPHA, eps_abs=EPS_ABS, eps_rel=EPS_REL,
                interpret=(backend == "pallas_interpret"))
            x, z, y = x.astype(dtype), z.astype(dtype), y.astype(dtype)
            r_p, r_d, s_p, s_d = residuals(x, z, y)
            done = jnp.logical_and(r_p <= EPS_ABS + EPS_REL * s_p,
                                   r_d <= EPS_ABS + EPS_REL * s_d)
            return x, z, y, it, done

        def cond(carry):
            x, z, y, it, done = carry
            return jnp.logical_and(~done, it < budget)

        def body(carry):
            x, z, y, it, _ = carry
            x, z, y = admm_iters(x, z, y, rho, kinv, check_every)
            r_p, r_d, s_p, s_d = residuals(x, z, y)
            done = jnp.logical_and(r_p <= EPS_ABS + EPS_REL * s_p,
                                   r_d <= EPS_ABS + EPS_REL * s_d)
            return x, z, y, it + check_every, done

        return jax.lax.while_loop(
            cond, body, (x, z, y, jnp.asarray(0), done_init))

    # ---- phase 1: one check interval, then a single adaptive-rho point.
    # OSQP adapts rho whenever the residual ratio drifts; under vmap a
    # cond() lowers to select(), so a factorization inside the main loop
    # would run for every lane at every check.  One fixed adapt point keeps
    # the number of (batched) factorizations at exactly two.
    x, z, y, it1, done0 = run_chunks(x0, z0, y0, rho0, kinv0, check_every,
                                     jnp.asarray(False))
    r_p, r_d, s_p, s_d = residuals(x, z, y)
    ratio = jnp.sqrt((r_p / jnp.maximum(s_p, 1e-12))
                     / jnp.maximum(r_d / jnp.maximum(s_d, 1e-12), 1e-12))
    adapt = jnp.logical_and(~done0, jnp.logical_or(ratio > 5.0, ratio < 0.2))
    rho = jnp.where(adapt, jnp.clip(rho0 * ratio, RHO_MIN, RHO_MAX), rho0)
    kinv = jnp.where(adapt, _factor(p_s, a_s, rho), kinv0)
    # (no y rescaling needed: y is rho-independent)

    # ---- phase 2: pure-matvec chunks with termination checks
    x, z, y, it2, done = run_chunks(x, z, y, rho, kinv,
                                    max(max_iter - check_every, 0), done0)
    it = it1 + it2

    r_p, r_d, _, _ = residuals(x, z, y)
    # unscale solution
    x_out = d_scl * x
    y_out = e_scl * y / c_scl
    return QPSolution(x=x_out, y=y_out, solved=done, iters=it,
                      prim_res=r_p, dual_res=r_d)
