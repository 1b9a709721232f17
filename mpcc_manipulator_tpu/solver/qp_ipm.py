"""Structured QP solver: primal-dual interior point + Riccati recursion.

This is the TPU-native structured alternative to the dense ADMM backend:
instead of iterating hundreds of splitting steps on a 179x479 dense system,
it exploits the OCP block-tridiagonal KKT structure the reference ignores
(SURVEY.md section 7, "hard part #1"):

  * primal-dual path-following IPM (Mehrotra predictor-corrector) over the
    stage-separable inequalities (slacks s > 0, duals lam > 0,
    complementarity driven to zero),
  * each iteration eliminates (s, lam) into the stage Hessians, factors the
    equality-constrained LQR ONCE by a backward matrix Riccati sweep over
    the N = 10 stages (17-dim augmented state, 8 inputs), then reuses the
    factorization for two cheap vector sweeps: the affine predictor and the
    Mehrotra centering corrector,
  * fixed iteration cap with convergence masking — fully jit/vmap-friendly;
    typical convergence in 5-10 Mehrotra iterations vs hundreds of ADMM
    iterations, and every step is small dense linear algebra that batches
    perfectly over scenarios.

Infeasible-start: initial slacks/duals are set to 1 (rows are normalized),
so a warm-start guess violating bounds is handled through the residuals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..ocp.qp_stages import StageQP
from ..utils.linalg_small import cho_solve_small, cholesky_small

EPS_IPM = 1e-5       # complementarity target (OSQP-grade accuracy)
FRAC_TO_BOUNDARY = 0.995


@struct.dataclass
class IPMSolution:
    dx_tilde: jnp.ndarray   # (N+1, nxt) augmented-state step
    du: jnp.ndarray         # (N, nu) input step
    lam: jnp.ndarray        # (N+1, nc_stage) inequality duals
    iters: jnp.ndarray
    solved: jnp.ndarray
    mu: jnp.ndarray


def _stage_split(h, g, nxt):
    """(nzt,nzt)/(nzt,) stage blocks -> (Q, S, R, qx, ru) partitions."""
    q = h[:nxt, :nxt]
    s = h[nxt:, :nxt]
    r = h[nxt:, nxt:]
    return q, s, r, g[:nxt], g[nxt:]


def _riccati_factor(qp: StageQP, hbar, hbar_term):
    """Matrix half of the backward Riccati sweep: factor once per IPM
    iteration, reuse for multiple right-hand sides (predictor + corrector).

    Returns per-stage (p_mats, chols, s_bars, k_gains) where ``p_mats[k]``
    is the cost-to-go Hessian *entering* stage k (i.e. P_{k+1}).
    """
    at, bt = qp.at, qp.bt
    nxt, nu = bt.shape

    def backward(p_mat, h_k):
        q = h_k[:nxt, :nxt]
        s = h_k[nxt:, :nxt]
        r = h_k[nxt:, nxt:]
        pa = p_mat @ at
        pb = p_mat @ bt
        q_bar = q + at.T @ pa
        s_bar = s + bt.T @ pa
        r_bar = r + bt.T @ pb
        # Cholesky of the (regularized) 8x8 input Hessian — unrolled
        # small-matrix factor+solve (fusable elementwise ops; LAPACK-style
        # custom calls are latency-bound at this size and dominate the whole
        # batched solve).  NaN-on-non-PD is preserved.
        chol = cholesky_small(
            r_bar + 1e-9 * jnp.eye(nu, dtype=r_bar.dtype), nu)
        k_gain = -cho_solve_small(chol, s_bar, nu)
        p_new = q_bar + s_bar.T @ k_gain
        # symmetrize for numerical hygiene
        p_new = 0.5 * (p_new + p_new.T)
        return p_new, (p_mat, chol, s_bar, k_gain)

    _, fact = jax.lax.scan(backward, hbar_term, hbar, reverse=True,
                           unroll=True)
    return fact


def _riccati_ff(qp: StageQP, fact, gbar, gbar_term):
    """Vector half of the sweep: backward feed-forward recursion against a
    saved factorization + forward rollout.  ~17x cheaper than the matrix
    half (17-vectors instead of 17x17 matrices per stage).

    Returns (dx (N+1, nxt), du (N, nu)).
    """
    at, bt = qp.at, qp.bt
    nxt, nu = bt.shape
    p_mats, chols, s_bars, k_gains = fact

    def backward(p_vec, blocks):
        p_mat, chol, s_bar, g_k, e_k = blocks
        qx, ru = g_k[:nxt], g_k[nxt:]
        m_vec = p_vec + p_mat @ e_k
        ru_bar = ru + bt.T @ m_vec
        k_ff = -cho_solve_small(chol, ru_bar[:, None], nu)[:, 0]
        p_vec_new = qx + at.T @ m_vec + s_bar.T @ k_ff
        return p_vec_new, k_ff

    _, k_ffs = jax.lax.scan(backward, gbar_term,
                            (p_mats, chols, s_bars, gbar, qp.e),
                            reverse=True, unroll=True)

    def forward(dx, blocks):
        k_gain, k_ff, e_k = blocks
        du_k = k_gain @ dx + k_ff
        dx_next = at @ dx + bt @ du_k + e_k
        return dx_next, (dx, du_k)

    dx0 = jnp.zeros(nxt, dtype=qp.e.dtype)
    dx_last, (dxs, dus) = jax.lax.scan(forward, dx0, (k_gains, k_ffs, qp.e),
                                       unroll=True)
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dx_all, dus


def _riccati_solve(qp: StageQP, hbar, gbar, hbar_term, gbar_term):
    """Backward Riccati + forward rollout for the equality-constrained LQR

        min sum_k 1/2 z_k' Hbar_k z_k + gbar_k' z_k  (+ terminal)
        s.t. dx_{k+1} = At dx_k + Bt du_k + e_k,  dx_0 = 0.

    Fused single backward sweep (matrix + vector recursions together) —
    cheaper than factor-then-ff when only one right-hand side is needed
    (one scan instead of two; matters at small batch where the solve is
    launch-latency-bound).  Returns (dx (N+1, nxt), du (N, nu)).
    """
    at, bt = qp.at, qp.bt
    nxt, nu = bt.shape

    def backward(carry, blocks):
        p_mat, p_vec = carry
        h_k, g_k, e_k = blocks
        q, s, r, qx, ru = _stage_split(h_k, g_k, nxt)
        pa = p_mat @ at
        pb = p_mat @ bt
        m_vec = p_vec + p_mat @ e_k
        q_bar = q + at.T @ pa
        s_bar = s + bt.T @ pa
        r_bar = r + bt.T @ pb
        qx_bar = qx + at.T @ m_vec
        ru_bar = ru + bt.T @ m_vec
        chol = cholesky_small(
            r_bar + 1e-9 * jnp.eye(nu, dtype=r_bar.dtype), nu)
        sol_kk = -cho_solve_small(
            chol, jnp.concatenate([s_bar, ru_bar[:, None]], axis=-1), nu)
        k_gain, k_ff = sol_kk[:, :nxt], sol_kk[:, nxt]
        p_new = q_bar + s_bar.T @ k_gain
        p_vec_new = qx_bar + s_bar.T @ k_ff
        p_new = 0.5 * (p_new + p_new.T)
        return (p_new, p_vec_new), (k_gain, k_ff)

    (_, _), (k_gains, k_ffs) = jax.lax.scan(
        backward, (hbar_term, gbar_term),
        (hbar, gbar, qp.e), reverse=True, unroll=True)

    def forward(dx, blocks):
        k_gain, k_ff, e_k = blocks
        du_k = k_gain @ dx + k_ff
        dx_next = at @ dx + bt @ du_k + e_k
        return dx_next, (dx, du_k)

    dx0 = jnp.zeros(nxt, dtype=qp.e.dtype)
    dx_last, (dxs, dus) = jax.lax.scan(forward, dx0, (k_gains, k_ffs, qp.e),
                                       unroll=True)
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dx_all, dus


@partial(jax.jit, static_argnames=("max_iter", "scheme"))
def solve_qp_ipm(qp: StageQP, max_iter: int = 25,
                 scheme: str = "adaptive") -> IPMSolution:
    """Solve the stage-structured QP.  Returns steps in normalized units.

    Fully shape-generic: all dims (stage count, augmented-state/input sizes,
    rows per stage) are derived from the ``StageQP`` arrays, so the same
    code compiles for any :class:`~..system.System`.

    ``scheme`` selects the centering strategy:

    * ``"adaptive"`` — one solve per iteration; sigma from the achieved
      step length.  Cheapest per iteration; the production default (batched
      lanes pay the max iteration count, and Mehrotra's iteration savings
      measured smaller than its per-iteration overhead at batch scale).
    * ``"mehrotra"`` — predictor-corrector: affine probe + centering
      corrector against the same Riccati factorization (the corrector is a
      cheap vector sweep).  Fewer iterations on average; useful for hard
      QPs and as a robustness ablation.
    """
    dtype = qp.e.dtype
    n_stages, nxt = qp.e.shape        # N, augmented-state dim
    nu = qp.bt.shape[1]
    nc_stage = qp.mask.shape[1]
    m_act = jnp.sum(qp.mask)

    # masked row view: inactive rows become 0 . z <= 1
    c_eff = qp.c_rows * qp.mask[..., None]
    d_eff = qp.d_vec * qp.mask + (1.0 - qp.mask)

    # stage variable packing helpers: z_k = (dx_k, du_k); z_N = (dx_N, 0)
    def row_dot(dx_all, du_all):
        """C z for every stage row -> (N+1, nc_stage)."""
        du_pad = jnp.concatenate([du_all, jnp.zeros((1, nu), dtype=dtype)])
        z_all = jnp.concatenate([dx_all, du_pad], axis=1)      # (N+1, NZT)
        return jnp.einsum("krz,kz->kr", c_eff, z_all)

    dx0 = jnp.zeros((n_stages + 1, nxt), dtype=dtype)
    du0 = jnp.zeros((n_stages, nu), dtype=dtype)
    s0 = jnp.ones((n_stages + 1, nc_stage), dtype=dtype)
    lam0 = jnp.ones((n_stages + 1, nc_stage), dtype=dtype)
    mu0 = jnp.asarray(1.0, dtype=dtype)

    # fraction-to-boundary, separate primal/dual step lengths
    def max_alpha(v, dv):
        ratio = jnp.where(dv < -1e-12, -v / jnp.where(dv < -1e-12, dv, -1.0),
                          jnp.inf)
        return jnp.minimum(1.0, FRAC_TO_BOUNDARY * jnp.min(ratio))

    def body(carry):
        dx, du, s, lam, mu, it, done = carry

        # Newton-step derivation (constraints linear, objective quadratic,
        # only complementarity is nonlinear): eliminating (ds, dlam) from
        #   H dz + C'dlam + E'dnu = -r_grad
        #   C dz + ds = -(Cz + s - d)
        #   Lam ds + S dlam = -(Lam s - rhs_comp)
        # and substituting z+ = z + dz yields an equality-constrained QP in
        # the *target* iterate z+ directly:
        #   min 1/2 z+' (H + C'WC) z+ + (g + C'(W(s - d) + rhs_comp/s))' z+
        #   s.t. dynamics(z+) = e                       (W = lam/s)
        # which the Riccati sweep solves in one shot.  Targets for the
        # slacks/duals then follow in closed form:
        #   s+   = d - C z+
        #   lam+ = rhs_comp/s + W (C z+ + s - d)
        #
        # The C'WC factorization (the matrix Riccati sweep — the expensive
        # part) is built ONCE per iteration; each right-hand side is a
        # cheap vector sweep against it (rhs_comp = mu for the adaptive
        # scheme; affine probe then sigma*mu - ds_aff*dlam_aff for
        # Mehrotra).
        s_safe = jnp.maximum(s, 1e-10)
        w = lam / s_safe
        mu_meas = jnp.sum(s * lam * qp.mask) / jnp.maximum(m_act, 1.0)

        cw = c_eff * w[..., None]
        h_mod = jnp.einsum("krz,krv->kzv", cw, c_eff)  # (N+1, NZT, NZT)
        hbar = qp.h + h_mod[:n_stages]
        hbar_term = qp.h_term + h_mod[n_stages, :nxt, :nxt]
        if scheme == "mehrotra":
            # factor once, reuse across predictor + corrector RHSs
            fact = _riccati_factor(qp, hbar, hbar_term)
            sweep = lambda gbar, gbar_term: _riccati_ff(qp, fact, gbar,
                                                        gbar_term)
        else:
            # single RHS per iteration: fused matrix+vector sweep
            sweep = lambda gbar, gbar_term: _riccati_solve(
                qp, hbar, gbar, hbar_term, gbar_term)

        def solve_rhs(rhs_comp):
            g_rows = w * (s - d_eff) + rhs_comp / s_safe
            g_mod = jnp.einsum("krz,kr->kz", c_eff, g_rows)
            gbar = qp.g + g_mod[:n_stages]
            gbar_term = qp.g_term + g_mod[n_stages, :nxt]
            dx_t, du_t = sweep(gbar, gbar_term)
            cz_t = row_dot(dx_t, du_t)
            s_t = d_eff - cz_t
            lam_t = rhs_comp / s_safe + w * (cz_t + s - d_eff)
            return dx_t, du_t, s_t, lam_t

        if scheme == "mehrotra":
            # --- predictor (affine step, no centering)
            _, _, s_a, lam_a = solve_rhs(jnp.zeros_like(s))
            ds_a = s_a - s
            dlam_a = lam_a - lam
            a_p_aff = max_alpha(s, ds_a)
            a_d_aff = max_alpha(lam, dlam_a)
            mu_aff = jnp.sum((s + a_p_aff * ds_a) * (lam + a_d_aff * dlam_a)
                             * qp.mask) / jnp.maximum(m_act, 1.0)
            sigma_m = jnp.clip((mu_aff / jnp.maximum(mu_meas, 1e-12)) ** 3,
                               1e-4, 1.0)
            # --- corrector (centering + Mehrotra second-order term)
            rhs = sigma_m * mu_meas - ds_a * dlam_a
        else:
            # adaptive centering: one solve per iteration against the
            # carried barrier parameter mu
            rhs = mu

        dx_t, du_t, s_t, lam_t = solve_rhs(rhs)
        step_s = s_t - s
        step_lam = lam_t - lam
        alpha_p = max_alpha(s, step_s)
        alpha_d = max_alpha(lam, step_lam)

        dx_n = dx + alpha_p * (dx_t - dx)
        du_n = du + alpha_p * (du_t - du)
        s_n = s + alpha_p * step_s
        lam_n = lam + alpha_d * step_lam

        # freeze on any non-finite update (keeps the last good iterate)
        finite = (jnp.all(jnp.isfinite(dx_n)) & jnp.all(jnp.isfinite(du_n))
                  & jnp.all(jnp.isfinite(s_n)) & jnp.all(jnp.isfinite(lam_n)))
        dx = jnp.where(finite, dx_n, dx)
        du = jnp.where(finite, du_n, du)
        s = jnp.where(finite, s_n, s)
        lam = jnp.where(finite, lam_n, lam)

        r_ineq = row_dot(dx, du) + s - d_eff
        mu_post = jnp.sum(s * lam * qp.mask) / jnp.maximum(m_act, 1.0)
        # next barrier target (adaptive scheme): aggressive when steps are
        # long, conservative when fraction-to-boundary is clipping hard
        alpha_min = jnp.minimum(alpha_p, alpha_d)
        sigma = jnp.clip((1.0 - alpha_min) ** 2, 0.1, 0.8)
        mu_new = jnp.maximum(sigma * mu_post, 0.01 * EPS_IPM)
        conv = jnp.logical_and(mu_post < EPS_IPM,
                               jnp.max(jnp.abs(r_ineq * qp.mask)) < 2e-4)
        # dual divergence (degenerate active sets): stop iterating; the
        # returned iterate is the last finite one and the SQP filter line
        # search is the outer safety net for such steps
        diverged = jnp.logical_or(~finite, mu_post > 1e6)
        stop = jnp.logical_or(conv, diverged)
        return dx, du, s, lam, mu_new, it + 1, jnp.logical_or(done, stop)

    def cond(carry):
        *_, it, done = carry
        return jnp.logical_and(~done, it < max_iter)

    dx, du, s, lam, _, it, done = jax.lax.while_loop(
        cond, body, (dx0, du0, s0, lam0, mu0, jnp.asarray(0),
                     jnp.asarray(False)))

    # final convergence verdict (excludes lanes stopped by divergence)
    r_fin = row_dot(dx, du) + s - d_eff
    mu_fin = jnp.sum(s * lam * qp.mask) / jnp.maximum(m_act, 1.0)
    solved = jnp.logical_and(mu_fin < 10 * EPS_IPM,
                             jnp.max(jnp.abs(r_fin * qp.mask)) < 1e-3)
    return IPMSolution(dx_tilde=dx, du=du, lam=lam, iters=it, solved=solved,
                       mu=mu_fin)
