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

import os
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..ocp.qp_stages import StageQP, StageQPS
from ..utils.linalg_small import cho_solve_small, cholesky_small

# Complementarity target.  The reference accepts OSQP at eps_abs=1e-4 AND
# keeps TimeLimitReached inexact solves (`osqp_interface.cpp:623-644`), so
# 1e-5 is already a notch tighter than its acceptance bar.  The r5
# tolerance-frontier ablation (docs/ARCHITECTURE.md) measured the actual
# trade-off; MPCC_EPS_IPM overrides at import for ablation runs (a
# compile-time constant in both the XLA path and the Pallas kernel).
EPS_IPM = float(os.environ.get("MPCC_EPS_IPM", "1e-5"))
FRAC_TO_BOUNDARY = 0.995


@struct.dataclass
class IPMSolution:
    dx_tilde: jnp.ndarray   # (N+1, nxt) augmented-state step
    du: jnp.ndarray         # (N, nu) input step
    lam: jnp.ndarray        # (N+1, nc_stage) inequality duals
    iters: jnp.ndarray
    solved: jnp.ndarray
    mu: jnp.ndarray
    # final interior-point iterates in the packed stage-row layout, for
    # warm-starting the next solve (rows a solver never touches stay 1.0 —
    # the cold-start value).  See SQPConfig.ipm_warm_start.
    s_rows: jnp.ndarray     # (N+1, nc_stage) slacks
    lam_rows: jnp.ndarray   # (N+1, nc_stage) duals (1.0 on untouched rows)


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


@partial(jax.jit, static_argnames=("max_iter", "scheme", "fixed_iters"))
def solve_qp_ipm(qp: StageQP, max_iter: int = 25,
                 scheme: str = "adaptive",
                 fixed_iters: bool = False,
                 warm_s: jnp.ndarray | None = None,
                 warm_lam: jnp.ndarray | None = None) -> IPMSolution:
    """Solve the stage-structured QP.  Returns steps in normalized units.

    ``warm_s``/``warm_lam`` optionally seed the interior-point iterates
    (packed ``(N+1, nc_stage)`` layout, e.g. a previous solve's
    ``s_rows``/``lam_rows``); ``None`` is the cold start (all ones,
    bit-identical to the historical behavior).  Callers are responsible
    for clipping warm values safely off the boundary.

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
    ones_rows = jnp.ones((n_stages + 1, nc_stage), dtype=dtype)
    # masked rows always start at the cold value (they carry no information)
    s0 = (ones_rows if warm_s is None
          else warm_s * qp.mask + (1.0 - qp.mask))
    lam0 = (ones_rows if warm_lam is None
            else warm_lam * qp.mask + (1.0 - qp.mask))
    mu0 = jnp.sum(s0 * lam0 * qp.mask) / jnp.maximum(m_act, 1.0)

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

    init = (dx0, du0, s0, lam0, mu0, jnp.asarray(0), jnp.asarray(False))
    if fixed_iters:
        # fixed trip count + per-lane freeze (fleet mode: no batch-global
        # convergence vote in the compiled sharded program; see
        # SQPConfig.fleet_mode)
        def fori_body(_, carry):
            done_prev = carry[6]
            new_c = body(carry)
            return jax.tree.map(lambda o, n: jnp.where(done_prev, o, n),
                                tuple(carry), tuple(new_c))
        dx, du, s, lam, _, it, done = jax.lax.fori_loop(
            0, max_iter, fori_body, init)
    else:
        dx, du, s, lam, _, it, done = jax.lax.while_loop(cond, body, init)

    # final convergence verdict (excludes lanes stopped by divergence)
    r_fin = row_dot(dx, du) + s - d_eff
    mu_fin = jnp.sum(s * lam * qp.mask) / jnp.maximum(m_act, 1.0)
    solved = jnp.logical_and(mu_fin < 10 * EPS_IPM,
                             jnp.max(jnp.abs(r_fin * qp.mask)) < 1e-3)
    return IPMSolution(dx_tilde=dx, du=du, lam=lam, iters=it, solved=solved,
                       mu=mu_fin,
                       s_rows=s * qp.mask + (1.0 - qp.mask),
                       lam_rows=lam * qp.mask + (1.0 - qp.mask))


# ------------------------------------------------------------------
# Structure-exploiting solver (StageQPS)
# ------------------------------------------------------------------
#
# Same IPM as solve_qp_ipm, consuming the structured representation:
# the dynamics maps are I + one element (a_sv) and [bd; I], and only the
# npc polytopic rows are dense — so the dense (nxt, nxt) matmuls of the
# Riccati sweep collapse to slices plus small bd products, and the
# C' diag(w) C modification is a diagonal update plus an npc-row einsum.
# Numerically identical to the packed path (same Newton systems); tested
# for step equivalence in tests/test_qp_ipm.py.


def _riccati_backward_s(qp: StageQPS, hbar, gbar, hbar_term, gbar_term,
                        with_vectors: bool = True):
    """Structured backward sweep.  Returns (k_gains, k_ffs, fact) where
    ``fact = (p_mats, chols, s_bars)`` supports later vector-only sweeps."""
    bd = qp.bd
    a_sv = qp.a_sv
    nx, nu = bd.shape
    nxt = hbar_term.shape[0]
    s_idx, vs_idx = nx - 2, nx - 1

    def backward(carry, blocks):
        p_mat, p_vec = carry
        h_k, g_k, e_k = blocks
        q = h_k[:nxt, :nxt]
        sb = h_k[nxt:, :nxt]
        r = h_k[nxt:, nxt:]
        # pa_x = (P @ at)[:, :nx]; all other columns of P @ at are zero
        pa_x = p_mat[:, :nx].at[:, vs_idx].add(a_sv * p_mat[:, s_idx])
        # q_bar = q + at' P at  (rows: copy, plus row vs += a_sv * row s)
        contrib = pa_x[:nx, :].at[vs_idx, :].add(a_sv * pa_x[s_idx, :])
        q_bar = q.at[:nx, :nx].add(contrib)
        # s_bar = sb + bt' P at;  bt = [bd; I]
        s_bar = sb.at[:, :nx].add(bd.T @ pa_x[:nx, :] + pa_x[nx:, :])
        # r_bar = r + bt' P bt
        pb = p_mat[:, :nx] @ bd + p_mat[:, nx:]
        r_bar = r + bd.T @ pb[:nx, :] + pb[nx:, :]
        chol = cholesky_small(
            r_bar + 1e-9 * jnp.eye(nu, dtype=r_bar.dtype), nu)
        if with_vectors:
            qx, ru = g_k[:nxt], g_k[nxt:]
            e_x = e_k[:nx]
            m_vec = p_vec + p_mat[:, :nx] @ e_x
            qx_bar = (qx.at[:nx].add(m_vec[:nx])
                        .at[vs_idx].add(a_sv * m_vec[s_idx]))
            ru_bar = ru + bd.T @ m_vec[:nx] + m_vec[nx:]
            sol_kk = -cho_solve_small(
                chol, jnp.concatenate([s_bar, ru_bar[:, None]], axis=-1), nu)
            k_gain, k_ff = sol_kk[:, :nxt], sol_kk[:, nxt]
            p_vec_new = qx_bar + s_bar.T @ k_ff
        else:
            k_gain = -cho_solve_small(chol, s_bar, nu)
            k_ff = jnp.zeros(nu, dtype=h_k.dtype)
            p_vec_new = p_vec
        p_new = q_bar + s_bar.T @ k_gain
        p_new = 0.5 * (p_new + p_new.T)
        return (p_new, p_vec_new), (k_gain, k_ff, p_mat, chol, s_bar)

    gb = gbar if with_vectors else jnp.zeros_like(qp.g)
    gt = gbar_term if with_vectors else jnp.zeros(nxt, dtype=qp.e.dtype)
    (_, _), (k_gains, k_ffs, p_mats, chols, s_bars) = jax.lax.scan(
        backward, (hbar_term, gt), (hbar, gb, qp.e),
        reverse=True, unroll=True)
    return k_gains, k_ffs, (p_mats, chols, s_bars)


def _riccati_forward_s(qp: StageQPS, k_gains, k_ffs):
    """Structured forward rollout: dx'_{k+1} = at dx'_k + bt du_k + e_k."""
    bd = qp.bd
    a_sv = qp.a_sv
    nx, nu = bd.shape
    nxt = nx + nu
    s_idx, vs_idx = nx - 2, nx - 1

    def forward(dx, blocks):
        k_gain, k_ff, e_k = blocks
        du_k = k_gain @ dx + k_ff
        x_next = (dx[:nx].at[s_idx].add(a_sv * dx[vs_idx])
                  + bd @ du_k + e_k[:nx])
        dx_next = jnp.concatenate([x_next, du_k])
        return dx_next, (dx, du_k)

    dx0 = jnp.zeros(nxt, dtype=qp.e.dtype)
    dx_last, (dxs, dus) = jax.lax.scan(forward, dx0, (k_gains, k_ffs, qp.e),
                                       unroll=True)
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dx_all, dus


def _riccati_ff_s(qp: StageQPS, fact, gbar, gbar_term):
    """Vector-only backward sweep against a saved structured factorization
    + forward rollout (Mehrotra corrector path)."""
    bd = qp.bd
    a_sv = qp.a_sv
    nx, nu = bd.shape
    nxt = nx + nu
    s_idx, vs_idx = nx - 2, nx - 1
    p_mats, chols, s_bars, k_gains = fact

    def backward(p_vec, blocks):
        p_mat, chol, s_bar, g_k, e_k = blocks
        qx, ru = g_k[:nxt], g_k[nxt:]
        m_vec = p_vec + p_mat[:, :nx] @ e_k[:nx]
        qx_bar = (qx.at[:nx].add(m_vec[:nx])
                    .at[vs_idx].add(a_sv * m_vec[s_idx]))
        ru_bar = ru + bd.T @ m_vec[:nx] + m_vec[nx:]
        k_ff = -cho_solve_small(chol, ru_bar[:, None], nu)[:, 0]
        p_vec_new = qx_bar + s_bar.T @ k_ff
        return p_vec_new, k_ff

    _, k_ffs = jax.lax.scan(backward, gbar_term,
                            (p_mats, chols, s_bars, gbar, qp.e),
                            reverse=True, unroll=True)
    return _riccati_forward_s(qp, k_gains, k_ffs)


@partial(jax.jit, static_argnames=("max_iter", "scheme", "fixed_iters"))
def solve_qp_ipm_s(qp: StageQPS, max_iter: int = 25,
                   scheme: str = "adaptive",
                   fixed_iters: bool = False,
                   warm_s: jnp.ndarray | None = None,
                   warm_lam: jnp.ndarray | None = None) -> IPMSolution:
    """Structured-representation IPM (see module comment above).

    Same algorithm, tolerances, and safeguards as :func:`solve_qp_ipm`;
    O(structure) work per Newton step.  Shape-generic over systems.
    ``warm_s``/``warm_lam``: packed ``(N+1, nc_stage)`` warm-start iterates
    (see :func:`solve_qp_ipm`); ``None`` = cold start (all ones).
    """
    dtype = qp.e.dtype
    n_stages = qp.e.shape[0]                 # N
    nx, nu = qp.bd.shape
    dof = qp.t_rate.shape[0]
    npc = qp.d_p.shape[1]
    nxt = nx + nu
    nzt = nxt + nu
    ar_x = jnp.arange(nx)
    ar_u = jnp.arange(nu)
    ar_d = jnp.arange(dof)
    m_act = jnp.asarray(n_stages * (2 * nx + 2 * nu + 2 * dof + npc),
                        dtype=dtype)
    # groups (exact shapes, no masks): state box covers stages 1..N,
    # input/rate/polytopic cover stages 0..N-1
    cpx = qp.cpx[:n_stages]
    d_p = qp.d_p[:n_stages]
    d_x = (qp.d_xu[1:], qp.d_xl[1:])

    def row_dots(dx_all, du_all):
        """C z per group: (xu, xl, uu, ul, ru, rl, p)."""
        cz_x = qp.tx[None, :] * dx_all[1:, :nx]
        cz_u = qp.tu[None, :] * du_all
        cz_r = qp.t_rate[None, :] * (du_all[:, :dof]
                                     - dx_all[:n_stages, nx:nx + dof])
        cz_p = (jnp.einsum("krz,kz->kr", cpx, dx_all[:n_stages, :nx])
                + jnp.einsum("krz,kz->kr", qp.cpu, du_all))
        return cz_x, -cz_x, cz_u, -cz_u, cz_r, -cz_r, cz_p

    def tree_init(val):
        return (jnp.full((n_stages, nx), val, dtype=dtype),
                jnp.full((n_stages, nx), val, dtype=dtype),
                jnp.full((n_stages, nu), val, dtype=dtype),
                jnp.full((n_stages, nu), val, dtype=dtype),
                jnp.full((n_stages, dof), val, dtype=dtype),
                jnp.full((n_stages, dof), val, dtype=dtype),
                jnp.full((n_stages, npc), val, dtype=dtype))

    def tmap(f, *trees):
        return tuple(f(*leaves) for leaves in zip(*trees))

    def tsum(tree):
        return sum(jnp.sum(l) for l in tree)

    def tmin(tree):
        return jnp.min(jnp.asarray([jnp.min(l) for l in tree]))

    def tmaxabs(tree):
        return jnp.max(jnp.asarray([jnp.max(jnp.abs(l)) for l in tree]))

    d_all = (d_x[0], d_x[1], qp.d_uu, qp.d_ul, qp.d_ru, qp.d_rl, d_p)

    def max_alpha(v_tree, dv_tree):
        def one(v, dv):
            neg = dv < -1e-12
            return jnp.min(jnp.where(neg, -v / jnp.where(neg, dv, -1.0),
                                     jnp.inf))
        return jnp.minimum(1.0, FRAC_TO_BOUNDARY * tmin(tmap(one, v_tree,
                                                             dv_tree)))

    def tree_unpack(rows):
        """Packed (N+1, nc_stage) -> exact-shape group tree."""
        o_u = 2 * nx
        o_r = 2 * nx + 2 * nu
        o_p = 2 * nx + 2 * nu + 2 * dof
        return (rows[1:, 0:nx], rows[1:, nx:2 * nx],
                rows[:n_stages, o_u:o_u + nu],
                rows[:n_stages, o_u + nu:o_u + 2 * nu],
                rows[:n_stages, o_r:o_r + dof],
                rows[:n_stages, o_r + dof:o_r + 2 * dof],
                rows[:n_stages, o_p:])

    dx0 = jnp.zeros((n_stages + 1, nxt), dtype=dtype)
    du0 = jnp.zeros((n_stages, nu), dtype=dtype)
    s0 = tree_init(1.0) if warm_s is None else tree_unpack(warm_s)
    lam0 = tree_init(1.0) if warm_lam is None else tree_unpack(warm_lam)
    mu0 = tsum(tmap(lambda a, b: a * b, s0, lam0)) / m_act

    def body(carry):
        dx, du, s, lam, mu, it, done = carry
        s_safe = tmap(lambda v: jnp.maximum(v, 1e-10), s)
        w = tmap(lambda l, ss: l / ss, lam, s_safe)
        mu_meas = tsum(tmap(lambda a, b: a * b, s, lam)) / m_act

        w_xu, w_xl, w_uu, w_ul, w_ru, w_rl, w_p = w

        # ---- Hbar: diagonal + two-entry + npc-row contributions
        tx2 = qp.tx * qp.tx
        tu2 = qp.tu * qp.tu
        tr2 = qp.t_rate * qp.t_rate
        dxx = tx2[None, :] * (w_xu + w_xl)         # (N, nx), stages 1..N
        duu = tu2[None, :] * (w_uu + w_ul)         # (N, nu), stages 0..N-1
        rr = tr2[None, :] * (w_ru + w_rl)          # (N, dof)
        cpx_w = cpx * w_p[..., None]
        hxx_p = jnp.einsum("krz,krv->kzv", cpx_w, cpx)
        hxu_p = jnp.einsum("krz,krv->kzv", cpx_w, qp.cpu)
        huu_p = jnp.einsum("krz,krv->kzv", qp.cpu * w_p[..., None], qp.cpu)

        hbar = qp.h
        hbar = hbar.at[:, :nx, :nx].add(hxx_p)
        hbar = hbar.at[:, :nx, nxt:].add(hxu_p)
        hbar = hbar.at[:, nxt:, :nx].add(jnp.swapaxes(hxu_p, -1, -2))
        hbar = hbar.at[:, nxt:, nxt:].add(huu_p)
        # state-box diag: stage k holds knot k's x block (k >= 1)
        hbar = hbar.at[1:, ar_x, ar_x].add(dxx[:n_stages - 1])
        hbar = hbar.at[:, nxt + ar_u, nxt + ar_u].add(duu)
        hbar = hbar.at[:, nxt + ar_d, nxt + ar_d].add(rr)
        hbar = hbar.at[:, nx + ar_d, nx + ar_d].add(rr)
        hbar = hbar.at[:, nxt + ar_d, nx + ar_d].add(-rr)
        hbar = hbar.at[:, nx + ar_d, nxt + ar_d].add(-rr)
        hbar_term = qp.h_term.at[ar_x, ar_x].add(dxx[n_stages - 1])

        if scheme == "mehrotra":
            k_gains, _, (p_mats, chols, s_bars) = _riccati_backward_s(
                qp, hbar, None, hbar_term, None, with_vectors=False)
            fact = (p_mats, chols, s_bars, k_gains)
            sweep = lambda gbar, gbar_term: _riccati_ff_s(qp, fact, gbar,
                                                          gbar_term)
        else:
            def sweep(gbar, gbar_term):
                k_gains, k_ffs, _ = _riccati_backward_s(
                    qp, hbar, gbar, hbar_term, gbar_term, with_vectors=True)
                return _riccati_forward_s(qp, k_gains, k_ffs)

        def solve_rhs(rhs):
            r_g = tmap(lambda wg, sg, dg, rg, ssg: wg * (sg - dg) + rg / ssg,
                       w, s, d_all, rhs, s_safe)
            r_xu, r_xl, r_uu, r_ul, r_ru, r_rl, r_p = r_g
            # g_mod x slots (knot k's x block): box rows (stages 1..N) +
            # polytopic (stages 0..N-1)
            gx_box = qp.tx[None, :] * (r_xu - r_xl)            # (N, nx)
            gx_p = jnp.einsum("krz,kr->kz", cpx, r_p)          # (N, nx)
            gu = (qp.tu[None, :] * (r_uu - r_ul)
                  + jnp.einsum("krz,kr->kz", qp.cpu, r_p))     # (N, nu)
            gr = qp.t_rate[None, :] * (r_ru - r_rl)            # (N, dof)

            gbar = qp.g
            gbar = gbar.at[:, :nx].add(gx_p)
            gbar = gbar.at[1:, :nx].add(gx_box[:n_stages - 1])
            gbar = gbar.at[:, nxt:].add(gu)
            gbar = gbar.at[:, nxt + ar_d].add(gr)
            gbar = gbar.at[:, nx + ar_d].add(-gr)
            gbar_term = qp.g_term.at[:nx].add(gx_box[n_stages - 1])

            dx_t, du_t = sweep(gbar, gbar_term)
            cz = row_dots(dx_t, du_t)
            s_t = tmap(lambda dg, czg: dg - czg, d_all, cz)
            lam_t = tmap(lambda rg, ssg, wg, czg, sg, dg:
                         rg / ssg + wg * (czg + sg - dg),
                         rhs, s_safe, w, cz, s, d_all)
            return dx_t, du_t, s_t, lam_t

        if scheme == "mehrotra":
            zeros = tmap(jnp.zeros_like, s)
            _, _, s_a, lam_a = solve_rhs(zeros)
            ds_a = tmap(lambda a, b: a - b, s_a, s)
            dlam_a = tmap(lambda a, b: a - b, lam_a, lam)
            a_p_aff = max_alpha(s, ds_a)
            a_d_aff = max_alpha(lam, dlam_a)
            mu_aff = tsum(tmap(
                lambda sg, dsg, lg, dlg: (sg + a_p_aff * dsg)
                * (lg + a_d_aff * dlg), s, ds_a, lam, dlam_a)) / m_act
            sigma_m = jnp.clip((mu_aff / jnp.maximum(mu_meas, 1e-12)) ** 3,
                               1e-4, 1.0)
            rhs = tmap(lambda dsg, dlg: sigma_m * mu_meas - dsg * dlg,
                       ds_a, dlam_a)
        else:
            rhs = tmap(lambda sg: jnp.full_like(sg, mu), s)

        dx_t, du_t, s_t, lam_t = solve_rhs(rhs)
        step_s = tmap(lambda a, b: a - b, s_t, s)
        step_lam = tmap(lambda a, b: a - b, lam_t, lam)
        alpha_p = max_alpha(s, step_s)
        alpha_d = max_alpha(lam, step_lam)

        dx_n = dx + alpha_p * (dx_t - dx)
        du_n = du + alpha_p * (du_t - du)
        s_n = tmap(lambda v, dv: v + alpha_p * dv, s, step_s)
        lam_n = tmap(lambda v, dv: v + alpha_d * dv, lam, step_lam)

        finite = (jnp.all(jnp.isfinite(dx_n)) & jnp.all(jnp.isfinite(du_n))
                  & jnp.all(jnp.asarray([jnp.all(jnp.isfinite(l))
                                         for l in s_n + lam_n])))
        dx = jnp.where(finite, dx_n, dx)
        du = jnp.where(finite, du_n, du)
        s = tmap(lambda new, old: jnp.where(finite, new, old), s_n, s)
        lam = tmap(lambda new, old: jnp.where(finite, new, old), lam_n, lam)

        cz = row_dots(dx, du)
        r_ineq = tmap(lambda czg, sg, dg: czg + sg - dg, cz, s, d_all)
        mu_post = tsum(tmap(lambda a, b: a * b, s, lam)) / m_act
        alpha_min = jnp.minimum(alpha_p, alpha_d)
        sigma = jnp.clip((1.0 - alpha_min) ** 2, 0.1, 0.8)
        mu_new = jnp.maximum(sigma * mu_post, 0.01 * EPS_IPM)
        conv = jnp.logical_and(mu_post < EPS_IPM, tmaxabs(r_ineq) < 2e-4)
        diverged = jnp.logical_or(~finite, mu_post > 1e6)
        stop = jnp.logical_or(conv, diverged)
        return dx, du, s, lam, mu_new, it + 1, jnp.logical_or(done, stop)

    def cond(carry):
        *_, it, done = carry
        return jnp.logical_and(~done, it < max_iter)

    init = (dx0, du0, s0, lam0, mu0, jnp.asarray(0), jnp.asarray(False))
    if fixed_iters:
        # fixed trip count + per-lane freeze (fleet mode: no batch-global
        # convergence vote in the compiled sharded program; see
        # SQPConfig.fleet_mode)
        def fori_body(_, carry):
            done_prev = carry[6]
            new_c = body(carry)
            return jax.tree.map(lambda o, n: jnp.where(done_prev, o, n),
                                tuple(carry), tuple(new_c))
        dx, du, s, lam, _, it, done = jax.lax.fori_loop(
            0, max_iter, fori_body, init)
    else:
        dx, du, s, lam, _, it, done = jax.lax.while_loop(cond, body, init)

    cz = row_dots(dx, du)
    r_fin = tmap(lambda czg, sg, dg: czg + sg - dg, cz, s, d_all)
    mu_fin = tsum(tmap(lambda a, b: a * b, s, lam)) / m_act
    solved = jnp.logical_and(mu_fin < 10 * EPS_IPM, tmaxabs(r_fin) < 1e-3)

    # pack duals into the StageQP row layout (API/diagnostic compat)
    nc_stage = 2 * nx + 2 * nu + 2 * dof + npc

    def tree_pack(groups, base):
        g_xu, g_xl, g_uu, g_ul, g_ru, g_rl, g_p = groups
        rows = jnp.full((n_stages + 1, nc_stage), base, dtype=dtype)
        rows = rows.at[1:, 0:nx].set(g_xu)
        rows = rows.at[1:, nx:2 * nx].set(g_xl)
        o = 2 * nx
        rows = rows.at[:n_stages, o:o + nu].set(g_uu)
        rows = rows.at[:n_stages, o + nu:o + 2 * nu].set(g_ul)
        o = 2 * nx + 2 * nu
        rows = rows.at[:n_stages, o:o + dof].set(g_ru)
        rows = rows.at[:n_stages, o + dof:o + 2 * dof].set(g_rl)
        o = 2 * nx + 2 * nu + 2 * dof
        rows = rows.at[:n_stages, o:].set(g_p)
        return rows

    return IPMSolution(dx_tilde=dx, du=du, lam=tree_pack(lam, 0.0), iters=it,
                       solved=solved, mu=mu_fin,
                       s_rows=tree_pack(s, 1.0), lam_rows=tree_pack(lam, 1.0))
