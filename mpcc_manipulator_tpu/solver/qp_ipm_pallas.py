"""Fused Pallas TPU kernel: the entire Riccati/IPM QP solve in one launch.

Why a kernel: one IPM Newton step is ~60 small (<=17x17) matrix ops per
stage.  Under XLA each op is its own HBM-roundtripping kernel at awkward
tile shapes — measured ~3.4 ms per Newton step at batch 1024 on v5e, ~50x
off the FLOP bound.  This kernel keeps the whole problem (structured
StageQPS form) and every intermediate in VMEM and lays the *scenario batch
in the lane dimension* (128 scenarios per grid step), so every small-matrix
op becomes a handful of (rows, 128) VPU FMAs.  One launch solves the QP to
convergence: the Newton `while` loop, the backward/forward Riccati sweeps,
slack/dual updates, fraction-to-boundary and the convergence test all run
on-chip.

Algorithm: identical to `qp_ipm.solve_qp_ipm_s` — same elimination, same
centering schemes ("adaptive": one fused matrix+vector sweep per iteration;
"mehrotra": factor once, affine probe + corrector as vector-only sweeps
against the saved factorization), same tolerances, the same per-lane freeze
semantics that `vmap(while_loop)` gives the XLA path.  Equivalence is
tested per scheme in interpret mode on CPU (tests/test_qp_ipm_pallas.py).
Measured on v5e at batch 1024: mehrotra cuts mean Newton iterations ~25%
for ~1.3x per-iteration cost and was the r3 bench default; after the r4
dof-block and structured-bd exploits cheapened the MATRIX sweep, the
balance flipped — "adaptive" (one fused sweep per iteration) now wins
(Panda 227.6k vs 218.6k, Husky@4096 104.7k vs 82.0k solves/s/chip) and
is the production default (MPCC_IPM_SCHEME to override).

Layout notes:
  * all refs are (stage, flat, B) or (flat, B) with B = 128 in lanes —
    flattening the tiny matrix dims avoids the (8, 128) tile padding
    blowup that per-matrix 4-D refs would cause;
  * values are reshaped to (d1, d2, B) inside the kernel where convenient
    (transient register relayouts, not resident memory);
  * contractions over tiny dims: VECTOR-shaped ones (m_vec, ru_bar,
    rollout, C z rows, gradient rows) are single multiply+reduce ops —
    measured +9% tick throughput over unrolled FMAs; MATRIX-shaped ones
    (C'WC, bt'P at, P-update) stay unrolled rank-1 FMA loops — their
    rank-4 reduce temporaries cost more VMEM bandwidth than the saved
    instruction issues (measured 3% SLOWER as reductions).  Mosaic gotcha:
    `a[:k, None]` (partial slice + newaxis in one getitem) lowers to a
    >2D gather Mosaic rejects — always slice first, then expand.

The public entry `solve_qp_ipm_pallas` is a `custom_vmap`: vmapping it over
scenarios dispatches one batched kernel call (batch in lanes) instead of
growing a per-scenario grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ocp.qp_stages import StageQPK, StageQPS
from ..system import PANDA, System
from .qp_ipm import EPS_IPM, FRAC_TO_BOUNDARY, IPMSolution, solve_qp_ipm_s

BT = 128          # scenarios per grid step (f32 lane width)


def _ipm_kernel(hxx_ref, hux_ref, huu_ref, r2_ref, gx_ref, gu_ref, gxu_ref,
                e_ref, bd_ref, asv_ref, cpx_ref, cpu_ref, d_ref,
                tx_ref, tu_ref, tr_ref, s0_ref, lam0_ref,
                dx_out, du_out, lam_out, iters_out, solved_out, mu_out,
                s_fin_out,
                s_scr, lam_scr, r_scr, w_scr, kg_scr, kff_scr, dx_scr, du_scr,
                *extra_scr, n_st, nx, nu, dof, npc, max_iter,
                scheme="adaptive"):
    mehrotra = scheme == "mehrotra"
    if mehrotra:
        # saved Riccati factorization (matrix sweep once per iteration,
        # reused by the affine + corrector vector sweeps)
        p_scr, sb_scr, chol_scr = extra_scr
    f32 = jnp.float32
    nxt = nx + nu
    nc = 2 * nx + 2 * nu + 2 * dof + npc
    o_xu, o_xl = 0, nx
    o_uu, o_ul = 2 * nx, 2 * nx + nu
    o_ru, o_rl = 2 * nx + 2 * nu, 2 * nx + 2 * nu + dof
    o_p = 2 * nx + 2 * nu + 2 * dof
    m_act = float(n_st * nc)
    s_idx, vs_idx = nx - 2, nx - 1

    bd = bd_ref[:].reshape(nx, nu, BT)
    a_sv = asv_ref[:]            # (1, B)
    tx = tx_ref[:]               # (nx, B)
    tu = tu_ref[:]
    tr = tr_ref[:]
    tx2, tu2, tr2 = tx * tx, tu * tu, tr * tr
    d_all = d_ref[:]             # (n_st, nc, B)
    eye_x = jnp.eye(nx, dtype=f32)[:, :, None]
    eye_u = jnp.eye(nu, dtype=f32)[:, :, None]
    # xu-block diagonal pattern: first dof entries of the nu-wide block
    eye_ud = jnp.concatenate(
        [jnp.eye(nu, dtype=f32)[:, :dof],
         jnp.zeros((nu, nu - dof), dtype=f32)], axis=1)[:, :, None]
    # one-hot masks (Mosaic has no scatter; single-index updates are
    # expressed as one-hot broadcast adds).  Built at their target ranks via
    # broadcasted_iota — 1-D reshapes and captured array literals are both
    # rejected by the Pallas lowering.
    def _onehot(shape, dim, idx):
        return (jax.lax.broadcasted_iota(jnp.int32, shape, dim)
                == idx).astype(f32)

    oh_vs_col = _onehot((1, nx, 1), 1, vs_idx)
    oh_vs_row = _onehot((nx, 1, 1), 0, vs_idx)
    oh_vs_xt = _onehot((nxt, 1), 0, vs_idx)
    oh_s_row = _onehot((nx, 1), 0, s_idx)

    def pad_u(v_dof):
        """(dof, B) -> (nu, B) zero-padded."""
        return jnp.concatenate(
            [v_dof, jnp.zeros((nu - dof, BT), dtype=f32)], axis=0)

    # ---- init iterates (warm-start arrays; all-ones = cold start)
    s_scr[:] = s0_ref[:]
    lam_scr[:] = lam0_ref[:]
    dx_scr[:] = jnp.zeros((n_st + 1, nxt, BT), dtype=f32)
    du_scr[:] = jnp.zeros((n_st, nu, BT), dtype=f32)
    iters_out[:] = jnp.zeros((1, BT), dtype=f32)

    def row_products():
        """C z for the current iterate -> (n_st, nc, B).

        Polytopic-row structure: cpx columns s/vs and the cpu dVs column
        are STRUCTURAL zeros (the RBF rows involve only the joint block,
        `constraints.py::stage_constraints`), so the contractions run over
        the first ``dof`` columns only — bit-identical (skipped terms are
        exact zeros), ~30% fewer row-sweep instructions."""
        dxv = dx_scr[:]
        duv = du_scr[:]
        cz_x = tx[None] * dxv[1:, :nx]
        cz_u = tu[None] * duv
        cz_r = tr[None] * (duv[:, :dof] - dxv[:n_st, nx:nx + dof])
        cpxv = cpx_ref[:].reshape(n_st, npc, nx, BT)[:, :, :dof]
        cpuv = cpu_ref[:].reshape(n_st, npc, nu, BT)[:, :, :dof]
        cz_p = (jnp.sum(cpxv * dxv[:n_st, :dof][:, None], axis=2)
                + jnp.sum(cpuv * duv[:, :dof][:, None], axis=2))
        return jnp.concatenate([cz_x, -cz_x, cz_u, -cz_u, cz_r, -cz_r, cz_p],
                               axis=1)

    def chol8(m):
        """(nu, nu, B) lower Cholesky, unrolled (NaN on non-PD)."""
        l_cols = []
        for j in range(nu):
            dgj = jnp.sqrt(m[j, j])[None]                   # (1, B)
            col = m[:, j] / dgj                             # (nu, B)
            if j:  # zero the strictly-upper part (no 0-size concats)
                col = jnp.concatenate(
                    [jnp.zeros((j, BT), dtype=f32), col[j:]], axis=0)
            l_cols.append(col)
            if j < nu - 1:
                m = m - col[:, None, :] * col[None, :, :]
        return jnp.stack(l_cols, axis=1)                    # (nu, nu, B)

    def cho_solve8(l_mat, rhs):
        """Solve (L L') X = rhs with rhs (nu, m, B)."""
        ys = []
        for i in range(nu):
            acc = rhs[i]
            for j in range(i):
                acc = acc - l_mat[i, j][None] * ys[j]
            ys.append(acc / l_mat[i, i][None])
        xs = [None] * nu
        for i in reversed(range(nu)):
            acc = ys[i]
            for j in range(i + 1, nu):
                acc = acc - l_mat[j, i][None] * xs[j]
            xs[i] = acc / l_mat[i, i][None]
        return jnp.stack(xs, axis=0)                        # (nu, m, B)

    def max_alpha(v, dv):
        neg = dv < -1e-12
        ratio = jnp.where(neg, -v / jnp.where(neg, dv, -1.0), jnp.inf)
        return jnp.minimum(
            1.0, FRAC_TO_BOUNDARY * jnp.min(ratio, axis=(0, 1)))[None]

    # ---- structured bd contractions.  bd is the exact ZOH of the nilpotent
    # A (models/dynamics.py): joint rows carry a single diagonal entry and
    # the s/vs rows only the dVs column.  The values are traced, so the
    # structural zeros cannot constant-fold — exploit them explicitly.  All
    # variants reproduce the original dense loops' f32 add association
    # bit-for-bit (skipped terms are exact zeros; the two dVs-column terms
    # keep their ascending-row grouping).
    bd_q = [bd[i, i] for i in range(dof)]            # (B,) each
    bd_s = bd[s_idx, nu - 1]
    bd_vs = bd[vs_idx, nu - 1]

    def bt_t(x):
        """bd' @ X for X (nx, m, B) -> (nu, m, B) (zero-based accumulate)."""
        rows = [bd_q[i][None] * x[i] for i in range(dof)]
        rows.append(bd_s[None] * x[s_idx] + bd_vs[None] * x[vs_idx])
        return jnp.stack(rows, axis=0)

    def bt_t_into(base, x):
        """base + bd' @ X, association ((base + t_s) + t_vs)."""
        rows = [base[i] + bd_q[i][None] * x[i] for i in range(dof)]
        rows.append((base[nu - 1] + bd_s[None] * x[s_idx])
                    + bd_vs[None] * x[vs_idx])
        return jnp.stack(rows, axis=0)

    def bd_mul(u_vec):
        """bd @ u for u (nu, B) -> (nx, B)."""
        rows = [bd_q[i] * u_vec[i] for i in range(dof)]
        rows.append(bd_s * u_vec[nu - 1])
        rows.append(bd_vs * u_vec[nu - 1])
        return jnp.stack(rows, axis=0)

    def stage_matrices(k):
        """Stage-k Hbar blocks (H + C' diag(w) C contributions).

        The C' diag(w) C rank-1 sweep runs on the (dof, dof) joint block
        only — the polytopic rows' s/vs/dVs columns are structural zeros
        (see row_products), so the full-block updates they would produce
        are exact zeros; the dof-block results are embedded back by
        concatenation.  Bit-identical to the full-width sweep."""
        km1 = jnp.maximum(k - 1, 0)
        wk = w_scr[k]                                        # (nc, B)
        on_x = jnp.where(k >= 1, 1.0, 0.0)
        dxx = on_x * tx2 * (w_scr[km1, o_xu:o_xu + nx]
                            + w_scr[km1, o_xl:o_xl + nx])
        q_m = hxx_ref[k].reshape(nx, nx, BT) + eye_x * dxx[None]
        su_m = hux_ref[k].reshape(nu, nx, BT)
        duu = (tu2 * (wk[o_uu:o_uu + nu] + wk[o_ul:o_ul + nu])
               + pad_u(tr2 * (wk[o_ru:o_ru + dof] + wk[o_rl:o_rl + dof])))
        r_m = huu_ref[k].reshape(nu, nu, BT) + eye_u * duu[None]
        cpxk = cpx_ref[k].reshape(npc, nx, BT)
        cpuk = cpu_ref[k].reshape(npc, nu, BT)
        # accumulate INTO the dof blocks (same add association as the
        # original full-width sweep, so the f32 results are unchanged)
        q_dd = q_m[:dof, :dof]
        s_dd = su_m[:dof, :dof]
        r_dd = r_m[:dof, :dof]
        for r in range(npc):
            cx_d = cpxk[r][:dof]                             # (dof, B)
            cu_d = cpuk[r][:dof]
            cw = cx_d * wk[o_p + r][None]
            cwu = cu_d * wk[o_p + r][None]
            q_dd = q_dd + cx_d[:, None] * cw[None]
            s_dd = s_dd + cu_d[:, None] * cw[None]
            r_dd = r_dd + cu_d[:, None] * cwu[None]
        q_xx = jnp.concatenate([
            jnp.concatenate([q_dd, q_m[:dof, dof:]], axis=1),
            q_m[dof:]], axis=0)
        su_x = jnp.concatenate([
            jnp.concatenate([s_dd, su_m[:dof, dof:]], axis=1),
            su_m[dof:]], axis=0)
        r_uu = jnp.concatenate([
            jnp.concatenate([r_dd, r_m[:dof, dof:]], axis=1),
            r_m[dof:]], axis=0)
        srr = tr2 * (wk[o_ru:o_ru + dof] + wk[o_rl:o_rl + dof])
        srr_u = pad_u(srr) + pad_u(r2_ref[k])                # (nu, B)
        # Q xu-xu diagonal and S u-xu diagonal
        q_vv = eye_u * srr_u[None]
        s_uv = -(eye_ud * srr_u[None])
        return q_xx, su_x, r_uu, q_vv, s_uv, cpxk, cpuk, on_x, km1

    def stage_gradient(k, on_x, km1, cpxk, cpuk):
        """Stage-k gbar (g + C' g_rows) from the current r_scr rows."""
        rk = r_scr[k]
        gq_x = (gx_ref[k] + on_x * tx * (r_scr[km1, o_xu:o_xu + nx]
                                         - r_scr[km1, o_xl:o_xl + nx]))
        g_rr = tr * (rk[o_ru:o_ru + dof] - rk[o_rl:o_rl + dof])
        gq_v = gxu_ref[k] - g_rr                             # (dof, B)
        gu_k = (gu_ref[k] + tu * (rk[o_uu:o_uu + nu] - rk[o_ul:o_ul + nu])
                + pad_u(g_rr))
        rk_p = rk[o_p:o_p + npc]                             # (npc, B)
        # dof-block restriction (structural zeros; see stage_matrices)
        gq_x = jnp.concatenate(
            [gq_x[:dof] + jnp.sum(cpxk[:, :dof] * rk_p[:, None], axis=0),
             gq_x[dof:]], axis=0)
        gu_k = jnp.concatenate(
            [gu_k[:dof] + jnp.sum(cpuk[:, :dof] * rk_p[:, None], axis=0),
             gu_k[dof:]], axis=0)
        gq = jnp.concatenate([gq_x, pad_u(gq_v)], axis=0)    # (nxt, B)
        return gq, gu_k

    def riccati_matrix(p_mat, q_xx, su_x, r_uu, q_vv, s_uv):
        """One structured matrix Riccati step: (pa_x, q_bar, s_bar, r_bar)."""
        # pa_x = (P @ at)[:, :nx]
        pa_x = (p_mat[:, :nx]
                + oh_vs_col * (a_sv[0] * p_mat[:, s_idx])[:, None])
        contrib = (pa_x[:nx]
                   + oh_vs_row * (a_sv[0] * pa_x[s_idx])[None])
        q_bar_xx = q_xx + contrib
        q_bar = jnp.concatenate([
            jnp.concatenate([q_bar_xx,
                             jnp.zeros((nx, nu, BT), f32)], axis=1),
            jnp.concatenate([jnp.zeros((nu, nx, BT), f32), q_vv], axis=1),
        ], axis=0)
        # s_bar = S + bt' P at  (structured bd; see bt_t)
        bt_pa = bt_t(pa_x[:nx])
        s_bar_x = su_x + bt_pa + pa_x[nx:]
        s_bar = jnp.concatenate([s_bar_x, s_uv], axis=1)     # (nu, nxt, B)
        # r_bar = R + bt' P bt:  pb = P @ bt columns, then bd' fold
        pb_cols = [p_mat[:, nx + u] + p_mat[:, u] * bd_q[u][None]
                   for u in range(dof)]
        pb_cols.append((p_mat[:, nx + nu - 1]
                        + p_mat[:, s_idx] * bd_s[None])
                       + p_mat[:, vs_idx] * bd_vs[None])
        pb = jnp.stack(pb_cols, axis=1)                      # (nxt, nu, B)
        r_bar = bt_t_into(r_uu + pb[nx:], pb[:nx])
        return pa_x, q_bar, s_bar, r_bar

    def riccati_vector(p_mat_x, p_vec, gq, gu_k, k):
        """One vector Riccati step against P_{k+1}'s x-columns (nxt, nx, B)."""
        e_k = e_ref[k]                                       # (nx, B)
        m_vec = p_vec + jnp.sum(p_mat_x * e_k[None], axis=1)
        qx_bar = (gq
                  + jnp.concatenate(
                      [m_vec[:nx], jnp.zeros((nu, BT), f32)], axis=0)
                  + oh_vs_xt * (a_sv[0] * m_vec[s_idx])[None])
        ru_bar = gu_k + m_vec[nx:] + bt_t(m_vec[:nx][:, None])[:, 0]
        return qx_bar, ru_bar

    def rollout_and_targets():
        """Forward rollout over saved gains/feed-forwards + C z targets.

        Static unroll; du targets land in kff_scr, which each stage reads
        before overwriting."""
        dx_list = [jnp.zeros((nxt, BT), dtype=f32)]
        dxk = dx_list[0]
        for k in range(n_st):
            kg = kg_scr[k].reshape(nu, nxt, BT)
            du_k = kff_scr[k] + jnp.sum(kg * dxk[None], axis=1)
            x_next = (dxk[:nx]
                      + oh_s_row * (a_sv[0] * dxk[vs_idx])[None]
                      + bd_mul(du_k)
                      + e_ref[k])
            kff_scr[k] = du_k            # du target (reuses k_ff slot)
            dxk = jnp.concatenate([x_next, du_k], axis=0)
            dx_list.append(dxk)
        dx_t = jnp.stack(dx_list, axis=0)                    # (n_st+1, nxt, B)
        du_t = kff_scr[:]                                    # (n_st, nu, B)

        cz_x = tx[None] * dx_t[1:, :nx]
        cz_u = tu[None] * du_t
        cz_r = tr[None] * (du_t[:, :dof] - dx_t[:n_st, nx:nx + dof])
        # dof-block restriction (structural zeros; see row_products)
        cpxv = cpx_ref[:].reshape(n_st, npc, nx, BT)[:, :, :dof]
        cpuv = cpu_ref[:].reshape(n_st, npc, nu, BT)[:, :, :dof]
        cz_p = (jnp.sum(cpxv * dx_t[:n_st, :dof][:, None], axis=2)
                + jnp.sum(cpuv * du_t[:, :dof][:, None], axis=2))
        cz_t = jnp.concatenate([cz_x, -cz_x, cz_u, -cz_u, cz_r, -cz_r, cz_p],
                               axis=1)
        return dx_t, du_t, cz_t

    def newton_body(carry):
        it, done, mu = carry
        active = 1.0 - done                                  # (1, B)

        sv = s_scr[:]
        lv = lam_scr[:]
        s_safe = jnp.maximum(sv, 1e-10)
        w = lv / s_safe
        mu_meas = jnp.sum(sv * lv, axis=(0, 1))[None] / m_act
        w_scr[:] = w

        # terminal matrix boundary: knot N cost + its state-box contribution
        w_x_t = (w[n_st - 1, o_xu:o_xu + nx]
                 + w[n_st - 1, o_xl:o_xl + nx])              # (nx, B)
        p_xx0 = (hxx_ref[n_st].reshape(nx, nx, BT)
                 + eye_x * (tx2 * w_x_t)[None])
        p0 = jnp.concatenate([
            jnp.concatenate([p_xx0, jnp.zeros((nx, nu, BT), f32)], axis=1),
            jnp.zeros((nu, nxt, BT), f32)], axis=0)

        def terminal_pv0():
            """Terminal vector boundary from the current r_scr rows."""
            r_x_t = (r_scr[n_st - 1, o_xu:o_xu + nx]
                     - r_scr[n_st - 1, o_xl:o_xl + nx])
            return jnp.concatenate([gx_ref[n_st] + tx * r_x_t,
                                    jnp.zeros((nu, BT), f32)], axis=0)

        if not mehrotra:
            # ---- adaptive: ONE fused matrix+vector backward sweep per
            # iteration against the carried barrier parameter mu
            r_scr[:] = w * (sv - d_all) + mu / s_safe        # g_rows
            pv0 = terminal_pv0()

            def bwd(i, carry_p):
                p_mat, p_vec = carry_p
                k = n_st - 1 - i
                (q_xx, su_x, r_uu, q_vv, s_uv,
                 cpxk, cpuk, on_x, km1) = stage_matrices(k)
                gq, gu_k = stage_gradient(k, on_x, km1, cpxk, cpuk)
                pa_x, q_bar, s_bar, r_bar = riccati_matrix(
                    p_mat, q_xx, su_x, r_uu, q_vv, s_uv)
                qx_bar, ru_bar = riccati_vector(
                    p_mat[:, :nx], p_vec, gq, gu_k, k)

                lmat = chol8(r_bar + 1e-9 * jnp.eye(nu, dtype=f32)[:, :, None])
                rhs = jnp.concatenate([s_bar, ru_bar[:, None]], axis=1)
                sol = -cho_solve8(lmat, rhs)                 # (nu, nxt+1, B)
                k_gain = sol[:, :nxt]
                k_ff = sol[:, nxt]
                kg_scr[k] = k_gain.reshape(nu * nxt, BT)
                kff_scr[k] = k_ff

                p_new = q_bar
                p_vec_new = qx_bar
                for m2 in range(nu):
                    p_new = p_new + s_bar[m2][:, None] * k_gain[m2][None]
                    p_vec_new = p_vec_new + s_bar[m2] * k_ff[m2][None]
                p_new = 0.5 * (p_new + jnp.swapaxes(p_new, 0, 1))
                return (p_new, p_vec_new)

            jax.lax.fori_loop(0, n_st, bwd, (p0, pv0), unroll=False)
            dx_t, du_t, cz_t = rollout_and_targets()
            s_t = d_all - cz_t
            lam_t = mu / s_safe + w * (cz_t + sv - d_all)
        else:
            # ---- Mehrotra predictor-corrector: factor the Riccati sweep
            # ONCE (saving P x-columns, Cholesky factors, S-bars, gains),
            # then run two cheap vector sweeps: the affine probe and the
            # centering corrector.  Mirrors solve_qp_ipm_s(scheme="mehrotra").
            def bwd_m(i, p_mat):
                k = n_st - 1 - i
                p_scr[k] = p_mat[:, :nx].reshape(nxt * nx, BT)
                (q_xx, su_x, r_uu, q_vv, s_uv,
                 cpxk, cpuk, on_x, km1) = stage_matrices(k)
                pa_x, q_bar, s_bar, r_bar = riccati_matrix(
                    p_mat, q_xx, su_x, r_uu, q_vv, s_uv)
                lmat = chol8(r_bar + 1e-9 * jnp.eye(nu, dtype=f32)[:, :, None])
                chol_scr[k] = lmat.reshape(nu * nu, BT)
                sb_scr[k] = s_bar.reshape(nu * nxt, BT)
                k_gain = -cho_solve8(lmat, s_bar)            # (nu, nxt, B)
                kg_scr[k] = k_gain.reshape(nu * nxt, BT)
                p_new = q_bar
                for m2 in range(nu):
                    p_new = p_new + s_bar[m2][:, None] * k_gain[m2][None]
                p_new = 0.5 * (p_new + jnp.swapaxes(p_new, 0, 1))
                return p_new

            jax.lax.fori_loop(0, n_st, bwd_m, p0, unroll=False)

            def vec_sweep(rhs_rows):
                """Vector-only backward sweep + rollout for one RHS."""
                r_scr[:] = w * (sv - d_all) + rhs_rows / s_safe
                pv0 = terminal_pv0()

                def bwd_v(i, p_vec):
                    k = n_st - 1 - i
                    km1 = jnp.maximum(k - 1, 0)
                    on_x = jnp.where(k >= 1, 1.0, 0.0)
                    cpxk = cpx_ref[k].reshape(npc, nx, BT)
                    cpuk = cpu_ref[k].reshape(npc, nu, BT)
                    gq, gu_k = stage_gradient(k, on_x, km1, cpxk, cpuk)
                    p_mat_x = p_scr[k].reshape(nxt, nx, BT)
                    lmat = chol_scr[k].reshape(nu, nu, BT)
                    s_bar = sb_scr[k].reshape(nu, nxt, BT)
                    qx_bar, ru_bar = riccati_vector(
                        p_mat_x, p_vec, gq, gu_k, k)
                    k_ff = -cho_solve8(lmat, ru_bar[:, None])[:, 0]
                    kff_scr[k] = k_ff
                    p_vec_new = qx_bar + jnp.sum(s_bar * k_ff[:, None],
                                                 axis=0)
                    return p_vec_new

                jax.lax.fori_loop(0, n_st, bwd_v, pv0, unroll=False)
                return rollout_and_targets()

            # affine probe (no centering)
            _, _, cz_a = vec_sweep(jnp.zeros((n_st, nc, BT), dtype=f32))
            s_a_t = d_all - cz_a
            lam_a_t = w * (cz_a + sv - d_all)
            ds_a = s_a_t - sv
            dlam_a = lam_a_t - lv
            a_p_aff = max_alpha(sv, ds_a)
            a_d_aff = max_alpha(lv, dlam_a)
            mu_aff = jnp.sum((sv + a_p_aff[None] * ds_a)
                             * (lv + a_d_aff[None] * dlam_a),
                             axis=(0, 1))[None] / m_act
            sigma_m = jnp.clip((mu_aff / jnp.maximum(mu_meas, 1e-12)) ** 3,
                               1e-4, 1.0)
            # corrector (centering + Mehrotra second-order term)
            rhs_rows = sigma_m[None] * mu_meas[None] - ds_a * dlam_a
            dx_t, du_t, cz_t = vec_sweep(rhs_rows)
            s_t = d_all - cz_t
            lam_t = rhs_rows / s_safe + w * (cz_t + sv - d_all)

        ds = s_t - sv
        dlam = lam_t - lv
        alpha_p = max_alpha(sv, ds)                           # (1, B)
        alpha_d = max_alpha(lv, dlam)

        dx_n = dx_scr[:] + alpha_p[None] * (dx_t - dx_scr[:])
        du_n = du_scr[:] + alpha_p[None] * (du_t - du_scr[:])
        s_n = sv + alpha_p[None] * ds
        lam_n = lv + alpha_d[None] * dlam

        finite = (jnp.all(jnp.isfinite(dx_n), axis=(0, 1))
                  & jnp.all(jnp.isfinite(du_n), axis=(0, 1))
                  & jnp.all(jnp.isfinite(s_n), axis=(0, 1))
                  & jnp.all(jnp.isfinite(lam_n), axis=(0, 1)))[None]
        upd = active * jnp.where(finite, 1.0, 0.0)            # (1, B)
        dx_scr[:] = jnp.where(upd[None] > 0, dx_n, dx_scr[:])
        du_scr[:] = jnp.where(upd[None] > 0, du_n, du_scr[:])
        s_scr[:] = jnp.where(upd[None] > 0, s_n, sv)
        lam_scr[:] = jnp.where(upd[None] > 0, lam_n, lv)

        # ---- convergence / divergence bookkeeping (updated iterate)
        sv2 = s_scr[:]
        lv2 = lam_scr[:]
        cz2 = row_products()
        r_ineq = jnp.max(jnp.abs(cz2 + sv2 - d_all), axis=(0, 1))[None]
        mu_post = jnp.sum(sv2 * lv2, axis=(0, 1))[None] / m_act
        alpha_min = jnp.minimum(alpha_p, alpha_d)
        sigma = jnp.clip((1.0 - alpha_min) ** 2, 0.1, 0.8)
        mu_new = jnp.maximum(sigma * mu_post, 0.01 * EPS_IPM)
        mu_out_v = jnp.where(active > 0, mu_new, mu)
        conv = (mu_post < EPS_IPM) & (r_ineq < 2e-4)
        diverged = (~(finite > 0)) | (mu_post > 1e6)
        stop = jnp.where(conv | diverged, 1.0, 0.0)
        done_new = jnp.maximum(done, active * stop)
        iters_out[:] = iters_out[:] + active
        return it + 1, done_new, mu_out_v

    def newton_cond(carry):
        it, done, mu = carry
        return jnp.logical_and(it < max_iter, jnp.min(done) < 0.5)

    mu0 = jnp.sum(s0_ref[:] * lam0_ref[:], axis=(0, 1))[None] / m_act
    jax.lax.while_loop(newton_cond, newton_body,
                       (jnp.asarray(0, jnp.int32),
                        jnp.zeros((1, BT), dtype=f32), mu0))

    # ---- final verdict (same as the XLA path)
    sv = s_scr[:]
    lv = lam_scr[:]
    cz = row_products()
    r_fin = jnp.max(jnp.abs(cz + sv - d_all), axis=(0, 1))[None]
    mu_fin = jnp.sum(sv * lv, axis=(0, 1))[None] / m_act
    solved = (mu_fin < 10 * EPS_IPM) & (r_fin < 1e-3)
    dx_out[:] = dx_scr[:]
    du_out[:] = du_scr[:]
    lam_out[:] = lam_scr[:]
    s_fin_out[:] = sv
    solved_out[:] = jnp.where(solved, 1.0, 0.0)
    mu_out[:] = mu_fin


def _rows_to_groups(rows, n_st, nx):
    """Packed (b, N+1, nc_stage) warm rows -> kernel (b, N, nc) concat order.

    The packed column order past the state box is exactly the kernel's
    [uu | ul | ru | rl | p] concatenation, so this is two slices + concat.
    """
    return jnp.concatenate(
        [rows[:, 1:, 0:nx], rows[:, 1:, nx:2 * nx], rows[:, :n_st, 2 * nx:]],
        axis=2)


def _pack_inputs(qp: StageQPK, system: System, warm_s, warm_lam):
    """Batched StageQPK (leading axis B) -> kernel input list (batch-last).

    StageQPK already stores the exact blocks the kernel reads, so this is
    flatten + one batch-to-lanes transpose per array — no slicing/repacking.
    """
    nx, nu, dof = system.nx, system.nu, system.dof
    npc = system.npc
    n_st = qp.e.shape[1]
    b = qp.e.shape[0]
    bl = lambda a: jnp.moveaxis(a, 0, -1)  # batch-last

    hxx = bl(qp.hxx.reshape(b, n_st + 1, nx * nx))
    hux = bl(qp.hux.reshape(b, n_st, nu * nx))
    huu = bl(qp.huu.reshape(b, n_st, nu * nu))
    r2 = bl(qp.r2)
    gx = bl(qp.gx)
    gu = bl(qp.gu)
    gxu = bl(qp.gxu)
    e = bl(qp.e)
    bd = bl(qp.bd.reshape(b, nx * nu))
    a_sv = jnp.broadcast_to(qp.a_sv.reshape(b)[None, :], (1, b))
    cpx = bl(qp.cpx.reshape(b, n_st, npc * nx))
    cpu = bl(qp.cpu.reshape(b, n_st, npc * nu))
    d_cat = bl(jnp.concatenate([qp.d_xu, qp.d_xl, qp.d_uu, qp.d_ul,
                                qp.d_ru, qp.d_rl, qp.d_p], axis=2))
    tx = bl(qp.tx)
    tu = bl(qp.tu)
    tr = bl(qp.t_rate)
    s0 = bl(_rows_to_groups(warm_s, n_st, nx))
    lam0 = bl(_rows_to_groups(warm_lam, n_st, nx))
    return [hxx, hux, huu, r2, gx, gu, gxu, e, bd, a_sv, cpx, cpu, d_cat,
            tx, tu, tr, s0, lam0], n_st


@functools.partial(jax.jit,
                   static_argnames=("system", "max_iter", "interpret",
                                    "scheme"))
def _solve_batched(qp: StageQPK, system: System = PANDA, max_iter: int = 25,
                   interpret: bool = False, scheme: str = "adaptive",
                   warm_s: jnp.ndarray | None = None,
                   warm_lam: jnp.ndarray | None = None):
    """Batched solve: StageQPK with leading batch axis -> batched IPMSolution.

    ``warm_s``/``warm_lam``: packed (b, N+1, nc_stage) warm-start iterates
    (see qp_ipm.solve_qp_ipm); ``None`` = cold start (all ones).
    """
    nx, nu, dof, npc = system.nx, system.nu, system.dof, system.npc
    nxt = nx + nu
    nc = 2 * nx + 2 * nu + 2 * dof + npc
    b = qp.e.shape[0]
    n_stp1 = qp.e.shape[1] + 1
    nc_stage = nc
    in_dtype = qp.e.dtype
    qp = jax.tree.map(lambda a: a.astype(jnp.float32), qp)
    if warm_s is None:
        warm_s = jnp.ones((b, n_stp1, nc_stage), dtype=jnp.float32)
    if warm_lam is None:
        warm_lam = jnp.ones((b, n_stp1, nc_stage), dtype=jnp.float32)
    inputs, n_st = _pack_inputs(qp, system, warm_s.astype(jnp.float32),
                                warm_lam.astype(jnp.float32))

    # pad the batch (lanes) to a BT multiple with copies of scenario 0
    b_pad = ((b + BT - 1) // BT) * BT
    if b_pad != b:
        inputs = [jnp.concatenate(
            [a, jnp.repeat(a[..., :1], b_pad - b, axis=-1)], axis=-1)
            for a in inputs]
    n_tiles = b_pad // BT

    kern = functools.partial(_ipm_kernel, n_st=n_st, nx=nx, nu=nu, dof=dof,
                             npc=npc, max_iter=max_iter, scheme=scheme)
    grid = (n_tiles,)

    def spec(a):
        shape = a.shape[:-1] + (BT,)
        nlead = len(shape) - 1
        return pl.BlockSpec(shape,
                            lambda i, _n=nlead: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((n_st + 1, nxt, b_pad), jnp.float32),  # dx
        jax.ShapeDtypeStruct((n_st, nu, b_pad), jnp.float32),       # du
        jax.ShapeDtypeStruct((n_st, nc, b_pad), jnp.float32),       # lam
        jax.ShapeDtypeStruct((1, b_pad), jnp.float32),              # iters
        jax.ShapeDtypeStruct((1, b_pad), jnp.float32),              # solved
        jax.ShapeDtypeStruct((1, b_pad), jnp.float32),              # mu
        jax.ShapeDtypeStruct((n_st, nc, b_pad), jnp.float32),       # s final
    ]
    out_specs = [spec(jnp.zeros(s.shape)) for s in out_shapes]

    scratch = [
        pltpu.VMEM((n_st, nc, BT), jnp.float32),        # s
        pltpu.VMEM((n_st, nc, BT), jnp.float32),        # lam
        pltpu.VMEM((n_st, nc, BT), jnp.float32),        # r_rows
        pltpu.VMEM((n_st, nc, BT), jnp.float32),        # w
        pltpu.VMEM((n_st, nu * nxt, BT), jnp.float32),  # k_gains
        pltpu.VMEM((n_st, nu, BT), jnp.float32),        # k_ff / du targets
        pltpu.VMEM((n_st + 1, nxt, BT), jnp.float32),   # dx iterate
        pltpu.VMEM((n_st, nu, BT), jnp.float32),        # du iterate
    ]
    if scheme == "mehrotra":
        scratch += [
            pltpu.VMEM((n_st, nxt * nx, BT), jnp.float32),  # P x-columns
            pltpu.VMEM((n_st, nu * nxt, BT), jnp.float32),  # S-bars
            pltpu.VMEM((n_st, nu * nu, BT), jnp.float32),   # Cholesky factors
        ]

    dx, du, lam_cat, iters, solved, mu, s_cat = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(a) for a in inputs],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        # inputs + iterates + Riccati gains + loop transients peak ~19 MB at
        # BT=128 — above the 16 MB default scoped limit, well under the
        # physical VMEM of v5e+
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)

    # back to leading-batch layout; strip padding
    dx = jnp.moveaxis(dx, -1, 0)[:b].astype(in_dtype)
    du = jnp.moveaxis(du, -1, 0)[:b].astype(in_dtype)
    lam_cat = jnp.moveaxis(lam_cat, -1, 0)[:b].astype(in_dtype)
    s_cat = jnp.moveaxis(s_cat, -1, 0)[:b].astype(in_dtype)
    iters = iters[0, :b].astype(jnp.int32)
    solved = solved[0, :b] > 0.5
    mu = mu[0, :b].astype(in_dtype)

    # scatter group rows into the packed StageQP row layout
    def groups_to_rows(cat, base):
        rows = jnp.full((b, n_st + 1, nc), base, dtype=in_dtype)
        rows = rows.at[:, 1:, 0:2 * nx].set(cat[:, :, 0:2 * nx])
        rows = rows.at[:, :n_st, 2 * nx:].set(cat[:, :, 2 * nx:])
        return rows

    return IPMSolution(dx_tilde=dx, du=du, lam=groups_to_rows(lam_cat, 0.0),
                       iters=iters, solved=solved, mu=mu,
                       s_rows=groups_to_rows(s_cat, 1.0),
                       lam_rows=groups_to_rows(lam_cat, 1.0))


_SOLVER_CACHE: dict = {}


def make_pallas_ipm(system: System = PANDA, max_iter: int = 25,
                    interpret: bool = False, scheme: str = "adaptive"):
    """Build (and cache) the custom-vmap pallas IPM for a system/budget."""
    key = (system.name, max_iter, interpret, scheme)
    if key in _SOLVER_CACHE:
        return _SOLVER_CACHE[key]

    @jax.custom_batching.custom_vmap
    def solve(qp: StageQPK, warm_s, warm_lam) -> IPMSolution:
        # unbatched call: run the batched kernel with B = 1 (127 idle lanes;
        # still one launch and VMEM-resident — fast in absolute terms)
        qp1 = jax.tree.map(lambda a: a[None], qp)
        sol = _solve_batched(qp1, system=system, max_iter=max_iter,
                             interpret=interpret, scheme=scheme,
                             warm_s=warm_s[None], warm_lam=warm_lam[None])
        return jax.tree.map(lambda a: a[0], sol)

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, qp, warm_s, warm_lam):
        bc = lambda a, isb: a if isb else jnp.broadcast_to(
            a[None], (axis_size,) + a.shape)
        qp_b = jax.tree.map(bc, qp, in_batched[0])
        sol = _solve_batched(qp_b, system=system, max_iter=max_iter,
                             interpret=interpret, scheme=scheme,
                             warm_s=bc(warm_s, in_batched[1]),
                             warm_lam=bc(warm_lam, in_batched[2]))
        return sol, jax.tree.map(lambda _: True, sol)

    _SOLVER_CACHE[key] = solve
    return solve


def solve_qp_ipm_pallas(qp: StageQPK, max_iter: int = 25,
                        system: System = PANDA,
                        interpret: bool | None = None,
                        scheme: str = "adaptive",
                        warm_s: jnp.ndarray | None = None,
                        warm_lam: jnp.ndarray | None = None) -> IPMSolution:
    """Drop-in for `solve_qp_ipm_s(scheme=...)` on the TPU kernel.

    ``interpret=None`` auto-selects: compiled on TPU backends, the Pallas
    interpreter elsewhere (CPU tests of the `riccati_pallas` config).
    ``scheme`` mirrors :func:`~.qp_ipm.solve_qp_ipm_s`: ``"adaptive"``
    (one fused sweep per iteration; the production default since the r4
    structure exploits — see the module docstring) or ``"mehrotra"``
    (factor once, affine probe + centering corrector as vector sweeps —
    fewer iterations at a higher per-iteration cost).
    """
    if interpret is None:
        # "axon" is this environment's tunneled-TPU PJRT platform name
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_stp1 = qp.e.shape[0] + 1
    nc = 2 * system.nx + 2 * system.nu + 2 * system.dof + system.npc
    if warm_s is None:
        warm_s = jnp.ones((n_stp1, nc), dtype=jnp.float32)
    if warm_lam is None:
        warm_lam = jnp.ones((n_stp1, nc), dtype=jnp.float32)
    return make_pallas_ipm(system, max_iter, interpret, scheme)(
        qp, warm_s, warm_lam)
