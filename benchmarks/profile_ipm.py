"""Micro-breakdown of one IPM Newton step at batch scale (slope timing).

Pieces:
  * cwc      — the C' diag(w) C stage-Hessian modification (einsum pair)
  * riccati  — matrix backward sweep + forward rollout
  * rowdot   — C z row products + slack/dual closed forms
  * newton   — one full fused Newton body (all of the above)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_ipm.py [batch]
"""

import sys
import time
from functools import partial

import numpy as np


def _slope_time(call, k1: int, k2: int, reps: int = 3):
    call(k1)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call(k1)
        t1 = time.perf_counter()
        call(k2)
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return float(np.median(per))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem, X0_HOME
    from mpcc_manipulator_tpu.ocp import qp_stages as qps
    from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
    from mpcc_manipulator_tpu.solver import qp_ipm

    dtype = jnp.float32
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    track, params, _, sel_nn, env_nn, carry, x0, u0, obs = _build_problem(
        dtype, small=False)
    ts = 0.01

    rng = np.random.default_rng(0)
    q_b = jnp.asarray(X0_HOME[None, :7]
                      + 0.01 * rng.standard_normal((batch, 7)), dtype=dtype)
    obs_b = jnp.tile(obs[None, :], (batch, 1))
    rad_b = jnp.zeros(batch, dtype=dtype)
    n_var = 179
    z_b = jnp.asarray(
        np.tile(np.concatenate([np.tile(X0_HOME, 11), np.zeros(80)])[None],
                (batch, 1))
        + 0.001 * rng.standard_normal((batch, n_var)), dtype=dtype)

    rb_b = jax.jit(jax.vmap(lambda q, oo, rr: compute_robot_data(
        jnp.tile(q[None], (11, 1)), oo, rr, sel_nn, env_nn, mani_grad="ad"))
    )(q_b, obs_b, rad_b)
    st_b = jax.jit(jax.vmap(lambda z, rb: qps.build_qp_stages(
        track, z, rb, params, jnp.zeros(8, dtype=dtype), ts, False))
    )(z_b, rb_b)

    N = 10
    nxt, nu, nc = 17, 8, st_b.mask.shape[-1]
    w_b = jnp.abs(jnp.asarray(rng.standard_normal((batch, N + 1, nc)),
                              dtype=dtype)) + 0.1

    def one_cwc(qp, w):
        c_eff = qp.c_rows * qp.mask[..., None]
        cw = c_eff * w[..., None]
        h_mod = jnp.einsum("krz,krv->kzv", cw, c_eff)
        g_mod = jnp.einsum("krz,kr->kz", c_eff, w)
        return h_mod, g_mod

    @jax.jit
    def chain_cwc(w, k):
        def body(i, wcur):
            h_mod, g_mod = jax.vmap(one_cwc)(st_b, wcur)
            return wcur + 1e-20 * h_mod[:, 0, 0, 0][:, None, None] \
                + 1e-20 * g_mod[:, 0, 0][:, None, None]
        return jax.lax.fori_loop(0, k, body, w)

    def run_cwc(k):
        return float(jnp.sum(chain_cwc(w_b, jnp.asarray(k))))

    def one_riccati(qp, h_mod, g_mod):
        hbar = qp.h + h_mod[:N]
        gbar = qp.g + g_mod[:N]
        hbar_term = qp.h_term + h_mod[N, :nxt, :nxt]
        gbar_term = qp.g_term + g_mod[N, :nxt]
        return qp_ipm._riccati_solve(qp, hbar, gbar, hbar_term, gbar_term)

    h_mod_b, g_mod_b = jax.jit(jax.vmap(one_cwc))(st_b, w_b)

    @jax.jit
    def chain_ric(g, k):
        def body(i, gcur):
            dx, du = jax.vmap(one_riccati)(st_b, h_mod_b, gcur)
            return gcur + 1e-20 * du[:, 0, 0][:, None, None]
        return jax.lax.fori_loop(0, k, body, g)

    def run_ric(k):
        return float(jnp.sum(chain_ric(g_mod_b, jnp.asarray(k))))

    # row products + closed-form slack/dual targets
    def one_rows(qp, dx_all, du_all, w, s):
        c_eff = qp.c_rows * qp.mask[..., None]
        d_eff = qp.d_vec * qp.mask + (1.0 - qp.mask)
        du_pad = jnp.concatenate([du_all, jnp.zeros((1, nu), dtype=dtype)])
        z_all = jnp.concatenate([dx_all, du_pad], axis=1)
        cz = jnp.einsum("krz,kz->kr", c_eff, z_all)
        s_t = d_eff - cz
        lam_t = 1.0 / jnp.maximum(s, 1e-10) + w * (cz + s - d_eff)
        return s_t, lam_t

    dx_b, du_b = jax.jit(jax.vmap(one_riccati))(st_b, h_mod_b, g_mod_b)
    s_b = jnp.ones((batch, N + 1, nc), dtype=dtype)

    @jax.jit
    def chain_rows(s, k):
        def body(i, scur):
            s_t, lam_t = jax.vmap(one_rows)(st_b, dx_b, du_b, w_b, scur)
            return scur + 1e-20 * s_t
        return jax.lax.fori_loop(0, k, body, s)

    def run_rows(k):
        return float(jnp.sum(chain_rows(s_b, jnp.asarray(k))))

    # one full newton body: run solve_qp_ipm with max_iter=1
    @jax.jit
    def chain_newton(seed, k):
        def body(i, s):
            st2 = st_b.replace(g=st_b.g + 1e-20 * s[:, None, None])
            sol = jax.vmap(partial(qp_ipm.solve_qp_ipm, max_iter=1))(st2)
            return s + 1e-20 * sol.du[:, 0, 0]
        return jax.lax.fori_loop(0, k, body, seed)

    def run_newton(k):
        return float(jnp.sum(chain_newton(
            jnp.zeros(batch, dtype=dtype), jnp.asarray(k))))

    for name, fn, k1, k2 in [("cwc", run_cwc, 10, 110),
                             ("riccati", run_ric, 10, 110),
                             ("rowdot", run_rows, 10, 110),
                             ("newton_x1", run_newton, 10, 60)]:
        t = _slope_time(fn, k1, k2)
        print(f"{name:10s}: {t*1e3:9.3f} ms/iter ({t*1e6/batch:8.2f} us/scenario)",
              flush=True)


if __name__ == "__main__":
    main()
