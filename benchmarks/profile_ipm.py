"""Micro-breakdown of the IPM Newton step at batch scale (slope timing).

Pieces:
  * cwc     — the C' diag(w) C stage-Hessian modification einsum
  * factor  — matrix backward Riccati sweep (gains + cost-to-go)
  * ff      — vector backward sweep + forward rollout
  * rowdot  — C z row products

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_ipm.py [batch]
"""

import sys
import time

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
            return wcur * 1.0 + 1e-20 * (h_mod.sum(axis=(1, 2, 3))
                                         + g_mod.sum(axis=(1, 2)))[:, None, None]
        return jax.lax.fori_loop(0, k, body, w)

    h_mod_b, g_mod_b = jax.jit(jax.vmap(one_cwc))(st_b, w_b)

    def one_factor(qp, h_mod):
        hbar = qp.h + h_mod[:N]
        hbar_term = qp.h_term + h_mod[N, :nxt, :nxt]
        return qp_ipm._riccati_factor(qp, hbar, hbar_term)

    @jax.jit
    def chain_factor(h, k):
        def body(i, hcur):
            fact = jax.vmap(one_factor)(st_b, hcur)
            k_gains = fact[3]
            return hcur + 1e-20 * k_gains.sum(axis=(1, 2, 3))[:, None, None, None]
        return jax.lax.fori_loop(0, k, body, h)

    fact_b = jax.jit(jax.vmap(one_factor))(st_b, h_mod_b)

    def one_ff(qp, fact, g_mod):
        gbar = qp.g + g_mod[:N]
        gbar_term = qp.g_term + g_mod[N, :nxt]
        return qp_ipm._riccati_ff(qp, fact, gbar, gbar_term)

    @jax.jit
    def chain_ff(g, k):
        def body(i, gcur):
            dx, du = jax.vmap(one_ff)(st_b, fact_b, gcur)
            return gcur + 1e-20 * (dx.sum(axis=(1, 2))
                                   + du.sum(axis=(1, 2)))[:, None, None]
        return jax.lax.fori_loop(0, k, body, g)

    dx_b, du_b = jax.jit(jax.vmap(one_ff))(st_b, fact_b, g_mod_b)

    def one_rows(qp, dx_all, du_all):
        c_eff = qp.c_rows * qp.mask[..., None]
        du_pad = jnp.concatenate([du_all, jnp.zeros((1, nu), dtype=dtype)])
        z_all = jnp.concatenate([dx_all, du_pad], axis=1)
        return jnp.einsum("krz,kz->kr", c_eff, z_all)

    @jax.jit
    def chain_rows(d, k):
        def body(i, dcur):
            cz = jax.vmap(one_rows)(st_b, dcur, du_b)
            return dcur + 1e-20 * cz.sum(axis=(1, 2))[:, None, None]
        return jax.lax.fori_loop(0, k, body, d)

    for name, mk, arg, k1, k2 in [
            ("cwc", chain_cwc, w_b, 10, 110),
            ("factor", chain_factor, h_mod_b, 10, 110),
            ("ff", chain_ff, g_mod_b, 10, 110),
            ("rowdot", chain_rows, dx_b, 10, 110)]:
        def run(k, mk=mk, arg=arg):
            return float(jnp.sum(mk(arg, jnp.asarray(k))))
        t = _slope_time(run, k1, k2)
        print(f"{name:8s}: {t*1e3:9.3f} ms/iter ({t*1e6/batch:8.2f} us/scenario)",
              flush=True)


if __name__ == "__main__":
    main()
