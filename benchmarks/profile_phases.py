"""Phase breakdown of the batched MPCC tick on the real chip.

Uses the same slope-timing methodology as bench.py (chained fori_loop,
scalar readback, per-unit time from the K2-K1 slope) on each phase of the
tick separately:

  * robot_data  — FK + manipulability + both collision-NN linearizations
  * assemble    — stage-structured QP assembly (cost/constraint derivatives)
  * ipm         — one full interior-point QP solve (Riccati sweeps)
  * eval        — objective + constraint values (filter line-search trial)
  * tick        — the whole mpc_step (for reference)

This is diagnostic tooling, not part of the library API.
Run: python benchmarks/profile_phases.py [batch]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from __graft_entry__ import _build_problem, X0_HOME, X0_HOME_MOBILE
    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.system import SYSTEMS
    from mpcc_manipulator_tpu.mpc import mpc_step
    from mpcc_manipulator_tpu.ocp import qp_stages as qps
    from mpcc_manipulator_tpu.ocp import qp_data
    from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
    from mpcc_manipulator_tpu.solver import qp_ipm
    from mpcc_manipulator_tpu.models.dynamics import sim_time_step

    dtype = jnp.float32
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import os
    system = SYSTEMS[os.environ.get("MPCC_SYSTEM", "panda")]
    nx, nu, dof = system.nx, system.nu, system.dof
    n_knots = system.horizon + 1
    x_home = X0_HOME if system.name == "panda" else X0_HOME_MOBILE
    track, params, _, sel_nn, env_nn, carry, x0, u0, obs = _build_problem(
        dtype, small=False, system=system)
    cfg = SQPConfig(max_iter=20,
                    qp_solver=os.environ.get("MPCC_QP_SOLVER", "riccati_pallas"),
                    ipm_max_iter=25,
                    qp_max_iter=200, qp_check_every=25, mani_grad="analytic",
                    ipm_scheme=os.environ.get("MPCC_IPM_SCHEME", "adaptive"),
                    ipm_warm_start=os.environ.get("MPCC_IPM_WARM", "1") == "1",
                    qp_assembly=os.environ.get("MPCC_QP_ASSEMBLY", "pallas"))
    ts = 0.01

    rng = np.random.default_rng(0)
    q_b = jnp.asarray(x_home[None, :dof]
                      + 0.01 * rng.standard_normal((batch, dof)), dtype=dtype)
    obs_b = jnp.tile(obs[None, :], (batch, 1))
    rad_b = jnp.zeros(batch, dtype=dtype)

    n_var = system.n_var
    z_b = jnp.asarray(
        np.tile(np.concatenate([np.tile(x_home, n_knots),
                                np.zeros(nu * system.horizon)])[None],
                (batch, 1))
        + 0.001 * rng.standard_normal((batch, n_var)), dtype=dtype)
    u_b = jnp.zeros((batch, nu), dtype=dtype)

    # ---- phase: robot_data (chained; re-feed a scalar to defeat CSE)
    @jax.jit
    def chain_rb(qs, o, r, k):
        def body(i, qcur):
            rb = jax.vmap(lambda q, oo, rr: compute_robot_data(
                jnp.tile(q[None], (n_knots, 1)), oo, rr, sel_nn, env_nn,
                mani_grad="analytic", system=system))(qcur, o, r)
            # consume EVERY field: reducing only sel_dist lets XLA
            # dead-code-eliminate the env-NN Jacobian (the dominant cost) —
            # r4 measured a bogus 0.18 us/scenario that way
            used = (rb.sel_dist[:, 0] + rb.manipul[:, 0]
                    + jnp.sum(rb.d_manipul, axis=(1, 2))
                    + jnp.sum(rb.d_sel_dist, axis=(1, 2))
                    + jnp.sum(rb.env_dist, axis=(1, 2))
                    + jnp.sum(rb.d_env_dist, axis=(1, 2, 3))
                    + jnp.sum(rb.jv, axis=(1, 2, 3))
                    + jnp.sum(rb.jw, axis=(1, 2, 3))
                    + jnp.sum(rb.ee_pos, axis=(1, 2))
                    + jnp.sum(rb.ee_rot, axis=(1, 2, 3)))
            return qcur + 1e-20 * used[:, None]
        return jax.lax.fori_loop(0, k, body, qs)

    def run_rb(k):
        out = chain_rb(q_b, obs_b, rad_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: assembly (robot data fixed)
    rb_b = jax.jit(jax.vmap(lambda q, oo, rr: compute_robot_data(
        jnp.tile(q[None], (n_knots, 1)), oo, rr, sel_nn, env_nn,
        mani_grad="ad", system=system)))(q_b, obs_b, rad_b)

    @jax.jit
    def chain_asm(zs, k):
        def body(i, zcur):
            st = jax.vmap(lambda z, rb: qps.build_qp_stages(
                track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts, False,
                system=system))(zcur, rb_b)
            return zcur + 1e-20 * st.g[:, 0, 0][:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_asm(k):
        out = chain_asm(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: IPM solve (QP fixed)
    st_b = jax.jit(jax.vmap(lambda z, rb: qps.build_qp_stages(
        track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts, False,
        system=system)))(z_b, rb_b)

    @jax.jit
    def chain_ipm(seed, k):
        def body(i, s):
            st2 = st_b.replace(g=st_b.g + 1e-20 * s[:, None, None])
            sol = jax.vmap(partial(qp_ipm.solve_qp_ipm, max_iter=25))(st2)
            return s + 1e-20 * sol.du[:, 0, 0]
        return jax.lax.fori_loop(0, k, body, seed)

    def run_ipm(k):
        out = chain_ipm(jnp.zeros(batch, dtype=dtype), jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: pallas IPM solve (kernel-direct QP fixed)
    from mpcc_manipulator_tpu.solver import qp_ipm_pallas
    sts_b = jax.jit(jax.vmap(lambda z, rb: qps.build_qp_stages_k(
        track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts, False,
        system=system)))(z_b, rb_b)

    @jax.jit
    def chain_pipm(seed, k):
        def body(i, s):
            st2 = sts_b.replace(gx=sts_b.gx + 1e-20 * s[:, None, None])
            sol = qp_ipm_pallas._solve_batched(st2, system=system,
                                               max_iter=25,
                                               scheme=cfg.ipm_scheme)
            return s + 1e-20 * sol.du[:, 0, 0]
        return jax.lax.fori_loop(0, k, body, seed)

    def run_pipm(k):
        out = chain_pipm(jnp.zeros(batch, dtype=dtype), jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: struct assembly
    @jax.jit
    def chain_asms(zs, k):
        def body(i, zcur):
            st = jax.vmap(lambda z, rb: qps.build_qp_stages_s(
                track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts, False,
                system=system))(zcur, rb_b)
            return zcur + 1e-20 * st.g[:, 0, 0][:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_asms(k):
        out = chain_asms(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: kernel-direct assembly (the production assemble path)
    @jax.jit
    def chain_asmk(zs, k):
        def body(i, zcur):
            st = jax.vmap(lambda z, rb: qps.build_qp_stages_k(
                track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts, False,
                system=system))(zcur, rb_b)
            return zcur + 1e-20 * st.gx[:, 0, 0][:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_asmk(k):
        out = chain_asmk(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: fused Pallas assembly kernel (the production path)
    from mpcc_manipulator_tpu.ops import pallas_assembly as pasm

    @jax.jit
    def chain_asmp(zs, k):
        def body(i, zcur):
            st = pasm._build_batched(track, zcur, rb_b, params,
                                     jnp.zeros((batch, nu), dtype=dtype), ts,
                                     system=system)
            return zcur + 1e-20 * st.gx[:, 0, 0][:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_asmp(k):
        out = chain_asmp(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: fused Pallas eval kernel (objective + violation)
    @jax.jit
    def chain_evalp(zs, k):
        def body(i, zcur):
            o, v = pasm._eval_batched(track, zcur, rb_b, params,
                                      jnp.zeros((batch, nu), dtype=dtype), ts,
                                      system=system)
            return zcur + 1e-20 * (o + v)[:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_evalp(k):
        out = chain_evalp(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- phase: eval (objective + constraints; one line-search trial)
    @jax.jit
    def chain_eval(zs, k):
        def body(i, zcur):
            def one(z, rb):
                obj = qp_data.total_objective(track, z, rb, params, False,
                                              system=system)
                c, l, u = qp_data.constraint_values(
                    track, z, rb, params, jnp.zeros(nu, dtype=dtype), ts,
                    system=system)
                return obj + jnp.sum(jnp.maximum(c - u, 0.0))
            v = jax.vmap(one)(zcur, rb_b)
            return zcur + 1e-20 * v[:, None]
        return jax.lax.fori_loop(0, k, body, zs)

    def run_eval(k):
        out = chain_eval(z_b, jnp.asarray(k))
        return float(jnp.sum(out))

    # ---- whole tick
    from mpcc_manipulator_tpu.parallel import sharding as shd
    carry_b = shd.batch_init_carry(batch, dtype, system=system)
    x0_b = jnp.asarray(x_home[None, :]
                       + 0.01 * rng.standard_normal((batch, nx)), dtype=dtype)
    batched_step = jax.vmap(
        lambda c, x, u, o, r: mpc_step(track, params, sel_nn, env_nn,
                                       c, x, u, o, r, ts=ts, cfg=cfg,
                                       system=system))

    @jax.jit
    def chain_tick(cb, xb, ub, ob, rb, k):
        def body(i, stt):
            cb, xb, ub = stt
            c2, out = batched_step(cb, xb, ub, ob, rb)
            x2 = jax.vmap(lambda x, u: sim_time_step(x, u, ts))(
                out.x0_updated, out.u0)
            return (c2, x2, out.u0)
        return jax.lax.fori_loop(0, k, body, (cb, xb, ub))

    def run_tick(k):
        c, x, u = chain_tick(carry_b, x0_b, u_b, obs_b, rad_b, jnp.asarray(k))
        return float(jnp.sum(u))

    # how many SQP iters does the batch actually do per tick (max over lanes)?
    c2, out = jax.jit(batched_step)(carry_b, x0_b, u_b, obs_b, rad_b)
    sqp_iters = np.asarray(out.sqp_iters)
    qp_iters = np.asarray(out.qp_iters)

    results = {}
    for name, fn, k1, k2 in [("robot_data", run_rb, 5, 45),
                             ("assemble", run_asm, 5, 45),
                             ("assemble_s", run_asms, 5, 45),
                             ("assemble_k", run_asmk, 5, 45),
                             ("assemble_P", run_asmp, 10, 210),
                             ("ipm_solve", run_ipm, 3, 13),
                             ("ipm_pallas", run_pipm, 5, 45),
                             ("eval_point", run_eval, 5, 45),
                             ("eval_P", run_evalp, 10, 210),
                             ("full_tick", run_tick, 3, 13)]:
        t = _slope_time(fn, k1, k2)
        results[name] = t * 1e3
        print(f"{name:12s}: {t*1e3:9.3f} ms/iter  "
              f"({t*1e6/batch:8.2f} us/scenario)", flush=True)

    print(f"sqp_iters: max={sqp_iters.max()} mean={sqp_iters.mean():.1f}; "
          f"qp_iters(total newton): max={qp_iters.max()} mean={qp_iters.mean():.1f}")
    tick = results["full_tick"]
    model = (results["robot_data"]
             + sqp_iters.max() * (results["assemble_P"] + results["ipm_pallas"]
                                  + results["eval_P"]))
    print(f"tick={tick:.1f} ms; production phase model at max sqp iters = "
          f"{model:.1f} ms")


if __name__ == "__main__":
    main()
