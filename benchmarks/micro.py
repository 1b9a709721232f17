"""Phase-level microbenchmarks: where does a batched MPC tick spend time?

Times (batched over B scenarios, on the current default backend):
  - robot_data: FK + manipulability FD + both collision NNs (11 knots)
  - build_qp:   stage sweep + dense scatters
  - solve_qp:   one ADMM QP solve (cold + warm), per backend
  - mpc_step:   the full fused tick

Usage: python benchmarks/micro.py [batch]
"""

import sys
import time

import numpy as np


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_problem
    from mpcc_manipulator_tpu.config import PANDA_DOF, N_VAR
    from mpcc_manipulator_tpu.mpc import mpc_step, init_carry, _cold_start, _unwrap_s
    from mpcc_manipulator_tpu.ocp import qp_data
    from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.solver import qp_admm

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = jnp.float32
    track, params, _, sel_nn, env_nn, carry, x0, u0, obs = _build_problem(dtype)
    print(f"backend={jax.default_backend()} batch={batch}")

    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(np.asarray(x0)[None, :] + 0.01 * rng.standard_normal((batch, 9)),
                       dtype=dtype)
    z0_b = jax.vmap(lambda x: _unwrap_s(_cold_start(x, dtype), track.length))(x0_b)
    qs_b = z0_b[:, :9 * 11].reshape(batch, 11, 9)[:, :, :PANDA_DOF]

    # --- robot data sweep
    rd_fn = jax.jit(jax.vmap(
        lambda qs: compute_robot_data(qs, obs, jnp.asarray(0.0, dtype), sel_nn, env_nn)))
    t = timeit(rd_fn, qs_b)
    print(f"robot_data (11 knots): {t * 1e3:8.2f} ms  ({t / batch * 1e6:7.1f} us/scenario)")
    rb_b = rd_fn(qs_b)

    # --- build_qp
    bq_fn = jax.jit(jax.vmap(
        lambda z, rb: qp_data.build_qp(track, z, rb, params, u0, 0.01)))
    t = timeit(bq_fn, z0_b, rb_b)
    print(f"build_qp:              {t * 1e3:8.2f} ms  ({t / batch * 1e6:7.1f} us/scenario)")
    p_b, q_b, a_b, l_b, u_b, obj_b, c_b = bq_fn(z0_b, rb_b)

    # --- QP solve per backend
    for be in (["xla", "pallas"] if jax.default_backend() == "tpu" else ["xla"]):
        qp_fn = jax.jit(jax.vmap(partial(
            qp_admm.solve_qp, max_iter=200, check_every=25, backend=be)))
        t = timeit(qp_fn, p_b, q_b, a_b, l_b - c_b, u_b - c_b)
        sol = qp_fn(p_b, q_b, a_b, l_b - c_b, u_b - c_b)
        print(f"solve_qp[{be:>6}]:      {t * 1e3:8.2f} ms  "
              f"({t / batch * 1e6:7.1f} us/scenario)  mean_iters="
              f"{float(jnp.mean(sol.iters)):.0f}")

    # --- structured Riccati/IPM QP solve
    from mpcc_manipulator_tpu.ocp import qp_stages
    from mpcc_manipulator_tpu.solver import qp_ipm
    rb_list = rd_fn(qs_b)
    st_fn = jax.jit(jax.vmap(
        lambda z, rbk: qp_stages.build_qp_stages(track, z, rbk, params, u0, 0.01)))
    t = timeit(st_fn, z0_b, rb_b)
    print(f"build_qp_stages:       {t * 1e3:8.2f} ms  ({t / batch * 1e6:7.1f} us/scenario)")
    qp_st = st_fn(z0_b, rb_b)
    ipm_fn = jax.jit(jax.vmap(partial(qp_ipm.solve_qp_ipm, max_iter=25)))
    t = timeit(ipm_fn, qp_st)
    sol = ipm_fn(qp_st)
    import jax.numpy as jnp2
    print(f"solve_qp[riccati]:     {t * 1e3:8.2f} ms  "
          f"({t / batch * 1e6:7.1f} us/scenario)  mean_iters="
          f"{float(jnp.mean(sol.iters)):.1f}")

    # --- full tick
    from mpcc_manipulator_tpu.parallel import sharding as shd
    solver_cfgs = [("admm/xla", SQPConfig(max_iter=20, qp_max_iter=200)),
                   ("riccati", SQPConfig(max_iter=20, qp_solver="riccati"))]
    if jax.default_backend() == "tpu":
        solver_cfgs.append(("admm/pallas", SQPConfig(max_iter=20, qp_max_iter=200,
                                                     qp_backend="pallas")))
    for name, cfg in solver_cfgs:
        mesh = shd.make_mesh()
        step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
        carry_b = shd.batch_init_carry(batch, dtype)
        u0_b = jnp.zeros((batch, 8), dtype=dtype)
        obs_b = jnp.tile(obs[None, :], (batch, 1))
        rad_b = jnp.zeros(batch, dtype=dtype)
        args = (shd.replicate(track, mesh), shd.replicate(params, mesh),
                shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh),
                *shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh))
        t = timeit(lambda *a: step(*a), *args, reps=3)
        print(f"mpc_step[{name:>11}]: {t * 1e3:8.2f} ms  "
              f"({t / batch * 1e6:7.1f} us/scenario -> "
              f"{batch / t:7.1f} solves/s)")


if __name__ == "__main__":
    main()
