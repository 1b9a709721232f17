"""Husky+Panda 10-DOF mobile MPCC (BASELINE configs 4-5).

The reference defines this platform but never activates it (`setHusky`,
`robot_model.cpp:321-352`); there is therefore no conformance oracle — these
tests validate the mobile system the same way the reference validates the
Panda (SURVEY.md §4): linearization checks against finite differences,
structural QP properties, and closed-loop progress, plus the batched/sharded
scenario axis of config 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics_mobile as kinm
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.ocp.cost import stage_cost
from mpcc_manipulator_tpu.ocp.constraints import stage_constraints
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data, index_robot_data
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.parallel import sharding as shd
from mpcc_manipulator_tpu.splines import arc_length as als
from mpcc_manipulator_tpu.system import HUSKY_PANDA as SYS

TS = 0.01
CFG = SQPConfig(max_iter=25, qp_solver="riccati", ipm_max_iter=30, mani_grad="ad")

X0 = np.array([0.0, 0.0, 0.0,
               0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4,
               0.0, 0.0])


@pytest.fixture(scope="module")
def setup():
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    params, _ = load_params(system=SYS)
    x0 = jnp.asarray(X0)
    ee = np.asarray(kinm.ee_position(x0[:SYS.dof]))
    nt = 80
    phi = np.linspace(0, 2 * np.pi, nt)
    # long track: forces base translation (beyond arm reach)
    track = als.gen_6d_spline(
        np.linspace(0, 1.2, nt) + ee[0],
        0.10 * np.cos(phi) - 0.10 + ee[1],
        0.10 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kinm.ee_orientation(x0[:SYS.dof])), (nt, 1, 1)))
    return sel_nn, env_nn, params, track, x0, ee


def test_mobile_dims():
    assert SYS.nx == 12 and SYS.nu == 11 and SYS.dof == 10
    assert SYS.n_var == 12 * 11 + 11 * 10 == 242
    assert SYS.nc_stage == 2 * 12 + 2 * 11 + 2 * 10 + 11 == 77


def test_robot_data_env_jacobian_vs_fd(setup):
    """Env-collision distance Jacobian (incl. the base-frame obstacle chain
    rule) against central finite differences of the composed function."""
    sel_nn, env_nn, params, track, x0, ee = setup
    obs = jnp.asarray([ee[0] + 0.4, ee[1], ee[2]])
    q_m = jnp.asarray(X0[:SYS.dof]).at[2].set(0.3)  # nonzero yaw
    rb = compute_robot_data(q_m[None, :], obs, 0.05, sel_nn, env_nn,
                            system=SYS)
    d_env = np.asarray(rb.d_env_dist[0])            # (9, 10)

    def env_dist(qm):
        r = compute_robot_data(qm[None, :], obs, 0.05, sel_nn, env_nn,
                               system=SYS)
        return np.asarray(r.env_dist[0])

    eps = 1e-5
    for j in range(SYS.dof):
        dq = np.zeros(SYS.dof)
        dq[j] = eps
        fd = (env_dist(q_m + dq) - env_dist(q_m - dq)) / (2 * eps)
        np.testing.assert_allclose(d_env[:, j], fd, rtol=1e-4, atol=1e-5)


def test_mobile_cost_linearization(setup):
    """Cost linearization check, reference convention (`cost_test.h:104-185`):
    the quadratic model around (x, u) — with RobotData recomputed at the
    perturbed joints — predicts the cost at (x+0.01, u+0.01) within a few
    percent, for the 12-dim mobile state."""
    sel_nn, env_nn, params, track, x0, ee = setup
    obs = jnp.asarray([3.0, 3.0, 3.0])

    def rb_at(q):
        rb = compute_robot_data(q[None, :], obs, 0.0, sel_nn, env_nn,
                                system=SYS)
        return index_robot_data(rb, 0)

    rng = np.random.default_rng(3)
    n_ok = 0
    for _ in range(5):
        x = jnp.asarray(X0 + 0.05 * rng.standard_normal(SYS.nx))
        x = x.at[SYS.s_idx].set(rng.uniform(0.1, 0.9))
        u = jnp.asarray(0.1 * rng.standard_normal(SYS.nu))
        dx = jnp.full(SYS.nx, 0.01)
        du = jnp.full(SYS.nu, 0.01)
        rb0 = rb_at(x[:SYS.dof])
        rb1 = rb_at((x + dx)[:SYS.dof])
        obj, f_x, f_u, f_xx, f_uu, f_xu = stage_cost(
            track, x, u, rb0, jnp.asarray(False), params, system=SYS)
        obj1 = stage_cost(track, x + dx, u + du, rb1, jnp.asarray(False),
                          params, with_derivatives=False, system=SYS)
        lin = (float(obj) + float(f_x @ dx) + float(f_u @ du)
               + 0.5 * float(dx @ f_xx @ dx) + 0.5 * float(du @ f_uu @ du)
               + float(dx @ f_xu @ du))
        rel = abs((float(obj1) - lin) / float(obj1))
        n_ok += rel <= 2e-2
        # Gauss-Newton Hessian must be symmetric PSD at every draw
        hxx = np.asarray(f_xx)
        assert np.allclose(hxx, hxx.T, atol=1e-10)
        assert np.linalg.eigvalsh(hxx).min() > 0
    assert n_ok >= 4  # reference uses one random draw; allow one outlier


def test_mobile_closed_loop_full_stack(setup):
    """Config 4: full cost/constraint stack incl. env-collision obstacle.
    The loop must solve every tick, ramp vs, advance s, and move the base."""
    sel_nn, env_nn, params, track, x0, ee = setup
    carry = init_carry(x0.dtype, SYS)
    x, u = x0, jnp.zeros(SYS.nu, dtype=x0.dtype)
    obs = jnp.asarray([ee[0] + 0.55, ee[1] - 0.25, ee[2]])  # near, off-path
    for i in range(40):
        carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                              obs, 0.05, ts=TS, cfg=CFG, system=SYS)
        assert bool(out.ok), (i, int(out.status))
        u = out.u0
        x = dyn.sim_time_step(out.x0_updated, u, TS)
    assert float(x[SYS.s_idx]) > 0.04          # solid forward progress
    assert float(x[SYS.vs_idx]) > 0.15         # vs ramped toward v_des=0.2
    assert float(x[0]) > 0.02                  # base actually translated
    # bounds respected
    b = np.asarray(x)[:SYS.dof]
    params_b = params.bounds
    assert np.all(b >= np.asarray(params_b.x_l)[:SYS.dof] - 1e-9)
    assert np.all(b <= np.asarray(params_b.x_u)[:SYS.dof] + 1e-9)


def test_mobile_batched_sharded(setup):
    """Config 5 (scaled down): batched perturbed scenarios sharded over the
    8-device CPU mesh; every lane must solve and progress independently."""
    sel_nn, env_nn, params, track, x0, ee = setup
    batch = 16
    mesh = shd.make_mesh()
    rng = np.random.default_rng(0)
    x_b = jnp.asarray(X0[None, :] + 0.02 * rng.standard_normal((batch, SYS.nx)))
    x_b = x_b.at[:, SYS.s_idx].set(0.0).at[:, SYS.vs_idx].set(0.0)
    u_b = jnp.zeros((batch, SYS.nu))
    obs_b = jnp.tile(jnp.asarray([3.0, 3.0, 3.0])[None, :], (batch, 1))
    rad_b = jnp.zeros(batch)
    carry_b = shd.batch_init_carry(batch, x_b.dtype, SYS)

    step = shd.make_sharded_step(mesh, ts=TS, cfg=CFG, system=SYS)
    args = shd.shard_batch((carry_b, x_b, u_b, obs_b, rad_b), mesh)
    tr = shd.replicate(track, mesh)
    pr = shd.replicate(params, mesh)
    sn = shd.replicate(sel_nn, mesh)
    en = shd.replicate(env_nn, mesh)

    carry_s, x_s, u_s, obs_s, rad_s = args
    for _ in range(8):
        carry_s, out = step(tr, pr, sn, en, carry_s, x_s, u_s, obs_s, rad_s)
        u_s = out.u0
        x_s = jax.vmap(lambda x, u: dyn.sim_time_step(x, u, TS))(
            out.x0_updated, u_s)
    ok = np.asarray(out.ok)
    assert ok.all(), np.asarray(out.status)
    s_vals = np.asarray(x_s[:, SYS.s_idx])
    # lanes whose perturbed EE starts behind the track project to s=0 and
    # take a few extra ticks to begin progressing — allow boundary roundoff
    assert (s_vals > -1e-6).all()
    assert s_vals.mean() > 1e-3 and (s_vals > 1e-4).sum() >= batch // 2
    # lanes were genuinely different scenarios
    assert np.std(np.asarray(x_s[:, 0])) > 0
