"""OCP-layer tests mirroring the reference gtest suites (`cost_test.h`,
`constraints_test.h`): Hessian structure, cost/constraint linearization
accuracy, RBF properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import NPC, NU, NX, PANDA_DOF
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.ocp import constraints as con
from mpcc_manipulator_tpu.ocp import cost as cost_mod
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data, index_robot_data
from mpcc_manipulator_tpu.params import load_params
from mpcc_manipulator_tpu.splines import arc_length as als


@pytest.fixture(scope="module")
def setup():
    params, cfg = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    # genRoundTrack fixture (constraints_test.h:31-59): radius-0.2 circle in
    # the Y-Z plane, constant flipped orientation
    nt = 100
    phi = np.linspace(0, 2 * np.pi, nt)
    x = np.zeros(nt)
    y = 0.2 * np.cos(phi)
    z = 0.2 * np.sin(phi)
    rots = np.tile(np.diag([1.0, -1.0, -1.0]), (nt, 1, 1))
    track = als.gen_6d_spline(x, y, z, rots)
    return params, cfg, sel_nn, env_nn, track


def _random_xu(rng, params):
    x_l, x_u = np.asarray(params.bounds.x_l), np.asarray(params.bounds.x_u)
    u_l, u_u = np.asarray(params.bounds.u_l), np.asarray(params.bounds.u_u)
    x = rng.uniform(0, 1, NX) * (x_u - x_l) + x_l
    x[7] = min(x[7], 1.0)  # keep s on the round track
    u = rng.uniform(0, 1, NU) * (u_u - u_l) + u_l
    return jnp.asarray(x), jnp.asarray(u)


def _rb_at(q, sel_nn, env_nn):
    obs = jnp.asarray([3.0, 3.0, 3.0], dtype=q.dtype)
    rb = compute_robot_data(q[None, :], obs, 0.0, sel_nn, env_nn)
    return index_robot_data(rb, 0)


def test_cost_hessian_spd(setup):
    # `cost_test.h:27-102`: Gauss-Newton Hessians symmetric positive definite
    params, _, sel_nn, env_nn, track = setup
    rng = np.random.default_rng(0)
    for _ in range(5):
        x, u = _random_xu(rng, params)
        rb = _rb_at(x[:PANDA_DOF], sel_nn, env_nn)
        _, _, _, f_xx, f_uu, _ = cost_mod.stage_cost(
            track, x, u, rb, jnp.asarray(False), params)
        f_xx, f_uu = np.asarray(f_xx), np.asarray(f_uu)
        assert np.allclose(f_xx, f_xx.T, atol=1e-10)
        assert np.allclose(f_uu, f_uu.T, atol=1e-10)
        assert np.linalg.eigvalsh(f_xx).min() > 0
        assert np.linalg.eigvalsh(f_uu).min() > 0


def test_cost_linearization(setup):
    # `cost_test.h:103-185`: quadratic model predicts the cost at
    # (x+0.01, u+0.01) — with RobotData updated at the perturbed point —
    # within 1% relative error
    params, _, sel_nn, env_nn, track = setup
    rng = np.random.default_rng(3)
    n_ok = 0
    for _ in range(5):
        x, u = _random_xu(rng, params)
        dx = jnp.full(NX, 0.01)
        du = jnp.full(NU, 0.01)
        rb0 = _rb_at(x[:PANDA_DOF], sel_nn, env_nn)
        rb1 = _rb_at((x + dx)[:PANDA_DOF], sel_nn, env_nn)
        obj, f_x, f_u, f_xx, f_uu, f_xu = cost_mod.stage_cost(
            track, x, u, rb0, jnp.asarray(False), params)
        obj1 = cost_mod.stage_cost(track, x + dx, u + du, rb1,
                                   jnp.asarray(False), params,
                                   with_derivatives=False)
        lin = (float(obj) + float(f_x @ dx) + float(f_u @ du)
               + 0.5 * float(dx @ f_xx @ dx) + 0.5 * float(du @ f_uu @ du)
               + float(dx @ f_xu @ du))
        rel = abs((float(obj1) - lin) / float(obj1))
        n_ok += rel <= 1e-2
    assert n_ok >= 4  # reference uses one random draw; allow one outlier


def test_rbf_properties():
    # RBF is C1 at the switching point and matches -log(h+1) above it
    delta = con.RBF_DELTA
    hs = jnp.linspace(-0.9, 2.0, 200)
    vals = con.rbf(hs)
    ders = con.drbf(hs)
    above = hs >= delta
    assert np.allclose(np.asarray(vals)[np.asarray(above)],
                       -np.log(np.asarray(hs)[np.asarray(above)] + 1))
    # C1 continuity at delta
    eps = 1e-7
    assert abs(float(con.rbf(delta + eps)) - float(con.rbf(delta - eps))) < 1e-5
    assert abs(float(con.drbf(delta + eps)) - float(con.drbf(delta - eps))) < 1e-5
    # derivative matches FD
    fd = (np.asarray(con.rbf(hs + 1e-6)) - np.asarray(con.rbf(hs - 1e-6))) / 2e-6
    assert np.allclose(fd, ders, atol=1e-5)


def test_selfcollision_constraint_linearization(setup):
    # `constraints_test.h:61-141`: perturb (x, u) by 0.01; the linearized
    # constraint row predicts the true value within 5%
    params, _, sel_nn, env_nn, track = setup
    rng = np.random.default_rng(7)
    n_ok = 0
    for _ in range(5):
        x, u = _random_xu(rng, params)
        dx = jnp.full(NX, 0.01)
        du = jnp.full(NU, 0.01)
        rb0 = _rb_at(x[:PANDA_DOF], sel_nn, env_nn)
        rb1 = _rb_at((x + dx)[:PANDA_DOF], sel_nn, env_nn)
        c0, _, _, c_x, c_u = con.stage_constraints(
            x, u, rb0, jnp.asarray(False), params)
        c1, _, _ = con.stage_constraints(x + dx, u + du, rb1,
                                         jnp.asarray(False), params,
                                         with_jacobian=False)
        for row in range(2):  # selcol + singularity rows
            lin = float(c0[row]) + float(c_x[row] @ dx) + float(c_u[row] @ du)
            true = float(c1[row])
            # relative criterion like the reference for well-scaled values;
            # absolute fallback near zero crossings (the NN has ReLU kinks and
            # the RBF log curvature makes small values relatively noisy)
            rel_ok = abs(true) > 1e-8 and abs((true - lin) / true) <= 0.05
            abs_ok = abs(true - lin) <= 0.015
            n_ok += rel_ok or abs_ok
    assert n_ok >= 8  # 10 checks, allow occasional kink-crossing outliers


def test_terminal_knot_rows_zero(setup):
    params, _, sel_nn, env_nn, track = setup
    rng = np.random.default_rng(11)
    x, u = _random_xu(rng, params)
    rb = _rb_at(x[:PANDA_DOF], sel_nn, env_nn)
    c, c_l, c_u, c_x, c_uj = con.stage_constraints(
        x, u, rb, jnp.asarray(True), params)
    assert np.allclose(c, 0) and np.allclose(c_l, 0) and np.allclose(c_u, 0)
    assert np.allclose(c_x, 0) and np.allclose(c_uj, 0)


def test_weight_scheduling_blend(setup):
    params, _, sel_nn, env_nn, track = setup
    # far from collision/singularity -> nominal weights
    rb_far = _rb_at(jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4]),
                    sel_nn, env_nn)
    q_c, q_l, q_ori = cost_mod.scheduled_weights(params, rb_far)
    ratio = min(float(rb_far.sel_dist) / (2 * float(params.model.tol_selcol)),
                float(rb_far.manipul) / (2 * float(params.model.tol_sing)))
    if ratio > 1.0:
        assert float(q_c) == float(params.cost.q_c)
