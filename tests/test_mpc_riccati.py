"""End-to-end MPC with the structured Riccati/IPM backend: trajectory
agreement with the ADMM backend over a short closed loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import NU, PANDA_DOF, StateIndex
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01


@pytest.fixture(scope="module")
def problem():
    params, _ = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 80
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)))
    return params, sel_nn, env_nn, track, x0


def _run(problem, cfg, n_steps=20):
    params, sel_nn, env_nn, track, x0 = problem
    carry = init_carry(x0.dtype)
    x, u = x0, jnp.zeros(NU, dtype=x0.dtype)
    obs = jnp.asarray([3.0, 3.0, 3.0], dtype=x0.dtype)
    traj = []
    for _ in range(n_steps):
        carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u, obs,
                              0.0, ts=TS, cfg=cfg)
        assert bool(out.ok), int(out.status)
        u = out.u0
        x = dyn.sim_time_step(out.x0_updated, u, TS)
        traj.append(np.asarray(x))
    return np.stack(traj)


def test_riccati_backend_closed_loop(problem):
    cfg = SQPConfig(max_iter=20, qp_solver="riccati", ipm_max_iter=25)
    traj = _run(problem, cfg)
    s = traj[:, StateIndex.s]
    assert s[-1] > 0.01
    assert all(b >= a - 1e-9 for a, b in zip(s, s[1:]))


def test_riccati_matches_admm_trajectory(problem):
    cfg_a = SQPConfig(max_iter=20, qp_max_iter=2000, qp_check_every=50)
    cfg_r = SQPConfig(max_iter=20, qp_solver="riccati", ipm_max_iter=30)
    traj_a = _run(problem, cfg_a, n_steps=15)
    traj_r = _run(problem, cfg_r, n_steps=15)
    # Joint trajectories drift in the 7-DOF task null-space under different
    # QP tolerances (closed-loop amplification); what must agree is the
    # task-space behavior: path progress and EE tracking.
    params, sel_nn, env_nn, track, x0 = problem
    s_err = np.abs(traj_a[:, StateIndex.s] - traj_r[:, StateIndex.s]).max()
    assert s_err < 1e-3, s_err
    ee_a = np.stack([np.asarray(kin.ee_position(jnp.asarray(x[:PANDA_DOF])))
                     for x in traj_a])
    ee_r = np.stack([np.asarray(kin.ee_position(jnp.asarray(x[:PANDA_DOF])))
                     for x in traj_r])
    assert np.abs(ee_a - ee_r).max() < 2e-3
    # joint-space agreement is loose but bounded
    assert np.abs(traj_a - traj_r).max() < 0.05
