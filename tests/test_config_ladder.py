"""BASELINE config ladder: the feature stack enabled incrementally.

Mirrors BASELINE.json's config progression:
  1. contouring+lag+regularization, box bounds only
  2. + orientation cost + singularity handling
  3. + self-collision NN constraint
  4. full stack + env-collision (moving obstacle)
Each rung runs a short closed loop and must solve and make progress.
Feature toggles go through the runtime parameter system (no recompilation).
"""

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
CFG = SQPConfig(max_iter=20, qp_solver="riccati", ipm_max_iter=25)


@pytest.fixture(scope="module")
def base():
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 80
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.12 * np.cos(phi) - 0.12 + ee[1],
        0.12 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)))
    return sel_nn, env_nn, track, x0


def _run(base, overrides, n_steps=12, obs_pos=(3.0, 3.0, 3.0), obs_r=0.0):
    sel_nn, env_nn, track, x0 = base
    params, _ = load_params(overrides=overrides)
    carry = init_carry(x0.dtype)
    x, u = x0, jnp.zeros(NU, dtype=x0.dtype)
    obs = jnp.asarray(obs_pos, dtype=x0.dtype)
    for _ in range(n_steps):
        carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u, obs,
                              obs_r, ts=TS, cfg=CFG)
        assert bool(out.ok), int(out.status)
        u = out.u0
        x = dyn.sim_time_step(out.x0_updated, u, TS)
    return np.asarray(x)


def test_config1_box_only(base):
    # contouring/lag/regularization only: orientation and singularity terms
    # zeroed through the runtime override path
    x = _run(base, {"cost": {"qOri": 0.0, "qSing": 0.0}})
    assert x[StateIndex.s] > 0.005


def test_config2_orientation_singularity(base):
    x = _run(base, {"cost": {"qOri": 50.0, "qSing": 1.0}})
    assert x[StateIndex.s] > 0.005


def test_config3_self_collision(base):
    # tighter self-collision tolerance makes the NN constraint bind harder
    x = _run(base, {"param": {"tol_selcol": 2.0}})
    assert x[StateIndex.s] > 0.005


def test_config4_full_stack_with_obstacle(base):
    sel_nn, env_nn, track, x0 = base
    # obstacle near the path midpoint
    mid = np.asarray(als.track_position(track, track.length * 0.5))
    x = _run(base, {"param": {"tol_envcol": 8.0}}, obs_pos=tuple(mid),
             obs_r=0.05)
    assert x[StateIndex.s] > 0.003


def test_runtime_param_override_changes_behavior(base):
    # the same jitted step under different traced params (no recompilation):
    # a much higher desired velocity must produce faster progress
    x_slow = _run(base, {"param": {"desired_ee_velocity": 0.05}})
    x_fast = _run(base, {"param": {"desired_ee_velocity": 0.4}})
    assert x_fast[StateIndex.s] > x_slow[StateIndex.s] * 1.5
