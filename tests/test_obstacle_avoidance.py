"""Env-collision constraint efficacy: the controller must AVOID, not just run.

VERDICT r3: the config-ladder obstacle test asserted only progress, so a
silently inert env-collision constraint would pass.  These tests exercise
the reference's flagship obstacle scenario
(`/root/reference/python/main_w_sim.py:41-46, 125-133`) and assert the
constraint's ACTUAL contract — the RBF rows are discrete control barrier
functions (`constraints.cpp:139-176`):

    c_env = -d_env . dq + RBF(h) <= 0      with h = (d - 1.2 r - tol)/100

i.e. the robot's own approach rate toward the obstacle is bounded by the
barrier value.  Per tick that means the ROBOT may never decrease any
link's barrier h faster than ``ts * RBF(h)``; when the margin erodes it
can only be because the OBSTACLE closed in.  The per-tick residual

    r_l(t) = h_l(x_{t+1}, o_t) - h_l(x_t, o_t) - ts * RBF(h_l(x_t, o_t))

isolates robot motion (same obstacle position on both ends) and must stay
>= -CBF_EPS for every link at every tick.  Measured (round 5): worst
residual -0.010 cm across the static, detour, and oscillating scenarios —
vs the oscillating sphere's own 0.075 cm/tick closure and -0.24 cm/tick
when the constraint is disabled, so the bound has a decade of bite on
each side.

Scenarios:
  static sphere blocking the path: advance to the margin and hold (an
    N=10 x 10 ms horizon cannot plan a detour around a path-blocking
    obstacle; stopping is the correct local-MPC outcome), margin + CBF
    residual asserted every tick, and the same run with the constraint
    disabled drives through the sphere (the assertions bite);
  static sphere OFF the path (feasible detour): margin held every tick
    with the constraint ACTIVE (env_min touches the margin) while s
    passes the obstacle — avoidance WITH progress;
  oscillating sphere crossing the path: the robot passes through a clear
    window; margin erosion happens only at the obstacle's closing rate
    (CBF residual), never by robot motion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import NU, PANDA_DOF, StateIndex
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.ocp.constraints import rbf
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01
CFG = SQPConfig(max_iter=20, qp_solver="riccati", ipm_max_iter=25)
TOL_ENV = 8.0     # cm (assets/params/model.json: tol_envcol)
TOL_SEL = 1.0     # cm (tol_selcol)
# The workspace is tight: at the home pose the nearest arm link is only
# ~17 cm from points near the 0.12 m demo circle, so the reference demo's
# 5 cm sphere (margin 8 + 1.2*5 = 14 cm) would envelop the start pose.
# A 3 cm sphere (margin 11.6 cm) keeps the geometry feasible while
# exercising identical constraint machinery.
OBS_R = 3.0       # cm
MARGIN = TOL_ENV + 1.2 * OBS_R   # cm — the constraint's own margin
# soft-constraint slack: the RBF rows are penalties, not hard constraints,
# so sub-margin excursions of a few mm are within contract
EPS_CM = 1.0
# per-tick CBF residual floor, cm of barrier h per tick: worst measured
# robot-caused erosion is -0.010; the oscillating obstacle closes at
# 0.075/tick and the constraint-disabled run erodes at -0.244/tick
CBF_EPS_CM = 0.05


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


@jax.jit
def _h_dists(q, obs, r, tol_env, sel_nn, env_nn):
    """Per-link barrier h (m, the constraint's own units) + min distances."""
    rb = compute_robot_data(q[None, :], obs, r, sel_nn, env_nn,
                            mani_grad="ad")
    h = 0.01 * (rb.env_dist[0] - 1.2 * r) - 0.01 * tol_env
    return h, jnp.min(rb.env_dist[0]), rb.sel_dist[0]


def _run_logged(base, overrides, n_steps, obs_path, obs_r, tol_env=TOL_ENV):
    """Closed loop with per-tick (min env dist, self dist, s, CBF residual).

    ``obs_path(t) -> np.ndarray(3)`` gives the obstacle position at tick t
    (the solver sees the CURRENT position each tick, like the reference
    driver re-publishing the moving sphere).  The CBF residual of tick t is
    the robot-caused barrier change minus the allowance ``ts*RBF(h)``,
    minimized over links — obstacle position held fixed across the tick so
    obstacle motion never enters."""
    sel_nn, env_nn, track, x0 = base
    params, _ = load_params(overrides=overrides)
    carry = init_carry(x0.dtype)
    x, u = x0, jnp.zeros(NU, dtype=x0.dtype)
    r = jnp.asarray(obs_r, x0.dtype)
    te = jnp.asarray(tol_env, x0.dtype)
    env_min, sel_min, s_log, cbf_res = [], [], [], []
    for t in range(n_steps):
        obs = jnp.asarray(obs_path(t), dtype=x0.dtype)
        h_pre, _, _ = _h_dists(x[:PANDA_DOF], obs, r, te, sel_nn, env_nn)
        carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u, obs,
                              obs_r, ts=TS, cfg=CFG)
        assert bool(out.ok), int(out.status)
        u = out.u0
        x = dyn.sim_time_step(out.x0_updated, u, TS)
        h_post, e, s = _h_dists(x[:PANDA_DOF], obs, r, te, sel_nn, env_nn)
        env_min.append(float(e))
        sel_min.append(float(s))
        s_log.append(float(x[StateIndex.s]))
        cbf_res.append(float(jnp.min(h_post - h_pre - TS * rbf(h_pre))))
    return (np.asarray(env_min), np.asarray(sel_min), np.asarray(s_log),
            np.asarray(cbf_res))


def _assert_cbf_contract(cbf_res, warmup: int = 5):
    """Robot motion never erodes any link's barrier faster than the RBF
    rate bound (in cm of h; the first ticks carry cold-warm-start noise)."""
    worst = 100.0 * cbf_res[warmup:].min()
    assert worst >= -CBF_EPS_CM, f"CBF rate bound violated: {worst:.4f} cm"


def test_static_obstacle_margin_held_and_constraint_bites(base):
    _, _, track, _ = base
    L = float(track.length)
    s_obs = 0.5 * L
    # 6 cm out of the track plane: the in-plane path passes 6 cm from the
    # center — the 11.6 cm margin is violated by >5 cm on a straight drive
    obs = (np.asarray(als.track_position(track, s_obs))
           + np.asarray([0.06, 0.0, 0.0]))
    n = 300

    # (a) constrained: advances toward the sphere, then HOLDS the margin
    # (measured r4: env_min converges to ~11.75 cm vs margin 11.6)
    env_min, sel_min, s_log, cbf_res = _run_logged(
        base, {"param": {"desired_ee_velocity": 0.25}}, n,
        lambda t: obs, OBS_R)
    assert env_min.min() >= MARGIN - EPS_CM, env_min.min()
    _assert_cbf_contract(cbf_res)
    assert s_log[-1] > 0.2 * L                      # real progress happened
    assert s_log[-1] < s_obs                        # stopped short, safely
    # (c) self-collision margin holds throughout
    assert sel_min.min() >= TOL_SEL, sel_min.min()

    # (b) the test bites: constraint disabled -> drives through the sphere,
    # eroding the barrier by robot motion alone far beyond the CBF bound
    env_min_off, _, s_off, cbf_off = _run_logged(
        base, {"param": {"desired_ee_velocity": 0.25, "tol_envcol": -1e3}},
        n, lambda t: obs, OBS_R)
    assert s_off[-1] > s_obs + 0.02, (s_off[-1], s_obs)   # passed it
    assert env_min_off.min() < MARGIN - 3.0, env_min_off.min()


@pytest.mark.slow
def test_static_detour_obstacle_avoided_with_progress(base):
    """Feasible-bypass geometry: a 2 cm sphere 8 cm out-of-plane from the
    s_obs track point, margin reduced to 6.4 cm via the tol_envcol runtime
    override (the documented path, as the oscillating test).  The closest
    arm link's unconstrained dip is 4.7 cm (measured, constraint-disabled),
    so avoidance requires an actual detour — and here, unlike the
    path-blocking static case, one exists: the controller must hold the
    margin on EVERY tick with the constraint ACTIVE and still drive s past
    the obstacle."""
    _, _, track, _ = base
    L = float(track.length)
    s_obs = 0.5 * L
    obs_r, tol_env = 2.0, 4.0
    margin = tol_env + 1.2 * obs_r                 # 6.4 cm
    obs = (np.asarray(als.track_position(track, s_obs))
           + np.asarray([0.08, 0.0, 0.0]))

    env_min, sel_min, s_log, cbf_res = _run_logged(
        base, {"param": {"desired_ee_velocity": 0.4, "tol_envcol": tol_env}},
        900, lambda t: obs, obs_r, tol_env=tol_env)
    assert env_min.min() >= margin - EPS_CM, env_min.min()
    _assert_cbf_contract(cbf_res)
    # the constraint was ACTIVE, not bypassed at a distance (measured:
    # env_min rides the margin, 6.40 cm)
    assert env_min.min() <= margin + 1.0, env_min.min()
    # ... and s still cleared the obstacle: avoidance WITH progress
    assert s_log[-1] > s_obs + 0.02, (s_log[-1], s_obs)
    assert sel_min.min() >= TOL_SEL, sel_min.min()

    # bite: disabled, the same geometry is driven straight through with
    # robot-caused barrier erosion ~5x the CBF bound (measured -0.24 cm)
    env_min_off, _, s_off, cbf_off = _run_logged(
        base, {"param": {"desired_ee_velocity": 0.4, "tol_envcol": -1e3}},
        400, lambda t: obs, obs_r, tol_env=tol_env)
    assert env_min_off.min() < margin - 1.5, env_min_off.min()
    assert 100.0 * cbf_off[5:].min() < -CBF_EPS_CM, cbf_off[5:].min()


@pytest.mark.slow
def test_oscillating_obstacle_passed_with_margin(base):
    """Reference moving-obstacle demo: sphere crossing the path in z
    (`main_w_sim.py:125-130`), solver fed the current position each tick.
    The robot must PASS the crossing point (through a clear window) while
    honoring the CBF rate contract at every tick."""
    _, _, track, _ = base
    L = float(track.length)
    s_obs = 0.5 * L
    center = np.asarray(als.track_position(track, s_obs))
    # The RBF rows are discrete CBFs — HARD rate constraints on the robot's
    # motion toward the obstacle, so a pass window only exists while the
    # sphere is more than the margin away from the crossing point.  A slow
    # sweep (reference sphere speed is 0.05 m/s, `main_w_sim.py:46`) and a
    # reduced tol_envcol (runtime override, the documented path) keep that
    # window wide enough for the robot to traverse it.  Geometry note
    # (measured r4): the sphere must retreat OUT-OF-PLANE in +x (in front
    # of the track plane) — sweeping below the path it passes through
    # mid-arm links that cannot yield, and hovering above it it blocks the
    # wrist, which rides above the flipped-down tool point.
    x_half, speed = 0.15, 0.075             # m, m/s
    step = speed * TS
    tol_env = 4.0                            # cm (override)

    def obs_path(t):
        # triangle wave from +x_half down TO the track point and back out:
        # blocks the crossing around t ~ 200, clears again by t ~ 300
        phase = (step * t) % (4 * x_half)
        dz = phase if phase <= 2 * x_half else 4 * x_half - phase
        return center + np.asarray([abs(x_half - dz), 0.0, 0.0])

    env_min, sel_min, s_log, cbf_res = _run_logged(
        base, {"param": {"desired_ee_velocity": 0.25, "tol_envcol": tol_env}},
        1300, obs_path, OBS_R, tol_env=tol_env)
    # the constraint contract: sub-margin excursions happen ONLY while the
    # SPHERE closes in (its step is 0.075 cm/tick); the ROBOT's own motion
    # never erodes the barrier beyond the RBF allowance (measured worst
    # residual -0.010 cm/tick) — this replaces the r4 no-contact floor,
    # which asserted a consequence, with the constraint's actual invariant
    _assert_cbf_contract(cbf_res)
    # no-contact sanity stays as a physical backstop (measured: 3.60 cm
    # center distance vs the 3 cm radius)
    assert env_min.min() > OBS_R, env_min.min()
    assert s_log[-1] > s_obs + 0.02, (s_log[-1], s_obs)   # actually passed
    assert sel_min.min() >= TOL_SEL, sel_min.min()
