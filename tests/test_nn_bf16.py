"""bf16 collision-NN GEMMs (``SQPConfig.nn_bf16``): conformance A/B gate.

The collision-NN linearizations are the tick's MXU GEMMs (~0.4 ms at batch
1024); ``nn_mm_dtype="bfloat16"`` runs them in bf16 with f32 accumulation.
Measured drift vs the f32 path (r5, pinned here):

  * raw outputs: distance values max ~0.44 cm (rms 0.10) on 8-11 cm
    margins; Jacobian entries drift up to ~100% relative worst-case (the
    reverse-accumulated chain through four 256-wide layers compounds
    bf16's 8-bit mantissa);
  * closed loop WITHOUT active obstacle rows: worst_q 5.7e-5 rad over 30
    ticks — an order below the oracle conformance bound (7.5e-4).  The NN
    rows are soft RBF penalties; away from activation their Jacobian noise
    never reaches the step;
  * WITH an active obstacle (static margin scenario): the margin contract
    must still hold — asserted below.

Default decision: ``nn_bf16 = False`` (see params.py) — the measured
throughput win on the real chip is small next to the Jacobian noise risk
near active constraints; the option + this gate exist so the trade-off is
a measured switch, not a guess.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.mpc import mpc_step
from mpcc_manipulator_tpu.params import SQPConfig

DT = jnp.float32


def test_bf16_forward_value_drift_bounded():
    """Distance VALUES stay within a few mm of f32 — the scale that the
    RBF margins (cm) can absorb."""
    sel = cnn.load_self_collision_nn(dtype=DT)
    env = cnn.load_env_collision_nn(dtype=DT)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (256, 7)), dtype=DT)
    ob = jnp.asarray(rng.uniform(-0.5, 0.5, (256, 3))
                     + np.array([0.4, 0.0, 0.4]), dtype=DT)

    s32 = jax.vmap(lambda qq: cnn.mlp_forward_jacobian(sel, qq))(q)
    s16 = jax.vmap(lambda qq: cnn.mlp_forward_jacobian(
        sel, qq, mm_dtype="bfloat16"))(q)
    assert float(jnp.max(jnp.abs(s32[0] - s16[0]))) < 0.7   # cm

    ein = jnp.concatenate([q, ob], axis=1)
    e32 = jax.vmap(lambda xx: cnn.mlp_forward_jacobian(env, xx))(ein)
    e16 = jax.vmap(lambda xx: cnn.mlp_forward_jacobian(
        env, xx, mm_dtype="bfloat16"))(ein)
    assert float(jnp.max(jnp.abs(e32[0] - e16[0]))) < 1.5   # cm
    # Jacobians drift much harder (measured max ~24 on scale ~19) — pin
    # only that they stay finite and same-order; the behavioral gates
    # below are the real contract
    assert np.isfinite(np.asarray(e16[1])).all()
    assert float(jnp.max(jnp.abs(e16[1]))) < 10.0 * float(
        jnp.max(jnp.abs(e32[1])))


def test_bf16_closed_loop_drift_below_conformance_bound():
    """A/B closed loop (no active obstacle): bf16 NN GEMMs must stay an
    order below the oracle conformance envelope (worst_q bound 7.5e-4;
    measured 5.7e-5)."""
    from __graft_entry__ import _build_problem
    track, params, _, sel_nn, env_nn, carry0, x0, u0, obs = _build_problem(
        DT, small=False)
    base = SQPConfig(max_iter=10, qp_solver="riccati", ipm_max_iter=20)
    out_states = {}
    for name, cfg in [("f32", base),
                      ("bf16", dataclasses.replace(base, nn_bf16=True))]:
        carry, x, u = carry0, x0, u0
        xs = []
        for t in range(30):
            carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                                  obs, jnp.asarray(0.0, DT), ts=0.01, cfg=cfg)
            assert bool(out.ok), (name, t)
            u = out.u0
            x = dyn.sim_time_step(out.x0_updated, u, 0.01)
            xs.append(np.asarray(x))
        out_states[name] = np.stack(xs)
    d = np.abs(out_states["f32"] - out_states["bf16"])
    assert float(d[:, :7].max()) < 2e-4, d[:, :7].max()


@pytest.mark.slow
def test_bf16_obstacle_margin_still_held():
    """With an ACTIVE obstacle, the bf16 path must still hold the RBF
    margin every tick (the static scenario of test_obstacle_avoidance,
    driven with nn_bf16=True)."""
    from tests.test_obstacle_avoidance import (
        EPS_CM, MARGIN, OBS_R, _run_logged)
    import tests.test_obstacle_avoidance as toa
    from mpcc_manipulator_tpu.models import kinematics as kin
    from mpcc_manipulator_tpu.splines import arc_length as als

    # rebuild the fixture contents directly (module fixture not shared)
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4,
                      0., 0.])
    ee = np.asarray(kin.ee_position(x0[:7]))
    nt = 80
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.12 * np.cos(phi) - 0.12 + ee[1],
        0.12 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:7])), (nt, 1, 1)))
    base = (sel_nn, env_nn, track, x0)

    L = float(track.length)
    s_obs = 0.5 * L
    obs = (np.asarray(als.track_position(track, s_obs))
           + np.asarray([0.06, 0.0, 0.0]))

    old_cfg = toa.CFG
    toa.CFG = dataclasses.replace(old_cfg, nn_bf16=True)
    try:
        env_min, sel_min, s_log, cbf_res = _run_logged(
            base, {"param": {"desired_ee_velocity": 0.25}}, 300,
            lambda t: obs, OBS_R)
    finally:
        toa.CFG = old_cfg
    assert env_min.min() >= MARGIN - EPS_CM, env_min.min()
    assert s_log[-1] > 0.2 * L
    assert sel_min.min() >= 1.0
