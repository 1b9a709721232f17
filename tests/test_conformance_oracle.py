"""Conformance against the independent numpy oracle (tests/oracle/).

Round-2 verdict: all prior cross-backend checks shared the `ocp/` assembly,
so a shared assembly bug was invisible.  The oracle reimplements the whole
pipeline (kinematics, NNs, cost, constraints, dense QP assembly, a dense
near-exact IPM, the SQP filter loop with the reference's latch, and the MPC
orchestration) in standalone numpy, importing nothing from the production
ocp/models/solver packages.

Two tiers:

1. `test_qp_assembly_matches_oracle` — elementwise agreement of the full
   normalized dense QP (H, g, A, l, u, obj, constr) at several iterates,
   ~1e-8 absolute.  This is the sharp shared-assembly-bug detector.
2. `test_closed_loop_matches_oracle` (slow) — 100 closed-loop ticks on the
   real `assets/tracks/track.json`: per-tick joint/s/vs agreement.  The two
   controllers use *different QP algorithms* (numpy Mehrotra IPM vs the
   structured Riccati IPM), so agreement here bounds the end-to-end effect
   of QP tolerance + SQP early termination (eps_prim = 0.1), not roundoff.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.oracle import nets, nlp, solver as osol
from tests.oracle.track_eval import OracleTrack
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.ocp import qp_data
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01
X0 = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])


@pytest.fixture(scope="module")
def setup():
    params, _ = load_params()
    ee = np.asarray(kin.ee_position(jnp.asarray(X0[:7])))
    x, y, z, rots = als.load_track_waypoints("assets/tracks/track.json")
    x, y, z = als.shift_track_to(x, y, z, ee)
    track = als.gen_6d_spline(x, y, z, rots)
    tr_o = OracleTrack(track)
    p_o = nlp.OracleParams()
    sel_o, env_o = nets.load_self(), nets.load_env()
    sel_j, env_j = cnn.load_self_collision_nn(), cnn.load_env_collision_nn()
    return params, track, tr_o, p_o, sel_o, env_o, sel_j, env_j


def _masked(v):
    """Compare +-INF sentinels as equal regardless of magnitude."""
    v = np.asarray(v, dtype=np.float64)
    return np.where(np.abs(v) > 1e20, np.sign(v) * 1e30, v)


def test_qp_assembly_matches_oracle(setup):
    params, track, tr_o, p_o, sel_o, env_o, sel_j, env_j = setup
    rng = np.random.default_rng(42)
    obs = np.array([0.5, 0.0, 0.6])
    rad = 0.05
    u_cur = 0.1 * rng.standard_normal(8)

    for trial in range(3):
        z = np.concatenate([np.tile(X0, 11), np.zeros(80)])
        z[:99] += 0.02 * rng.standard_normal(99)
        xs = z[:99].reshape(11, 9)
        xs[:, 7] = np.sort(np.abs(0.05 * rng.standard_normal(11)))
        xs[:, 8] = 0.1 * rng.standard_normal(11)
        z[99:] = 0.1 * rng.standard_normal(80)

        rbs = [nlp.KnotData(xs[k, :7], sel_o, env_o, obs, rad)
               for k in range(11)]
        h_o, g_o, a_o, l_o, u_o, obj_o, c_o = nlp.build_dense_qp(
            tr_o, p_o, z, rbs, u_cur, TS)

        rb_j = compute_robot_data(jnp.asarray(xs[:, :7]), jnp.asarray(obs),
                                  jnp.asarray(rad), sel_j, env_j)
        h_j, g_j, a_j, l_j, u_j, obj_j, c_j = [
            np.asarray(v) for v in qp_data.build_qp(
                track, jnp.asarray(z), rb_j, params, jnp.asarray(u_cur), TS)]

        np.testing.assert_allclose(h_o, h_j, atol=1e-8, rtol=1e-8)
        np.testing.assert_allclose(g_o, g_j, atol=1e-8, rtol=1e-8)
        np.testing.assert_allclose(a_o, a_j, atol=1e-9, rtol=1e-9)
        np.testing.assert_allclose(_masked(l_o), _masked(l_j), atol=1e-9)
        np.testing.assert_allclose(_masked(u_o), _masked(u_j), atol=1e-9)
        np.testing.assert_allclose(c_o, c_j, atol=1e-9)
        assert abs(obj_o - float(obj_j)) < 1e-8 * max(1.0, abs(obj_o))


@pytest.mark.slow
def test_closed_loop_matches_oracle(setup):
    params, track, tr_o, p_o, sel_o, env_o, sel_j, env_j = setup
    n_ticks = 100

    mpc_o = osol.OracleMPC(tr_o, p_o, sel_o, env_o, ts=TS)
    cfg = SQPConfig(max_iter=100, qp_solver="riccati", ipm_max_iter=40)
    carry = init_carry(jnp.float64)
    obs = jnp.asarray([3., 3., 3.], dtype=jnp.float64)

    x_o, u_o = X0.copy(), np.zeros(8)
    x_j, u_j = jnp.asarray(X0), jnp.zeros(8, dtype=jnp.float64)
    worst_q = worst_s = worst_vs = 0.0
    for i in range(n_ticks):
        ok_o, x_upd, u_o, _, st_o = mpc_o.step(x_o, u_o)
        x_o = nlp.sim_time_step(x_upd, u_o, TS)
        carry, out = mpc_step(track, params, sel_j, env_j, carry, x_j, u_j,
                              obs, 0.0, ts=TS, cfg=cfg)
        u_j = out.u0
        x_j = jnp.asarray(nlp.sim_time_step(np.asarray(out.x0_updated),
                                            np.asarray(u_j), TS))
        assert ok_o, f"oracle failed at tick {i}: status {st_o}"
        assert bool(out.ok), f"production failed at tick {i}: {int(out.status)}"
        xj = np.asarray(x_j)
        worst_q = max(worst_q, float(np.abs(x_o[:7] - xj[:7]).max()))
        worst_s = max(worst_s, abs(x_o[7] - float(xj[7])))
        worst_vs = max(worst_vs, abs(x_o[8] - float(xj[8])))

    # bounds: 30-tick measurement gave q ~3e-4 / s ~8e-5 / vs ~1.5e-3 with
    # slow growth; tightened r4 (VERDICT r3 #10: the 6x cushion would miss
    # a subtle systematic drift) to ~2.5x the measured envelope — any
    # systematic assembly/orchestration divergence trips these
    assert worst_q < 7.5e-4, worst_q
    assert worst_s < 2.5e-4, worst_s
    assert worst_vs < 4e-3, worst_vs
    # and both controllers actually progressed along the real track
    assert x_o[7] > 0.15 and float(x_j[7]) > 0.15, (x_o[7], float(x_j[7]))
