"""Reference solver features on the production (Riccati/IPM) path.

Round-2 verdict: SOC, BFGS, and the merit line search existed only on the
dense ADMM backend, and the riccati family silently ignored the toggles.
These tests pin the round-3 contract:

  * ``do_SOC=True`` changes behavior on every riccati backend and the
    stage-form correction is algebraically identical to the reference's
    dense ``d = c(z+dz) - A dz`` re-solve (`osqp_interface.cpp:658-681`);
  * ``line_search="merit"`` runs the l1-merit Armijo search
    (`osqp_interface.cpp:717-757`) on the riccati path;
  * ``use_BFGS=True`` on a riccati backend raises loudly instead of being
    ignored (structurally incompatible with stage elimination).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import N, NPC, NU, NX, PANDA_DOF, StateIndex
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.ocp import qp_data, qp_stages as qps
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.solver import qp_ipm, sqp as sqp_mod
from mpcc_manipulator_tpu.splines import arc_length as als
from mpcc_manipulator_tpu.system import PANDA

TS = 0.01


@pytest.fixture(scope="module")
def problem():
    params, _ = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.12 * np.cos(phi) - 0.12 + ee[1],
        0.12 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)))
    return params, sel_nn, env_nn, track, x0


def _run(problem, cfg, n_steps=8):
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


def test_bfgs_on_riccati_raises(problem):
    params, sel_nn, env_nn, track, x0 = problem
    cfg = SQPConfig(max_iter=3, qp_solver="riccati", use_BFGS=True)
    with pytest.raises(ValueError, match="BFGS"):
        mpc_step(track, params, sel_nn, env_nn, init_carry(x0.dtype), x0,
                 jnp.zeros(NU, dtype=x0.dtype),
                 jnp.asarray([3., 3., 3.], dtype=x0.dtype), 0.0,
                 ts=TS, cfg=cfg)


def test_pallas_assembly_off_kernel_solver_raises(problem):
    """qp_assembly='pallas' only exists for the kernel solver; silently
    ignoring the toggle would make ablations lie (same loud-failure
    policy as use_BFGS)."""
    params, sel_nn, env_nn, track, x0 = problem
    cfg = SQPConfig(max_iter=3, qp_solver="riccati", qp_assembly="pallas")
    with pytest.raises(ValueError, match="riccati_pallas"):
        mpc_step(track, params, sel_nn, env_nn, init_carry(x0.dtype), x0,
                 jnp.zeros(NU, dtype=x0.dtype),
                 jnp.asarray([3., 3., 3.], dtype=x0.dtype), 0.0,
                 ts=TS, cfg=cfg)


@pytest.mark.parametrize("solver", ["riccati", "riccati_struct"])
def test_soc_consulted_and_solves(problem, solver):
    base = dict(max_iter=10, qp_solver=solver, ipm_max_iter=25)
    traj_plain = _run(problem, SQPConfig(**base))
    traj_soc = _run(problem, SQPConfig(do_SOC=True, **base))
    # both solve and make progress
    assert traj_soc[-1, StateIndex.s] > 1e-4
    # the toggle is consulted: trajectories are not bitwise identical
    assert np.abs(traj_plain - traj_soc).max() > 0
    # and SOC is a *correction*: closed-loop behavior stays close
    assert np.abs(traj_plain - traj_soc).max() < 0.05


def test_merit_line_search_riccati_solves(problem):
    base = dict(max_iter=10, qp_solver="riccati", ipm_max_iter=25)
    traj_f = _run(problem, SQPConfig(line_search="filter", **base))
    traj_m = _run(problem, SQPConfig(line_search="merit", **base))
    assert traj_m[-1, StateIndex.s] > 1e-4
    assert np.all(np.isfinite(traj_m))
    # merit may back off alpha where the filter accepts (near-zero initial
    # violation makes the merit weight large), so trajectories differ —
    # but both are valid SQP runs on the same problem and must stay close
    assert np.abs(traj_f - traj_m).max() < 0.05
    # the toggle is consulted
    assert np.abs(traj_f - traj_m).max() > 0


def test_stage_soc_equals_dense_soc_correction(problem):
    """The stage-form SOC shortcut (d_p += Cpx dx; s trust region
    re-centered) must reproduce the reference's dense correction
    u_soc - (c(z+dz) - A dz) row-for-row."""
    params, sel_nn, env_nn, track, x0 = problem
    u_cur = jnp.zeros(NU, dtype=x0.dtype)
    z = jnp.concatenate([jnp.tile(x0, N + 1),
                         jnp.zeros(N * NU, dtype=x0.dtype)])
    xs, _ = qp_data.split_z(z)
    rb = compute_robot_data(xs[:, :PANDA_DOF], jnp.asarray([3., 3., 3.]),
                            jnp.asarray(0.0), sel_nn, env_nn)

    rep = qps.build_qp_stages(track, z, rb, params, u_cur, TS)
    sol = qp_ipm.solve_qp_ipm(rep, max_iter=30)
    step = qps.stage_step_to_dense(sol.dx_tilde, sol.du)

    # dense reference correction
    _, _, a_mat, _, _, _, _ = qp_data.build_qp(track, z, rb, params, u_cur, TS)
    z_soc = z + qp_data.denormalize_step(step, params)
    c_soc, l_soc, u_soc = qp_data.constraint_values(track, z_soc, rb, params,
                                                    u_cur, TS)
    d = c_soc - a_mat @ step
    u_corr = np.asarray(u_soc - d)

    rep_soc = sqp_mod._soc_corrected_rep(rep, sol, z, track.length, params,
                                         "riccati", PANDA)

    # polytopic rows: dense layout puts them last, (N+1, NPC)
    dense_poly = u_corr[-(N + 1) * NPC:].reshape(N + 1, NPC)
    o = 2 * NX + 2 * NU + 2 * PANDA_DOF
    stage_poly = np.asarray(rep_soc.d_vec[:, o:])
    np.testing.assert_allclose(stage_poly[:N], dense_poly[:N],
                               rtol=1e-10, atol=1e-10)

    # s trust-region rows: dense state-bound rows start at n_eq
    n_eq = PANDA.n_eq
    dense_s_u = u_corr[n_eq:n_eq + (N + 1) * NX].reshape(N + 1, NX)[:, StateIndex.s]
    stage_s_u = np.asarray(rep_soc.d_vec[:, StateIndex.s])
    # stage assembly applies a reachability clamp the dense rows don't
    np.testing.assert_allclose(stage_s_u, np.maximum(dense_s_u, 1e-6),
                               rtol=1e-10, atol=1e-10)


_WARM_START_CHILD = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from mpcc_manipulator_tpu.config import NU, PANDA_DOF
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01
params, _ = load_params()
sel_nn = cnn.load_self_collision_nn()
env_nn = cnn.load_env_collision_nn()
x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
nt = 60
phi = np.linspace(0, 2 * np.pi, nt)
track = als.gen_6d_spline(
    np.zeros(nt) + ee[0], 0.12 * np.cos(phi) - 0.12 + ee[1],
    0.12 * np.sin(phi) + ee[2],
    np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)))
obs = jnp.asarray([3.0, 3.0, 3.0], dtype=x0.dtype)

def roll(cfg, n_steps=25):
    def step(c, _):
        carry, x, u = c
        carry2, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                               obs, 0.0, ts=TS, cfg=cfg)
        x2 = dyn.sim_time_step(out.x0_updated, out.u0, TS)
        return ((carry2, x2, out.u0),
                (x2, out.ok, out.sqp_iters, out.qp_iters))
    init = (init_carry(x0.dtype), x0, jnp.zeros(NU, dtype=x0.dtype))
    _, (xs, oks, sqp_it, qp_it) = jax.lax.scan(step, init, None,
                                               length=n_steps)
    assert bool(jnp.all(oks))
    iters = np.asarray(qp_it) / np.maximum(np.asarray(sqp_it), 1)
    return np.asarray(xs), iters

base = dict(max_iter=10, qp_solver="riccati_struct", ipm_max_iter=25,
            ipm_scheme="mehrotra")
traj_c, it_c = roll(SQPConfig(**base))
traj_w, it_w = roll(SQPConfig(**base, ipm_warm_start=True))
np.savez(os.environ["WARM_OUT"], traj_c=traj_c, it_c=it_c,
         traj_w=traj_w, it_w=it_w)
print("CHILD_OK")
"""


def test_ipm_warm_start_fewer_iters_same_trajectory(tmp_path):
    """Cross-tick IPM warm starting (SQPConfig.ipm_warm_start): strictly
    fewer Newton iterations at steady state, same closed-loop trajectory
    within solver tolerance, zero failures.  f64 keeps the drift tiny.

    Runs in a SUBPROCESS: executed after the full suite's ~100 compiled
    programs, this specific pair of mpc_step compilations reproducibly
    segfaults CPU XLA (passes standalone every time — an accumulated-state
    crash inside XLA, not a library bug; the pallas/riccati paths here are
    pure jnp).  Root-cause attempt + findings: tools/repro_cpu_segfault.py
    (120-program compile pressure alone does NOT reproduce it — the crash
    needs suite-scale allocator state).  Central mitigations: the conftest
    persistent compilation cache (repeat runs skip the compiles) plus this
    one subprocess isolation."""
    import subprocess
    import sys

    out = tmp_path / "warm.npz"
    env = dict(os.environ, WARM_OUT=str(out),
               JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", _WARM_START_CHILD],
                         capture_output=True, text=True, timeout=600,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0 and "CHILD_OK" in res.stdout, (
        res.returncode, res.stdout[-2000:], res.stderr[-2000:])
    d = np.load(out)
    it_c, it_w = d["it_c"], d["it_w"]
    # steady state (skip the cold-identical first ticks): strictly fewer
    # Newton iterations per QP on average, and no worse in the tail
    assert it_w[5:].mean() < it_c[5:].mean() - 0.5, (it_w, it_c)
    assert it_w[5:].max() <= it_c[5:].max() + 1
    # same closed loop within solver tolerance: each QP converges to
    # mu < EPS_IPM from a different start, so per-tick steps differ by
    # O(1e-4) and accumulate; measured max drift 8e-4 over 25 ticks
    # (the riccati-vs-admm backend test allows 0.05 for the same reason)
    np.testing.assert_allclose(d["traj_w"], d["traj_c"], atol=5e-3)
