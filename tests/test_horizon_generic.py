"""Horizon-generic compilation and solving: N is a parameter, not a constant.

SURVEY.md §5 names horizon scaling as this framework's long-context axis:
the reference bakes ``N = 10`` at compile time (`cpp/include/config.h:35`),
and its block-tridiagonal KKT coupling (`osqp_interface.cpp:240-247`) is
exactly what the stage-separable Riccati machinery generalizes over.  Since
round 5, ``System.horizon`` is a field of the static descriptor — these
tests compile and SOLVE the same OCP at N = 5 and N = 20 through

  * the dense-layout accessors (n_var/n_constr arithmetic),
  * the stage assembly + its AD linearization check,
  * the XLA structured Riccati-IPM closed loop,
  * the fused Pallas kernels (assembly + IPM, interpret-compiled on CPU),

none of which may assume N = 10.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.ocp import qp_data, qp_stages as qps
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als
from mpcc_manipulator_tpu.system import PANDA, System

TS = 0.01
X0 = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0.05, 0.1])


def _sys(n_h: int) -> System:
    return dataclasses.replace(PANDA, horizon=n_h)


def test_horizon_layout_properties():
    """Dense-layout sizes follow the reference formulas at every horizon
    (`osqp_interface.h:113-117` with N free)."""
    for n_h in (5, 10, 20):
        s = _sys(n_h)
        assert s.n_var == 9 * (n_h + 1) + 8 * n_h
        assert s.n_eq == 9 * (n_h + 1)
        assert s.n_constr == (9 * (n_h + 1)      # eq
                              + 9 * (n_h + 1) + 8 * n_h + 8 * n_h  # boxes
                              + 11 * (n_h + 1))  # polytopic
    assert _sys(10).n_var == 179 and _sys(10).n_constr == 479


@pytest.fixture(scope="module")
def track_and_nets():
    params, _ = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    ee = np.asarray(kin.ee_position_host(X0[:7]))
    r_ee = np.asarray(kin.ee_orientation(jnp.asarray(X0[:7])))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2], np.tile(r_ee, (nt, 1, 1)))
    return track, params, sel_nn, env_nn


def _point(system, track, sel_nn, env_nn, scale=0.002, seed=0):
    """A randomized iterate (z, rb, cu) at the given horizon."""
    n_h = system.horizon
    rng = np.random.default_rng(seed)
    z = jnp.asarray(
        np.concatenate([np.tile(X0, n_h + 1), np.zeros(8 * n_h)])
        + scale * rng.standard_normal(system.n_var))
    xs, _ = qp_data.split_z(z, system)
    rb = compute_robot_data(xs[:, :7], jnp.asarray([3., 3., 3.], z.dtype),
                            jnp.asarray(0.0, z.dtype), sel_nn, env_nn,
                            mani_grad="ad", system=system)
    return z, rb, jnp.zeros(8, dtype=z.dtype)


def test_horizon_prefix_linearization_consistent(track_and_nets):
    """Linearization across horizons: knot k's assembled cost/constraint
    blocks depend only on (x_k, u_k, u_{k-1}) and terminal-ness — so the
    N = 20 assembly restricted to its first stages must EQUAL the N = 5
    assembly at the same iterate prefix (both knots non-terminal there).
    Any off-by-one in the horizon-generic indexing breaks this."""
    track, params, sel_nn, env_nn = track_and_nets
    s20, s5 = _sys(20), _sys(5)
    z20, rb20, cu = _point(s20, track, sel_nn, env_nn)

    xs20, us20 = qp_data.split_z(z20, s20)
    z5 = qp_data.join_z(xs20[:6], us20[:5])
    rb5 = jax.tree.map(lambda a: a[:6] if a.ndim and a.shape[0] == 21 else a,
                       rb20)

    qk20 = qps.build_qp_stages_k(track, z20, rb20, params, cu, TS, False,
                                 system=s20)
    qk5 = qps.build_qp_stages_k(track, z5, rb5, params, cu, TS, False,
                                system=s5)

    # stages 0..4 and knots 0..4 agree exactly (knot 5 is terminal only in
    # the N=5 problem: q_c_N_mult weighting + zeroed rows — excluded)
    for f in qk20.__dataclass_fields__:
        a20, a5 = getattr(qk20, f), getattr(qk5, f)
        if a20.ndim == 0 or a20.shape == a5.shape:   # scalars/shared blocks
            d = jnp.max(jnp.abs(a20 - a5))
        else:
            k = min(5, a5.shape[0] - (1 if a5.shape[0] == 6 else 0))
            d = jnp.max(jnp.abs(a20[:k] - a5[:k]))
        assert float(d) < 1e-12, (f, float(d))


@pytest.mark.parametrize("n_h", [5, 20])
def test_stage_layouts_equivalent(track_and_nets, n_h):
    """StageQPK repacks to StageQPS at any horizon (same contract as the
    N = 10 equivalence tests in test_qp_ipm_pallas.py)."""
    track, params, sel_nn, env_nn = track_and_nets
    system = _sys(n_h)
    z, rb, cu = _point(system, track, sel_nn, env_nn)
    qs = qps.build_qp_stages_s(track, z, rb, params, cu, TS, False,
                               system=system)
    qk = qps.build_qp_stages_k(track, z, rb, params, cu, TS, False,
                               system=system)
    re_s = qps.qpk_to_qps(qk, system=system)
    sl = {"d_xu": np.s_[1:], "d_xl": np.s_[1:],
          "cpx": np.s_[:-1], "d_p": np.s_[:-1]}
    for f in qs.__dataclass_fields__:
        a, b = getattr(qs, f), getattr(re_s, f)
        if a.ndim:
            idx = sl.get(f, np.s_[:])
            a, b = a[idx], b[idx]
        assert float(jnp.max(jnp.abs(a - b))) < 1e-9, f
    assert qk.e.shape[0] == n_h and qk.hxx.shape[0] == n_h + 1


@pytest.mark.parametrize("n_h", [5, 20])
def test_riccati_closed_loop_any_horizon(track_and_nets, n_h):
    """Step-exactness of the whole stack at N != 10: the XLA Riccati-IPM
    closed loop solves every tick and makes progress."""
    track, params, sel_nn, env_nn = track_and_nets
    system = _sys(n_h)
    cfg = SQPConfig(max_iter=10, qp_solver="riccati", ipm_max_iter=20)
    x = jnp.asarray(np.concatenate([X0[:7], [0.0, 0.0]]))
    u = jnp.zeros(8, dtype=x.dtype)
    carry = init_carry(x.dtype, system)
    for t in range(15):
        carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                              jnp.asarray([3., 3., 3.], x.dtype),
                              jnp.asarray(0.0, x.dtype), ts=TS, cfg=cfg,
                              system=system)
        assert bool(out.ok), (n_h, t, int(out.status))
        u = out.u0
        x = dyn.sim_time_step(out.x0_updated, u, TS)
    # progress scales with lookahead: a 50 ms horizon is legitimately
    # conservative on this curved track (measured vs ~0.02 at N=5 vs
    # ~0.13 at N=20); the capability claim is solve + forward progress
    assert float(x[7]) > {5: 5e-4, 20: 5e-3}[n_h], float(x[7])
    assert out.horizon_x.shape == (n_h + 1, 9)
    assert out.horizon_u.shape == (n_h, 8)


@pytest.mark.slow
def test_n20_closed_loop_sustained(track_and_nets):
    """Behavioral horizon check: 300 ticks (3 s of control) at BOTH N=20
    and N=10 on the same scenario — every tick solved, monotone progress,
    and the doubled lookahead HELPS: N=20's progress dominates N=10's
    (measured s_end 0.199 vs 0.168; the absolute slowdown over the lap is
    scenario-inherent — the fixed reference orientation gets kinematically
    awkward around the circle at either horizon)."""
    track, params, sel_nn, env_nn = track_and_nets
    cfg = SQPConfig(max_iter=10, qp_solver="riccati", ipm_max_iter=20)
    s_end = {}
    for n_h in (20, 10):
        system = _sys(n_h)
        x = jnp.asarray(np.concatenate([X0[:7], [0.0, 0.0]]))
        u = jnp.zeros(8, dtype=x.dtype)
        carry = init_carry(x.dtype, system)
        s_hist = []
        for t in range(300):
            carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                                  jnp.asarray([3., 3., 3.], x.dtype),
                                  jnp.asarray(0.0, x.dtype), ts=TS, cfg=cfg,
                                  system=system)
            assert bool(out.ok), (n_h, t, int(out.status))
            u = out.u0
            x = dyn.sim_time_step(out.x0_updated, u, TS)
            s_hist.append(float(x[7]))
        s = np.asarray(s_hist)
        assert np.all(np.diff(s) > -1e-6), n_h      # monotone progress
        s_end[n_h] = s[-1]
    assert s_end[20] > 0.15, s_end                  # real progress at N=20
    # dominance, not a fixed ratio: the measured gap is ~18% (0.199 vs
    # 0.168) but a hard 1.1x would turn numerical drift across jax
    # versions into a gate; the contract is that more lookahead never
    # does worse on the same scenario
    assert s_end[20] > s_end[10], s_end             # lookahead helps


@pytest.fixture(scope="module")
def f32_problem():
    """float32 params/NNs/track for the kernel tests.  The track carries
    the EE's own orientation: heading errors stay small, away from the
    kernel arccos-series' worst region (near pi the f32 drift vs XLA
    exceeds the 5e-4 equivalence grade)."""
    dt = jnp.float32
    params32, _ = load_params(dtype=dt)
    sel32 = cnn.load_self_collision_nn(dtype=dt)
    env32 = cnn.load_env_collision_nn(dtype=dt)
    ee = np.asarray(kin.ee_position_host(X0[:7]))
    r_ee = np.asarray(kin.ee_orientation(jnp.asarray(X0[:7])))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track32 = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2], np.tile(r_ee, (nt, 1, 1)), dtype=dt)
    return params32, sel32, env32, track32


def _f32_iterates(system, B, seed):
    """Perturbed f32 decision-vector batch at the system's horizon."""
    n_h = system.horizon
    rng = np.random.default_rng(seed)
    zs = jnp.asarray(
        np.concatenate([np.tile(X0, n_h + 1), np.zeros(8 * n_h)])[None]
        + 0.002 * rng.standard_normal((B, system.n_var)), dtype=jnp.float32)
    cu = jnp.asarray(0.01 * rng.standard_normal((B, 8)), dtype=jnp.float32)
    return zs, cu


def test_assembly_and_eval_kernels_any_horizon(f32_problem):
    """The fused Pallas assembly + eval kernels at N != 10 (interpret):
    same f32 equivalence contract vs the XLA `build_qp_stages_k` /
    `total_objective`+violation as test_pallas_assembly.py pins at N=10.
    Exercises the kernels' per-knot unroll bound, pair_mask, out_shapes
    and reshape sites, all re-threaded on ``system.horizon`` in r5."""
    from mpcc_manipulator_tpu.ops import pallas_assembly as pasm
    from mpcc_manipulator_tpu.solver.sqp import constraint_norm
    n_h = 5
    system = _sys(n_h)
    dt = jnp.float32
    params32, sel32, env32, track32 = f32_problem
    zs, cu = _f32_iterates(system, B=3, seed=3)
    obs = jnp.asarray([3., 3., 3.], dt)

    def build_ref(z, c):
        xs = z[:9 * (n_h + 1)].reshape(n_h + 1, 9)
        rb = compute_robot_data(xs[:, :7], obs, jnp.asarray(0.0, dt),
                                sel32, env32, mani_grad="ad", system=system)
        return qps.build_qp_stages_k(track32, z, rb, params32, c, TS, False,
                                     system=system), rb

    ref, rbs = jax.vmap(build_ref)(zs, cu)
    got = pasm._build_batched(track32, zs, rbs, params32, cu, TS,
                              exact_heading_jac=False, system=system,
                              interpret=True)
    for f in ref.__dataclass_fields__:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        g = np.asarray(getattr(got, f), dtype=np.float64)
        assert a.shape == g.shape, (f, a.shape, g.shape)
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - g).max() <= 5e-4 * scale, f

    # values-only eval kernel vs the XLA objective + l1 violation
    def ref_eval(z, rb, c):
        obj = qp_data.total_objective(track32, z, rb, params32,
                                      system=system)
        cv, l, u = qp_data.constraint_values(track32, z, rb, params32, c,
                                             TS, system=system)
        return obj, constraint_norm(cv, l, u)

    objs, vios = jax.vmap(ref_eval)(zs, rbs, cu)
    got_o, got_v = pasm._eval_batched(track32, zs, rbs, params32, cu, TS,
                                      system=system, interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(objs),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(vios),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize(
    "n_h", [5, pytest.param(20, marks=pytest.mark.slow)])
def test_kernel_ipm_any_horizon(f32_problem, n_h):
    """The fused Pallas IPM kernel (interpret) is step-exact vs the XLA
    structured solver at N != 10."""
    from mpcc_manipulator_tpu.solver import qp_ipm, qp_ipm_pallas
    system = _sys(n_h)
    dt = jnp.float32
    params32, sel32, env32, track32 = f32_problem
    zs, _ = _f32_iterates(system, B=2, seed=1)

    def build(z):
        xs = z[:9 * (n_h + 1)].reshape(n_h + 1, 9)
        rb = compute_robot_data(xs[:, :7], jnp.asarray([3., 3., 3.], dt),
                                jnp.asarray(0.0, dt), sel32, env32,
                                mani_grad="ad", system=system)
        qs = qps.build_qp_stages_s(track32, z, rb, params32,
                                   jnp.zeros(8, dtype=dt), TS, False,
                                   system=system)
        qk = qps.build_qp_stages_k(track32, z, rb, params32,
                                   jnp.zeros(8, dtype=dt), TS, False,
                                   system=system)
        return qs, qk

    qp_s, qp_k = jax.vmap(build)(zs)
    ref = jax.vmap(lambda q: qp_ipm.solve_qp_ipm_s(q, max_iter=25,
                                                   scheme="adaptive"))(qp_s)
    sol = qp_ipm_pallas._solve_batched(qp_k, system=system, max_iter=25,
                                       interpret=True, scheme="adaptive")
    assert int(np.max(np.abs(np.asarray(ref.iters)
                             - np.asarray(sol.iters)))) <= 1
    np.testing.assert_array_equal(np.asarray(ref.solved),
                                  np.asarray(sol.solved))
    # f32 agreement degrades with recursion depth: the backward Riccati
    # sweep is n_h matrix recursions deep, so accumulation-order drift
    # (multiply+reduce vs XLA matmuls) compounds ~linearly, and a lane
    # converging one (allowed) iteration apart carries its last Newton
    # step as delta.  Measured: 2e-4 at N=10, 1.9e-3 at N=20.
    tol = {5: 5e-4, 20: 5e-3}[n_h]
    assert float(jnp.max(jnp.abs(ref.du - sol.du))) < tol
    assert float(jnp.max(jnp.abs(ref.dx_tilde - sol.dx_tilde))) < tol
