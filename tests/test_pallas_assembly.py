"""Pallas assembly kernel vs the XLA reference (interpret mode).

`ops/pallas_assembly.py` computes the exact StageQPK blocks of
`build_qp_stages_k`; equivalence contract is float32-level agreement on
every block, for both platforms, including points near the track endpoint
(spline/rotation endpoint branches) and the terminal-taper region.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.models import kinematics_mobile as kinm
from mpcc_manipulator_tpu.ocp import qp_stages as qps
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.ops import pallas_assembly as pasm
from mpcc_manipulator_tpu.params import load_params
from mpcc_manipulator_tpu.splines import arc_length as als
from mpcc_manipulator_tpu.system import HUSKY_PANDA, PANDA

TS = 0.01
DT = jnp.float32

X0_P = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0.05, 0.1])
X0_M = np.array([0., 0., 0.,
                 0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0.05, 0.1])


def _problem(system):
    params, _ = load_params(system=system, dtype=DT)
    sel_nn = cnn.load_self_collision_nn(dtype=DT)
    env_nn = cnn.load_env_collision_nn(dtype=DT)
    if system.name == "panda":
        x0 = X0_P
        ee = np.asarray(kin.ee_position_host(x0[:system.dof]))
        r_ee = np.eye(3)
    else:
        x0 = X0_M
        ee = np.asarray(kinm.ee_position_host(x0[:system.dof]))
        r_ee = np.asarray(kinm.ee_orientation_host(x0[:system.dof]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.linspace(0, 0.3, nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2], np.tile(r_ee, (nt, 1, 1)), dtype=DT)
    return params, sel_nn, env_nn, track, x0


def _compare(system, s_values, obs, obs_r, atol=5e-4):
    # 5e-4 relative: same f32-equivalence grade as the IPM kernel tests;
    # the kernel's arccos (series + Newton on cos, Mosaic has no inverse
    # trig) and multiply+reduce contractions reorder f32 rounding vs XLA
    params, sel_nn, env_nn, track, x0 = _problem(system)
    rng = np.random.default_rng(7)
    B = len(s_values)
    n_var = system.n_var
    z0 = np.concatenate([np.tile(x0, 11), np.zeros(system.nu * 10)])
    zs = np.tile(z0, (B, 1)) + 0.002 * rng.standard_normal((B, n_var))
    # pin each scenario's knot-s values to the requested region (spread the
    # knots a little so different spline segments are hit)
    for i, sv in enumerate(s_values):
        for k in range(11):
            zs[i, k * system.nx + system.s_idx] = sv + 0.003 * k
    zs = jnp.asarray(zs, dtype=DT)
    cu = jnp.asarray(0.01 * rng.standard_normal((B, system.nu)), dtype=DT)
    obs = jnp.asarray(obs, dtype=DT)

    def build_ref(z, c):
        xs = z[:system.nx * 11].reshape(11, system.nx)
        rb = compute_robot_data(xs[:, :system.dof], obs, obs_r, sel_nn,
                                env_nn, mani_grad="ad", system=system)
        return qps.build_qp_stages_k(track, z, rb, params, c, TS, False,
                                     system=system), rb

    ref, rbs = jax.vmap(build_ref)(zs, cu)
    got = pasm._build_batched(track, zs, rbs, params, cu, TS,
                              exact_heading_jac=False, system=system,
                              interpret=True)
    for f in ref.__dataclass_fields__:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        g = np.asarray(getattr(got, f), dtype=np.float64)
        assert a.shape == g.shape, (f, a.shape, g.shape)
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - g).max()
        assert err <= atol * scale, (f, err, scale)


@pytest.mark.parametrize(
    "system", [PANDA, pytest.param(HUSKY_PANDA, marks=pytest.mark.slow)],
    ids=["panda", "husky_panda"])
def test_assembly_kernel_matches_xla(system):
    """Interior-of-track knots, obstacle far away."""
    _compare(system, [0.05, 0.3, 0.6], obs=[3.0, 3.0, 3.0], obs_r=0.0)


@pytest.mark.slow
def test_assembly_kernel_endpoint_and_taper():
    """Knots at/past the track end: spline + rotation endpoint branches,
    desired-velocity taper, s trust-region clamp at L."""
    params, sel_nn, env_nn, track, x0 = _problem(PANDA)
    L = float(track.length)
    _compare(PANDA, [L - 0.05, L - 0.005, L + 0.1],
             obs=[3.0, 3.0, 3.0], obs_r=0.0)


@pytest.mark.slow
def test_assembly_kernel_with_obstacle_and_scheduling():
    """Near obstacle: active RBF env rows + proximity weight scheduling."""
    params, sel_nn, env_nn, track, x0 = _problem(PANDA)
    ee = np.asarray(kin.ee_position_host(X0_P[:7]))
    _compare(PANDA, [0.02, 0.1, 0.2],
             obs=[ee[0] + 0.18, ee[1], ee[2]], obs_r=5.0)


@pytest.mark.parametrize(
    "system", [PANDA, pytest.param(HUSKY_PANDA, marks=pytest.mark.slow)],
    ids=["panda", "husky_panda"])
def test_eval_kernel_matches_xla(system):
    """Values-only eval kernel (objective + l1 violation) vs
    total_objective + constraint_values + constraint_norm."""
    from mpcc_manipulator_tpu.ocp import qp_data
    from mpcc_manipulator_tpu.solver.sqp import constraint_norm

    params, sel_nn, env_nn, track, x0 = _problem(system)
    rng = np.random.default_rng(11)
    B = 4
    z0 = np.concatenate([np.tile(x0, 11), np.zeros(system.nu * 10)])
    # larger perturbation: make bound/rate/defect violations actually fire
    zs = jnp.asarray(np.tile(z0, (B, 1))
                     + 0.02 * rng.standard_normal((B, system.n_var)),
                     dtype=DT)
    cu = jnp.asarray(0.02 * rng.standard_normal((B, system.nu)), dtype=DT)
    obs = jnp.asarray([3.0, 3.0, 3.0], dtype=DT)

    def ref_eval(z, c):
        xs = z[:system.nx * 11].reshape(11, system.nx)
        rb = compute_robot_data(xs[:, :system.dof], obs, 0.0, sel_nn,
                                env_nn, mani_grad="ad", system=system)
        obj = qp_data.total_objective(track, z, rb, params, False,
                                      system=system)
        cv, l, u = qp_data.constraint_values(track, z, rb, params, c, TS,
                                             system=system)
        return obj, constraint_norm(cv, l, u), rb

    objs, vios, rbs = jax.vmap(ref_eval)(zs, cu)
    got_o, got_v = pasm._eval_batched(track, zs, rbs, params, cu, TS,
                                      system=system, interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(objs),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(vios),
                               rtol=5e-4, atol=5e-4)
    assert float(jnp.max(vios)) > 0.1  # the perturbation really violates
