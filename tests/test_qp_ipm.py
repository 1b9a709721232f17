"""Structured Riccati/IPM solver tests: staged assembly equivalence with the
dense QP, and solution agreement with the ADMM backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import N, NU, NX, PANDA_DOF
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import _cold_start, _unwrap_s
from mpcc_manipulator_tpu.ocp import qp_data, qp_stages
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import load_params
from mpcc_manipulator_tpu.solver import qp_admm, qp_ipm
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01


@pytest.fixture(scope="module")
def qp_point():
    """A linearization point: cold-start guess on a round track."""
    params, _ = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0.05, 0.1])
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2], np.tile(np.eye(3), (nt, 1, 1)))
    z = _unwrap_s(_cold_start(x0, x0.dtype), track.length)
    # make inputs nonzero so ddq terms are exercised
    rng = np.random.default_rng(0)
    xs, us = qp_data.split_z(z)
    us = us + jnp.asarray(rng.standard_normal((N, NU)) * 0.05)
    xs = xs.at[1:, :].add(jnp.asarray(rng.standard_normal((N, NX)) * 0.01))
    z = qp_data.join_z(xs, us)
    current_u = jnp.asarray(rng.standard_normal(NU) * 0.05)
    rb = compute_robot_data(xs[:, :PANDA_DOF], jnp.asarray([3., 3., 3.]),
                            0.0, sel_nn, env_nn)
    return track, params, z, rb, current_u


def _dense_to_staged_dz(dz):
    """Map a dense-layout normalized step (with dx_0 = 0) to staged coords."""
    dxs = dz[:NX * (N + 1)].reshape(N + 1, NX)
    dus = dz[NX * (N + 1):].reshape(N, NU)
    du_prev = jnp.concatenate([jnp.zeros((1, NU)), dus[:-1]], axis=0)
    dx_tilde = jnp.concatenate([dxs, jnp.concatenate(
        [jnp.zeros((1, NU)), dus], axis=0)[:N + 1] * 0.0], axis=1)
    # augmented part: u_{k-1} for stage k
    dx_tilde = dx_tilde.at[:, NX:].set(
        jnp.concatenate([jnp.zeros((1, NU)), dus], axis=0))
    return dx_tilde, dus


def _staged_quadratic(qp, dx_tilde, dus):
    du_pad = jnp.concatenate([dus, jnp.zeros((1, NU))])
    z_all = jnp.concatenate([dx_tilde, du_pad], axis=1)
    val = 0.0
    for k in range(N):
        val += 0.5 * z_all[k] @ qp.h[k] @ z_all[k] + qp.g[k] @ z_all[k]
    val += (0.5 * dx_tilde[N] @ qp.h_term @ dx_tilde[N]
            + qp.g_term @ dx_tilde[N])
    return val


def test_staged_assembly_matches_dense(qp_point):
    track, params, z, rb, current_u = qp_point
    p_mat, qvec, a_mat, lvec, uvec, obj, constr = qp_data.build_qp(
        track, z, rb, params, current_u, TS)
    qp = qp_stages.build_qp_stages(track, z, rb, params, current_u, TS)

    rng = np.random.default_rng(1)
    for _ in range(3):
        dz = jnp.asarray(rng.standard_normal(qp_data.N_VAR if hasattr(qp_data, "N_VAR")
                                             else 179) * 0.1)
        from mpcc_manipulator_tpu.config import N_VAR
        dz = jnp.asarray(rng.standard_normal(N_VAR) * 0.1)
        dz = dz.at[:NX].set(0.0)        # x_0 pinned
        dx_tilde, dus = _dense_to_staged_dz(dz)

        dense_val = 0.5 * dz @ p_mat @ dz + qvec @ dz
        staged_val = _staged_quadratic(qp, dx_tilde, dus)
        assert np.isclose(float(dense_val), float(staged_val), rtol=1e-9), \
            (float(dense_val), float(staged_val))


def test_staged_constraint_rows_match_dense(qp_point):
    track, params, z, rb, current_u = qp_point
    from mpcc_manipulator_tpu.config import N_VAR, N_EQ, NPC
    p_mat, qvec, a_mat, lvec, uvec, obj, constr = qp_data.build_qp(
        track, z, rb, params, current_u, TS)
    qp = qp_stages.build_qp_stages(track, z, rb, params, current_u, TS)

    rng = np.random.default_rng(2)
    dz = jnp.asarray(rng.standard_normal(N_VAR) * 0.1)
    dz = dz.at[:NX].set(0.0)
    dx_tilde, dus = _dense_to_staged_dz(dz)
    du_pad = jnp.concatenate([dus, jnp.zeros((1, NU))])
    z_all = jnp.concatenate([dx_tilde, du_pad], axis=1)
    cz = jnp.einsum("krz,kz->kr", qp.c_rows, z_all)

    a_dz = a_mat @ dz
    lo = lvec - constr
    hi = uvec - constr

    # dense bound rows start at N_EQ: state boxes then input boxes then ddq
    for k in range(1, N + 1):
        for i in range(NX):
            dense_val = float(a_dz[N_EQ + NX * k + i])
            # upper row: C dz <= d
            assert np.isclose(float(cz[k, i]), dense_val, atol=1e-10)
            assert np.isclose(float(qp.d_vec[k, i]), float(hi[N_EQ + NX * k + i]),
                              atol=1e-10)
            # lower row mirrored
            assert np.isclose(float(qp.d_vec[k, NX + i]),
                              -float(lo[N_EQ + NX * k + i]), atol=1e-10)
    # ddq rows (k >= 1 compare against dense rate rows)
    off_dense = N_EQ + NX * (N + 1) + NU * N
    off_st = 2 * NX + 2 * NU
    for k in range(N):
        for i in range(PANDA_DOF):
            assert np.isclose(float(cz[k, off_st + i]),
                              float(a_dz[off_dense + NU * k + i]), atol=1e-10)
            assert np.isclose(float(qp.d_vec[k, off_st + i]),
                              float(hi[off_dense + NU * k + i]), atol=1e-10)
    # polytopic rows
    off_dense_p = N_EQ + NX * (N + 1) + NU * N + NU * N
    off_st_p = 2 * NX + 2 * NU + 2 * PANDA_DOF
    for k in range(N):
        for i in range(NPC):
            assert np.isclose(float(cz[k, off_st_p + i]),
                              float(a_dz[off_dense_p + NPC * k + i]), atol=1e-10)
            assert np.isclose(float(qp.d_vec[k, off_st_p + i]),
                              float(hi[off_dense_p + NPC * k + i]), atol=1e-10)


def test_ipm_matches_admm(qp_point):
    track, params, z, rb, current_u = qp_point
    p_mat, qvec, a_mat, lvec, uvec, obj, constr = qp_data.build_qp(
        track, z, rb, params, current_u, TS)
    sol_admm = qp_admm.solve_qp(p_mat, qvec, a_mat, lvec - constr,
                                uvec - constr, max_iter=8000, check_every=50)
    qp = qp_stages.build_qp_stages(track, z, rb, params, current_u, TS)
    sol_ipm = qp_ipm.solve_qp_ipm(qp, max_iter=40)
    dz_ipm = qp_stages.stage_step_to_dense(sol_ipm.dx_tilde, sol_ipm.du)

    dz_admm = np.asarray(sol_admm.x)
    dz_ipm = np.asarray(dz_ipm)
    assert bool(sol_ipm.solved), (int(sol_ipm.iters), float(sol_ipm.mu))
    # IPM converges in ~12 Newton steps to machine-precision feasibility;
    # ADMM at 8000 iterations still carries ~1e-6 violations and O(0.05)
    # primal error on weakly-determined coordinates, so compare via
    # objective + feasibility, with a loose pointwise band.
    assert int(sol_ipm.iters) < 40
    err = np.abs(dz_admm - dz_ipm).max()
    assert err < 0.1, err
    f = lambda d: 0.5 * d @ np.asarray(p_mat) @ d + np.asarray(qvec) @ d
    # IPM must be at least as optimal as ADMM (up to tolerance)
    assert f(dz_ipm) <= f(dz_admm) + 1e-3
    # and strictly feasible
    a_dz = np.asarray(a_mat) @ dz_ipm
    assert np.max(a_dz - np.asarray(uvec - constr)) < 1e-8
    assert np.max(np.asarray(lvec - constr) - a_dz) < 1e-8


def test_struct_assembly_packs_to_stage_qp(qp_point):
    """StageQPS (structure-exploiting layout) packs bit-exactly to StageQP."""
    track, params, z, rb, current_u = qp_point
    st = qp_stages.build_qp_stages(track, z, rb, params, current_u, TS)
    sts = qp_stages.build_qp_stages_s(track, z, rb, params, current_u, TS)
    pk = qp_stages.pack_stage_qp(sts)
    for f in ("h", "g", "h_term", "g_term", "at", "bt", "e",
              "c_rows", "d_vec", "mask"):
        a, b = getattr(st, f), getattr(pk, f)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13, f


@pytest.mark.parametrize("scheme", ["adaptive", "mehrotra"])
def test_struct_ipm_matches_packed_ipm(qp_point, scheme):
    """The structured solver reproduces the packed solver's Newton path:
    same iterate (machine precision), same iteration count, same verdict."""
    track, params, z, rb, current_u = qp_point
    st = qp_stages.build_qp_stages(track, z, rb, params, current_u, TS)
    sts = qp_stages.build_qp_stages_s(track, z, rb, params, current_u, TS)
    a = qp_ipm.solve_qp_ipm(st, max_iter=25, scheme=scheme)
    b = qp_ipm.solve_qp_ipm_s(sts, max_iter=25, scheme=scheme)
    assert int(a.iters) == int(b.iters)
    assert bool(a.solved) == bool(b.solved)
    assert float(jnp.max(jnp.abs(a.du - b.du))) < 1e-8
    assert float(jnp.max(jnp.abs(a.dx_tilde - b.dx_tilde))) < 1e-8
    if bool(a.solved):
        assert float(jnp.max(jnp.abs(a.lam - b.lam))) < 1e-4
