"""Pallas fused-ADMM kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.solver import qp_admm


def _random_qp(rng, n=40, m=70):
    q_half = rng.standard_normal((n, n))
    p = (q_half @ q_half.T + 0.5 * np.eye(n)).astype(np.float32)
    q = rng.standard_normal(n).astype(np.float32)
    a = rng.standard_normal((m, n)).astype(np.float32)
    l = np.concatenate([rng.standard_normal(10),
                        -1e30 * np.ones(m - 10)]).astype(np.float32)
    u = np.concatenate([l[:10], rng.uniform(0.5, 2.0, m - 10)]).astype(np.float32)
    return p, q, a, l, u


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    p, q, a, l, u = _random_qp(rng)
    args = tuple(jnp.asarray(v, dtype=jnp.float32) for v in (p, q, a, l, u))
    with jax.disable_jit(False):
        sol_xla = qp_admm.solve_qp(*args, max_iter=500, backend="xla")
        sol_pls = qp_admm.solve_qp(*args, max_iter=500,
                                   backend="pallas_interpret")
    x_ref, x_pls = np.asarray(sol_xla.x), np.asarray(sol_pls.x)
    # identical iteration structure -> near-identical trajectories; both
    # reach the same residual floor (f32 may sit just above the 1e-4 abs
    # tolerance on random dense QPs, so compare quality, not the flag)
    assert float(sol_xla.prim_res) < 1e-3 and float(sol_pls.prim_res) < 1e-3
    assert float(sol_xla.dual_res) < 1e-2 and float(sol_pls.dual_res) < 1e-2
    assert np.allclose(x_ref, x_pls, atol=5e-3), np.abs(x_ref - x_pls).max()
    assert abs(int(sol_xla.iters) - int(sol_pls.iters)) <= 50


def test_pallas_mpcc_sized_qp():
    # a QP with the real MPCC dimensions (179 x 479), structure-like rows
    from mpcc_manipulator_tpu.config import N_CONSTR, N_VAR
    rng = np.random.default_rng(2)
    qh = rng.standard_normal((N_VAR, N_VAR)) * 0.1
    p = (qh @ qh.T + np.eye(N_VAR)).astype(np.float32)
    q = rng.standard_normal(N_VAR).astype(np.float32)
    a = np.zeros((N_CONSTR, N_VAR), dtype=np.float32)
    a[:N_VAR] = np.eye(N_VAR)                      # box rows
    a[N_VAR:N_VAR + 90] = rng.standard_normal((90, N_VAR)) * 0.3
    l = np.full(N_CONSTR, -1e30, dtype=np.float32)
    u = np.full(N_CONSTR, 1e30, dtype=np.float32)
    l[:N_VAR], u[:N_VAR] = -2.0, 2.0
    l[N_VAR:N_VAR + 45] = u[N_VAR:N_VAR + 45] = 0.3   # equality rows
    # remaining rows are all-zero (like the dVs rate slots): l = u = 0
    l[N_VAR + 90:] = u[N_VAR + 90:] = 0.0
    args = tuple(jnp.asarray(v) for v in (p, q, a, l, u))
    sol_xla = qp_admm.solve_qp(*args, max_iter=1000, backend="xla")
    sol_pls = qp_admm.solve_qp(*args, max_iter=1000, backend="pallas_interpret")
    assert np.allclose(np.asarray(sol_xla.x), np.asarray(sol_pls.x), atol=1e-2)
