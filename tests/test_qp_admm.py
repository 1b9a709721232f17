"""ADMM QP solver tests: KKT optimality on random problems + known solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.solver import qp_admm


def _solve(p, q, a, l, u, **kw):
    sol = qp_admm.solve_qp(jnp.asarray(p), jnp.asarray(q), jnp.asarray(a),
                           jnp.asarray(l), jnp.asarray(u), **kw)
    return np.asarray(sol.x), np.asarray(sol.y), sol


def _kkt_residuals(p, q, a, l, u, x, y):
    """Stationarity, primal feasibility, complementary slackness."""
    stat = np.max(np.abs(p @ x + q + a.T @ y))
    ax = a @ x
    prim = np.max(np.maximum(ax - u, 0) + np.maximum(l - ax, 0))
    # complementarity: y+ only active at upper, y- at lower
    comp = np.max(np.abs(np.maximum(y, 0) * np.minimum(u - ax, 1.0))
                  + np.abs(np.minimum(y, 0) * np.minimum(ax - l, 1.0)))
    return stat, prim, comp


def test_equality_constrained_matches_kkt():
    rng = np.random.default_rng(0)
    n, m = 20, 8
    q_half = rng.standard_normal((n, n))
    p = q_half @ q_half.T + np.eye(n)
    q = rng.standard_normal(n)
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    x, y, sol = _solve(p, q, a, b, b, max_iter=2000)
    # direct KKT solve
    kkt = np.block([[p, a.T], [a, np.zeros((m, m))]])
    sol_ref = np.linalg.solve(kkt, np.concatenate([-q, b]))
    assert np.allclose(x, sol_ref[:n], atol=5e-3)


def test_box_qp_diagonal():
    # diagonal P: solution is the clipped unconstrained minimizer
    rng = np.random.default_rng(1)
    n = 15
    d = rng.uniform(0.5, 3.0, n)
    p = np.diag(d)
    q = rng.standard_normal(n) * 2
    a = np.eye(n)
    l = -0.5 * np.ones(n)
    u = 0.5 * np.ones(n)
    x, y, sol = _solve(p, q, a, l, u, max_iter=2000)
    x_ref = np.clip(-q / d, l, u)
    assert np.allclose(x, x_ref, atol=1e-3)


def test_random_inequality_qp_kkt():
    rng = np.random.default_rng(2)
    for trial in range(3):
        n, m = 30, 50
        q_half = rng.standard_normal((n, n))
        p = q_half @ q_half.T + 0.1 * np.eye(n)
        q = rng.standard_normal(n)
        a = rng.standard_normal((m, n))
        l = -rng.uniform(0.1, 1.0, m)
        u = rng.uniform(0.1, 1.0, m)
        x, y, sol = _solve(p, q, a, l, u, max_iter=4000)
        stat, prim, comp = _kkt_residuals(p, q, a, l, u, x, y)
        assert prim < 1e-3, (trial, prim)
        assert stat < 5e-3 * max(1, np.abs(q).max()), (trial, stat)


def test_mixed_eq_ineq_with_inf_bounds():
    # structure like the MPCC QP: equality rows + one-sided rows (l = -inf)
    rng = np.random.default_rng(3)
    n = 25
    q_half = rng.standard_normal((n, n))
    p = q_half @ q_half.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    a_eq = rng.standard_normal((5, n))
    b_eq = rng.standard_normal(5)
    a_in = rng.standard_normal((10, n))
    u_in = rng.uniform(0.5, 1.5, 10)
    a = np.vstack([a_eq, a_in])
    l = np.concatenate([b_eq, -1e30 * np.ones(10)])
    u = np.concatenate([b_eq, u_in])
    x, y, sol = _solve(p, q, a, l, u, max_iter=4000)
    assert np.max(np.abs(a_eq @ x - b_eq)) < 1e-3
    assert np.max(a_in @ x - u_in) < 1e-3
    stat = np.max(np.abs(p @ x + q + a.T @ y))
    assert stat < 1e-2


def test_early_termination_flag():
    # trivially easy problem should converge well before the cap
    p = np.eye(5)
    q = np.ones(5)
    a = np.eye(5)
    l = -np.ones(5) * 10
    u = np.ones(5) * 10
    x, y, sol = _solve(p, q, a, l, u, max_iter=1000, check_every=25)
    assert bool(sol.solved)
    assert int(sol.iters) < 1000
    assert np.allclose(x, -q, atol=1e-3)
