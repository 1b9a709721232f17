"""Dynamics tests mirroring `model_integrator_test.h` + ZOH exactness."""

import jax.numpy as jnp
import numpy as np

from mpcc_manipulator_tpu.models import dynamics as dyn


def test_closed_form_zoh_matches_expm():
    from scipy.linalg import expm
    ts = 0.01
    a, b = dyn.continuous_ab()
    m = np.zeros((18, 18))
    m[:9, :9] = a
    m[:9, 9:17] = b
    em = expm(m * ts)
    ad, bd, gd = dyn.discrete_ab(ts)
    assert np.allclose(ad, em[:9, :9], atol=1e-14)
    assert np.allclose(bd, em[:9, 9:17], atol=1e-14)
    assert np.allclose(gd, 0.0)


def test_rk4_vs_euler():
    # linear dynamics: RK4 and Euler agree to O(ts^2) (reference test pattern)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=9))
    u = jnp.asarray(rng.normal(size=8))
    ts = 0.001
    x_rk4 = dyn.rk4_step(x, u, ts)
    x_ef = dyn.euler_step(x, u, ts)
    assert np.max(np.abs(np.asarray(x_rk4 - x_ef))) < ts ** 2 * 10


def test_rk4_vs_discrete_model():
    # for this linear system the discrete model is exact; RK4 matches to
    # machine precision (the only nonlinearity order is zero)
    rng = np.random.default_rng(1)
    ts = 0.01
    ad, bd, gd = dyn.discrete_ab(ts)
    for _ in range(5):
        x = jnp.asarray(rng.normal(size=9))
        u = jnp.asarray(rng.normal(size=8))
        x_rk4 = np.asarray(dyn.rk4_step(x, u, ts))
        x_lin = ad @ np.asarray(x) + bd @ np.asarray(u) + gd
        assert np.allclose(x_rk4, x_lin, atol=1e-12)


def test_sim_time_step_substeps():
    x = jnp.zeros(9)
    u = jnp.ones(8)
    x1 = np.asarray(dyn.sim_time_step(x, u, 0.01))
    # q advances by u*ts; s advances by 0.5*dVs*ts^2 (vs integrates dVs)
    assert np.allclose(x1[:7], 0.01)
    assert np.isclose(x1[8], 0.01)          # vs = dVs * ts
    assert np.isclose(x1[7], 0.5 * 0.01 ** 2)  # s = 1/2 dVs ts^2
