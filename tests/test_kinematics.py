"""Kinematics tests mirroring `robot_model_test.h` + AD cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np

from mpcc_manipulator_tpu.models import kinematics as K

Q_HOME = jnp.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4])


def test_ee_position_golden():
    # reference golden (robot_model_test.h:26-30): real robot ~ (0.557, 0.001, 0.522)
    p = np.asarray(K.ee_position(Q_HOME))
    assert np.allclose(p, [0.5545, 0.0, 0.5215], atol=2e-3)


def test_ee_orientation_home():
    r = np.asarray(K.ee_orientation(Q_HOME))
    # tool points down: z axis of EE ~ -z world
    assert np.allclose(r, np.diag([1.0, -1.0, -1.0]), atol=1e-6)
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_jacobian_golden():
    # reference golden comment (robot_model_test.h:77-83)
    q = jnp.array([-0.002, -0.001, 0.002, -1.574, 0.006, 1.584, 0.789])
    jv = np.asarray(K.ee_jacobian(q)[:3])
    expected = np.array([
        [0.001, 0.189, -0.001, 0.128, 0.000, 0.209, 0.000],
        [0.557, -0.000, 0.557, -0.000, 0.209, -0.001, -0.000],
        [0.000, -0.557, -0.000, 0.474, 0.001, 0.090, -0.000],
    ])
    assert np.allclose(jv, expected, atol=5e-3)


def test_jacobian_matches_autodiff():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
        jv_analytic = K.ee_jacobian(q)[:3]
        jv_ad = jax.jacfwd(K.ee_position)(q)
        assert np.allclose(jv_analytic, jv_ad, atol=1e-10)


def test_jacobian_rotational_matches_autodiff():
    # Jw @ dq should equal vee(dR R^T)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
    dq = jnp.asarray(rng.normal(size=7) * 1e-6)
    r0 = np.asarray(K.ee_orientation(q))
    r1 = np.asarray(K.ee_orientation(q + dq))
    w_fd = np.array([(r1 @ r0.T)[2, 1], (r1 @ r0.T)[0, 2], (r1 @ r0.T)[1, 0]])
    w_pred = np.asarray(K.ee_jacobian(q)[3:] @ dq)
    assert np.allclose(w_fd, w_pred, atol=1e-10)


def test_manipulability_linearization():
    # reference test (robot_model_test.h:93-129): first-order prediction
    # within 5% for a 0.01 joint step
    q0 = jnp.array([0.0, 0.0, 0.0, 0.1, 0.0, np.pi / 2, np.pi / 4])
    dq = jnp.ones(7) * 0.01
    m0 = float(K.manipulability(q0))
    m1 = float(K.manipulability(q0 + dq))
    d_mani = np.asarray(K.manipulability_gradient_fd(q0))
    m_est = m0 + d_mani @ np.asarray(dq)
    assert abs((m_est - m1) / m1) * 100 < 5


def test_manipulability_fd_vs_ad():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, 7)) + Q_HOME
    g_fd = np.asarray(K.manipulability_gradient_fd(q))
    g_ad = np.asarray(K.manipulability_gradient_ad(q))
    assert np.allclose(g_fd, g_ad, rtol=1e-4, atol=1e-7)


def test_vmap_batching():
    rng = np.random.default_rng(3)
    qs = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 7)))
    ps = jax.vmap(K.ee_position)(qs)
    js = jax.vmap(K.ee_jacobian)(qs)
    assert ps.shape == (16, 3) and js.shape == (16, 6, 7)


def test_manipulability_analytic_gradient_matches_ad_and_fd():
    """Closed-form dJ/dq manipulability gradient (mani_grad="analytic"):
    equals the AD gradient to roundoff and the reference FD to O(delta^2)."""
    rng = np.random.default_rng(7)
    for _ in range(6):
        q = jnp.asarray(rng.uniform(-2.0, 2.0, 7))
        m_a, dm_a = K.manipulability_and_grad_analytic(q)
        assert float(jnp.abs(m_a - K.manipulability(q))) < 1e-12
        dm_ad = K.manipulability_gradient_ad(q)
        np.testing.assert_allclose(np.asarray(dm_a), np.asarray(dm_ad),
                                   atol=1e-10)
        dm_fd = K.manipulability_gradient_fd(q)
        np.testing.assert_allclose(np.asarray(dm_a), np.asarray(dm_fd),
                                   atol=1e-6)
