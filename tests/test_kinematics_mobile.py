"""Mobile-base (Husky + Panda) kinematics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.models import kinematics_mobile as kmob

Q_HOME = np.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4])


def test_zero_base_matches_fixed_base():
    q_m = jnp.asarray(np.concatenate([[0.0, 0.0, 0.0], Q_HOME]))
    assert np.allclose(kmob.ee_position(q_m), kin.ee_position(jnp.asarray(Q_HOME)),
                       atol=1e-12)
    assert np.allclose(kmob.ee_orientation(q_m),
                       kin.ee_orientation(jnp.asarray(Q_HOME)), atol=1e-12)
    j10 = np.asarray(kmob.ee_jacobian(q_m))
    j7 = np.asarray(kin.ee_jacobian(jnp.asarray(Q_HOME)))
    assert np.allclose(j10[:, 3:], j7, atol=1e-12)


def test_base_translation_moves_ee():
    q_m = jnp.asarray(np.concatenate([[0.3, -0.2, 0.0], Q_HOME]))
    p = np.asarray(kmob.ee_position(q_m))
    p0 = np.asarray(kin.ee_position(jnp.asarray(Q_HOME)))
    assert np.allclose(p, p0 + np.array([0.3, -0.2, 0.0]), atol=1e-12)


def test_base_rotation():
    th = 0.7
    q_m = jnp.asarray(np.concatenate([[0.0, 0.0, th], Q_HOME]))
    p = np.asarray(kmob.ee_position(q_m))
    p0 = np.asarray(kin.ee_position(jnp.asarray(Q_HOME)))
    c, s = np.cos(th), np.sin(th)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    assert np.allclose(p, rz @ p0, atol=1e-12)


def test_jacobian_matches_autodiff():
    rng = np.random.default_rng(0)
    for _ in range(3):
        q_m = jnp.asarray(np.concatenate([
            rng.uniform(-1, 1, 2), rng.uniform(-np.pi, np.pi, 1),
            rng.uniform(-1.5, 1.5, 7)]))
        jv = np.asarray(kmob.ee_jacobian(q_m)[:3])
        jv_ad = np.asarray(jax.jacfwd(kmob.ee_position)(q_m))
        assert np.allclose(jv, jv_ad, atol=1e-10)


def test_mobile_manipulability_exceeds_fixed():
    # extra base DOFs can only increase the manipulability volume
    q_m = jnp.asarray(np.concatenate([[0.0, 0.0, 0.0], Q_HOME]))
    m10 = float(kmob.manipulability(q_m))
    m7 = float(kin.manipulability(jnp.asarray(Q_HOME)))
    assert m10 >= m7 - 1e-12
    g = np.asarray(kmob.manipulability_gradient(q_m))
    assert g.shape == (10,) and np.all(np.isfinite(g))
