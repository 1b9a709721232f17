"""SO(3) primitive tests: round trips, branch coverage, Jacobian identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.utils import so3


def random_rotation(rng, angle=None):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    if angle is None:
        angle = rng.uniform(0.01, np.pi - 0.01)
    return np.asarray(so3.exp_rot(jnp.asarray(axis * angle)))


def test_hat_vee_roundtrip():
    v = jnp.array([0.3, -1.2, 2.1])
    assert np.allclose(so3.vee(so3.hat(v)), v)


def test_exp_log_roundtrip_generic():
    rng = np.random.default_rng(0)
    for _ in range(20):
        r = random_rotation(rng)
        w = so3.log_rot_vec(jnp.asarray(r))
        r2 = so3.exp_rot(w)
        assert np.allclose(r, r2, atol=1e-10)


def test_log_small_angle():
    w = jnp.array([1e-9, -2e-9, 1e-9])
    r = so3.exp_rot(w)
    assert np.allclose(so3.log_rot_vec(r), w, atol=1e-12)


def test_log_near_pi():
    rng = np.random.default_rng(1)
    for _ in range(10):
        r = random_rotation(rng, angle=np.pi - 1e-6)
        w = so3.log_rot_vec(jnp.asarray(r))
        assert np.allclose(np.asarray(so3.exp_rot(w)), r, atol=1e-4)


def test_exp_zero():
    assert np.allclose(so3.exp_rot(jnp.zeros(3)), np.eye(3))


def test_right_jacobian_inverse_identity_at_zero():
    assert np.allclose(so3.right_jacobian_inverse(jnp.zeros(3)), np.eye(3))


def test_right_jacobian_inverse_matches_fd():
    # J_r^{-1} satisfies: d/dt Log(exp(phi_hat) exp(t w_hat)) |_0 = J_r^{-1}(phi) w
    phi = jnp.array([0.3, -0.2, 0.5])
    w = jnp.array([0.11, 0.07, -0.19])
    eps = 1e-7
    r0 = so3.exp_rot(phi)
    f = lambda t: so3.log_rot_vec(r0 @ so3.exp_rot(t * w))
    fd = (f(eps) - f(-eps)) / (2 * eps)
    pred = so3.right_jacobian_inverse(phi) @ w
    assert np.allclose(fd, pred, atol=1e-6)


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        r = random_rotation(rng)
        q = so3.rot_to_quat(jnp.asarray(r))
        r2 = so3.quat_to_rot(q)
        assert np.allclose(r, r2, atol=1e-10)


def test_vmap_and_jit():
    rng = np.random.default_rng(3)
    rs = jnp.asarray(np.stack([random_rotation(rng) for _ in range(8)]))
    ws = jax.jit(jax.vmap(so3.log_rot_vec))(rs)
    back = jax.jit(jax.vmap(so3.exp_rot))(ws)
    assert np.allclose(back, rs, atol=1e-10)
