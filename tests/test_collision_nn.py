"""Collision-NN tests mirroring `self_collision_test.h` incl. golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn


@pytest.fixture(scope="module")
def self_nn():
    try:
        return cnn.load_self_collision_nn()
    except (FileNotFoundError, OSError):
        pytest.skip("self-collision weights unavailable")


@pytest.fixture(scope="module")
def env_nn():
    try:
        return cnn.load_env_collision_nn()
    except (FileNotFoundError, OSError):
        pytest.skip("env-collision weights unavailable")


def _numpy_mlp_reference(ws, bs, q):
    """Independent numpy transcription of the reference forward+Jacobian math
    (`SelfCollisionModel.cpp:140-222`) to cross-check the JAX implementation."""
    x = np.concatenate([q, np.sin(q), np.cos(q)])
    n = q.size
    jac = np.zeros((3 * n, n))
    jac[:n] = np.eye(n)
    jac[n:2 * n] = np.diag(np.cos(q))
    jac[2 * n:] = np.diag(-np.sin(q))
    h = x
    for w, b in zip(ws[:-1], bs[:-1]):
        z = w @ h + b
        jac = (np.where(z > 0, 1.0, 0.0)[:, None] * w) @ jac
        h = np.maximum(z, 0.0)
    return ws[-1] @ h + bs[-1], ws[-1] @ jac


def test_self_nn_matches_numpy_reference(self_nn):
    ws = [np.asarray(w) for w in self_nn.weights]
    bs = [np.asarray(b) for b in self_nn.biases]
    q = np.array([-0.46122822, -0.83015843, 1.45945742, -1.69096399,
                  1.58827731, 0.74419064, 0.21002424])
    y_np, jac_np = _numpy_mlp_reference(ws, bs, q)
    y, jac = cnn.mlp_forward_jacobian(self_nn, jnp.asarray(q))
    assert np.allclose(y, y_np, atol=1e-12)
    assert np.allclose(jac, jac_np, atol=1e-12)


def test_self_nn_linearization(self_nn):
    # reference test: 1st-order prediction within 5% for a 0.01 step
    q0 = jnp.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4])
    dq = jnp.ones(7) * 0.01
    y0, jac = cnn.mlp_forward_jacobian(self_nn, q0)
    y1, _ = cnn.mlp_forward_jacobian(self_nn, q0 + dq)
    est = float(y0[0]) + float(jac[0] @ dq)
    assert abs((est - float(y1[0])) / float(y1[0])) * 100 < 5


def test_self_nn_forward_consistency(self_nn):
    q = jnp.array([0.1, -0.2, 0.3, -1.5, 0.2, 1.2, 0.5])
    y1 = cnn.mlp_forward(self_nn, q)
    y2, _ = cnn.mlp_forward_jacobian(self_nn, q)
    assert np.allclose(y1, y2)


def test_self_nn_jacobian_vs_autodiff(self_nn):
    import jax
    q = jnp.array([0.1, -0.2, 0.3, -1.5, 0.2, 1.2, 0.5])
    _, jac = cnn.mlp_forward_jacobian(self_nn, q)
    jac_ad = jax.jacrev(lambda qq: cnn.mlp_forward(self_nn, qq))(q)
    assert np.allclose(jac, jac_ad, atol=1e-10)


def test_env_nn_shapes_and_linearization(env_nn):
    q = jnp.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4])
    obs = jnp.array([0.5, 0.0, 0.5])
    x = jnp.concatenate([q, obs])
    y, jac = cnn.mlp_forward_jacobian(env_nn, x)
    assert y.shape == (9,) and jac.shape == (9, 10)
    dx = jnp.ones(10) * 0.005
    y1, _ = cnn.mlp_forward_jacobian(env_nn, x + dx)
    est = np.asarray(y) + np.asarray(jac @ dx)
    err = np.abs(est - np.asarray(y1)) / np.maximum(np.abs(np.asarray(y1)), 1.0)
    assert np.max(err) < 0.05
