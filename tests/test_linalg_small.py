"""Unrolled small-matrix Cholesky/solve vs the LAPACK-backed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.utils.linalg_small import (
    cho_solve_small, cholesky_small, solve_psd_small)


@pytest.mark.parametrize("n", [1, 3, 8, 17])
def test_cholesky_matches_lapack(n):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((5, n, n))
    a = jnp.asarray(m @ m.transpose(0, 2, 1) + n * np.eye(n))
    l_ref = jnp.linalg.cholesky(a)
    l = cholesky_small(a, n)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("rhs_shape", [(), (4,)])
def test_cho_solve_matches(rhs_shape):
    n = 8
    rng = np.random.default_rng(1)
    m = rng.standard_normal((3, n, n))
    a = jnp.asarray(m @ m.transpose(0, 2, 1) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal((3, n) + rhs_shape))
    x = solve_psd_small(a, b, n)
    if rhs_shape:
        ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    else:
        ref = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9, atol=1e-10)


def test_non_pd_produces_nan():
    """The IPM divergence guard relies on NaN propagation for non-PD input."""
    a = jnp.asarray(np.diag([1.0, -1.0, 2.0]))
    l = cholesky_small(a, 3)
    assert np.isnan(np.asarray(l)).any()


def test_vmap_and_jit():
    n = 8
    rng = np.random.default_rng(2)
    m = rng.standard_normal((16, n, n))
    a = jnp.asarray(m @ m.transpose(0, 2, 1) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal((16, n, 17)))
    f = jax.jit(jax.vmap(lambda a, b: solve_psd_small(a, b, n)))
    x = f(a, b)
    ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9, atol=1e-10)
