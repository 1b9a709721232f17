"""Unrolled small-matrix linear algebra for TPU hot loops.

``jnp.linalg.cholesky`` / ``cho_solve`` lower to LAPACK-style custom calls
that are latency-bound on TPU for tiny operands (the 8x8 input-Hessian
factorizations inside the Riccati sweep run 10 stages x ~10 IPM Newton
steps x SQP iterations per solve — hundreds of custom-call launches per
tick).  These unrolled versions are plain elementwise/broadcast ops on the
batch dimensions: XLA fuses an entire factor+solve into a handful of
kernels, and they vmap/shard transparently.

Numerical contract (matches the custom-call behavior the solver relies on):
``cholesky_small`` uses ``sqrt`` directly, so a non-positive-definite input
produces NaNs that propagate into the gains — the IPM's divergence guard
(`solver/qp_ipm.py`) depends on that signal.  No pivoting (inputs are
regularized PSD by construction, mirroring `osqp_interface.cpp:454-473`'s
LLT-as-PD-check semantics).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(a: jnp.ndarray, n: int) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of ``a`` (..., n, n), unrolled.

    Outer-product (Schur-complement) form: n steps, each one sqrt, one
    scaled column, and one rank-1 trailing update — vector/matrix shaped
    ops with a short critical path (vs the scalar triple loop of the
    textbook form).  ``n`` must be a static Python int (intended n <= ~24).
    NaN on non-positive-definite input (sqrt of a negative pivot), like
    ``jnp.linalg.cholesky``.
    """
    cols = []
    m = a
    zero_head = 0
    for j in range(n):
        d = jnp.sqrt(m[..., 0, 0])                       # NaN if pivot < 0
        col = m[..., :, 0] / d[..., None]                # (..., n-j), col[0]=d
        if zero_head:
            pad = jnp.zeros(a.shape[:-2] + (zero_head,), dtype=a.dtype)
            cols.append(jnp.concatenate([pad, col], axis=-1))
        else:
            cols.append(col)
        if j < n - 1:
            sub = col[..., 1:]
            m = m[..., 1:, 1:] - sub[..., :, None] * sub[..., None, :]
        zero_head += 1
    return jnp.stack(cols, axis=-1)


def cho_solve_small(l: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve ``A x = b`` given ``l = cholesky_small(A)``; unrolled.

    ``b`` may be (..., n) or (..., n, m); the solve broadcasts over leading
    batch dims and the trailing RHS dim.
    """
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution  L y = b  (column-oriented: one vector
    # multiply-subtract per step instead of scalar inner loops)
    y = []
    r = b
    for i in range(n):
        yi = r[..., 0, :] / l[..., i, i, None]
        y.append(yi)
        if i < n - 1:
            r = r[..., 1:, :] - l[..., i + 1:, i, None] * yi[..., None, :]
    # back substitution  L^T x = y
    x = [None] * n
    r = jnp.stack(y, axis=-2)
    for i in reversed(range(n)):
        xi = r[..., i, :] / l[..., i, i, None]
        x[i] = xi
        if i > 0:
            r = r[..., :i, :] - l[..., i, :i, None] * xi[..., None, :]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_psd_small(a: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """``A^{-1} b`` for PSD ``a`` (..., n, n) via the unrolled factor+solve."""
    return cho_solve_small(cholesky_small(a, n), b, n)
