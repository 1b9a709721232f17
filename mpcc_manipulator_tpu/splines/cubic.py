"""Natural cubic splines: host-side fit, device-side O(1) evaluation.

Design split (TPU-first): fitting happens once per track on the host in
float64 numpy (tridiagonal solve, `cubic_spline.cpp:65-130` math), producing
a :class:`CubicSplineCoeffs` pytree of per-segment Horner coefficients.
Evaluation on device is a gather + polynomial — fully vectorized, no search
(`cubic_spline.cpp:126-153` regular-knot fast path generalized).

Endpoint semantics replicate the reference exactly
(`cubic_spline.cpp:185-246`): at ``x == x_max`` the value is ``y[-1]``, the
first derivative is 0 and the second derivative is ``2*c[-1] = 0``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


def fit_natural_cubic(x: np.ndarray, y: np.ndarray):
    """Fit a natural cubic spline through ``(x, y)``; returns (a, b, c, d).

    Coefficients are per-knot arrays of length n (b, d zero-padded at the
    final knot) evaluating as ``y(t) = a_i + b_i dx + c_i dx^2 + d_i dx^3``
    with ``dx = t - x_i`` on segment i.  Standard tridiagonal algorithm.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    a = y.copy()
    b = np.zeros(n)
    c = np.zeros(n)
    d = np.zeros(n)
    h = np.diff(x)
    alpha = np.zeros(n)
    alpha[1:n - 1] = (3.0 / h[1:] * (a[2:] - a[1:n - 1])
                      - 3.0 / h[:-1] * (a[1:n - 1] - a[:n - 2]))
    l = np.ones(n)
    mu = np.zeros(n)
    z = np.zeros(n)
    for i in range(1, n - 1):
        l[i] = 2.0 * (x[i + 1] - x[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / l[i]
        z[i] = (alpha[i] - h[i - 1] * z[i - 1]) / l[i]
    for i in range(n - 2, -1, -1):
        c[i] = z[i] - mu[i] * c[i + 1]
        b[i] = (a[i + 1] - a[i]) / h[i] - h[i] * (c[i + 1] + 2.0 * c[i]) / 3.0
        d[i] = (c[i + 1] - c[i]) / (3.0 * h[i])
    return a, b, c, d


class HostCubicSpline:
    """Host-side (numpy) spline over arbitrary knots, used only during the
    one-time track fit pipeline (irregular chord-length knots)."""

    def __init__(self, x: np.ndarray, y: np.ndarray):
        self.x = np.asarray(x, dtype=np.float64)
        self.a, self.b, self.c, self.d = fit_natural_cubic(x, y)

    def _index(self, t: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.x, t, side="right") - 1
        return np.clip(idx, 0, self.x.size - 2)

    def __call__(self, t: np.ndarray) -> np.ndarray:
        t = np.clip(t, self.x[0], self.x[-1])
        i = self._index(t)
        dx = t - self.x[i]
        return self.a[i] + self.b[i] * dx + self.c[i] * dx ** 2 + self.d[i] * dx ** 3


@struct.dataclass
class CubicSplineCoeffs:
    """Device-resident regular-knot cubic spline (one scalar channel)."""

    delta: jnp.ndarray   # knot spacing
    length: jnp.ndarray  # x_max = x of last knot (x starts at 0)
    a: jnp.ndarray       # (n,)
    b: jnp.ndarray       # (n,)
    c: jnp.ndarray       # (n,)
    d: jnp.ndarray       # (n,)

    @classmethod
    def from_fit(cls, x: np.ndarray, y: np.ndarray, dtype=jnp.float64):
        a, b, c, d = fit_natural_cubic(x, y)
        delta = float(x[1] - x[0])
        return cls(
            delta=jnp.asarray(delta, dtype=dtype),
            length=jnp.asarray(float(x[-1]), dtype=dtype),
            a=jnp.asarray(a, dtype=dtype), b=jnp.asarray(b, dtype=dtype),
            c=jnp.asarray(c, dtype=dtype), d=jnp.asarray(d, dtype=dtype),
        )


def _segment(sp: CubicSplineCoeffs, s):
    """Clamped input, segment index, and local offset dx."""
    s = jnp.clip(s, 0.0, sp.length)
    n = sp.a.shape[0]
    idx = jnp.clip(jnp.floor(s / sp.delta).astype(jnp.int32), 0, n - 2)
    dx = s - idx.astype(s.dtype) * sp.delta
    return s, idx, dx


def _select(sp: CubicSplineCoeffs, i):
    """Gather (a, b, c, d) at segment ``i`` via a one-hot contraction.

    Batched (vmapped) evaluation turns this into one (B, n) x (n, 4) matmul
    instead of 4 per-lane scalar gathers — TPU gathers of single elements
    are serialized and dominate batched spline evaluation (~10x slower).
    Bit-exact with the gather: the contraction adds exact zeros.  The
    one-hot is shared across the x/y/z channel splines by CSE (same s,
    delta, so the same ``i``).
    """
    n = sp.a.shape[0]
    oh = (jnp.arange(n) == i).astype(sp.a.dtype)
    tbl = jnp.stack([sp.a, sp.b, sp.c, sp.d], axis=1)   # (n, 4)
    return oh @ tbl


def spline_value(sp: CubicSplineCoeffs, s):
    s, i, dx = _segment(sp, s)
    a, b, c, d = _select(sp, i)
    val = a + b * dx + c * dx * dx + d * dx * dx * dx
    return jnp.where(s >= sp.length, sp.a[-1], val)


def spline_derivative(sp: CubicSplineCoeffs, s):
    s, i, dx = _segment(sp, s)
    a, b, c, d = _select(sp, i)
    der = b + 2.0 * c * dx + 3.0 * d * dx * dx
    return jnp.where(s >= sp.length, jnp.zeros_like(der), der)


def spline_second_derivative(sp: CubicSplineCoeffs, s):
    s, i, dx = _segment(sp, s)
    a, b, c, d = _select(sp, i)
    sec = 2.0 * c + 6.0 * d * dx
    # reference endpoint branch returns 2*c[-1], which is 0 for natural splines
    return jnp.where(s >= sp.length, 2.0 * sp.c[-1], sec)
