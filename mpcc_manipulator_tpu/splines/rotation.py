"""SO(3) cubic "ease" spline on the rotation manifold.

Reproduces the reference ``CubicSplineRot`` (`cubic_spline_rot.cpp:137-259`):
per segment, ``R(t) = R_i Exp(log(R_i^T R_{i+1}) * (c dx^2 + d dx^3))`` with
``c = 3/h^2``, ``d = -2/h^3`` (zero boundary angular velocity per segment).

TPU-first: the per-segment relative rotation logs are precomputed once at fit
time (the reference recomputes ``LogMatrix`` on *every* evaluation,
`cubic_spline_rot.cpp:246-247`), so device evaluation is a gather + Rodrigues
exponential.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils import so3


def _np_log_rot_vec(r: np.ndarray) -> np.ndarray:
    """Host (numpy, float64) rotation log for fit-time precomputation."""
    tr = np.trace(r)
    if abs(tr + 1.0) < 1e-6:
        # angle ~ pi: extract axis from the symmetric part
        w, v = np.linalg.eigh((r + r.T) / 2.0)
        axis = v[:, np.argmax(w)]
        axis = axis / np.linalg.norm(axis)
        # reference convention (`cubic_spline_rot.cpp:63`): omega = -axis*pi
        return -axis * np.pi
    if abs(tr - 3.0) < 1e-6:
        return np.zeros(3)
    th = np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    m = th / (2.0 * np.sin(th)) * (r - r.T)
    return np.array([m[2, 1], m[0, 2], m[1, 0]])


@struct.dataclass
class RotSplineCoeffs:
    """Device-resident regular-knot SO(3) spline."""

    delta: jnp.ndarray    # knot spacing
    length: jnp.ndarray   # parameter of last knot
    r: jnp.ndarray        # (n, 3, 3) knot rotations
    omega: jnp.ndarray    # (n-1, 3) log(R_i^T R_{i+1}) rotation vectors
    c: jnp.ndarray        # (n-1,) = 3/h^2
    d: jnp.ndarray        # (n-1,) = -2/h^3

    @classmethod
    def from_knots(cls, x: np.ndarray, rotations: np.ndarray, dtype=jnp.float64):
        x = np.asarray(x, dtype=np.float64)
        rotations = np.asarray(rotations, dtype=np.float64)
        n = x.size
        h = np.diff(x)
        omega = np.stack([
            _np_log_rot_vec(rotations[i].T @ rotations[i + 1]) for i in range(n - 1)
        ])
        return cls(
            delta=jnp.asarray(float(x[1] - x[0]), dtype=dtype),
            length=jnp.asarray(float(x[-1]), dtype=dtype),
            r=jnp.asarray(rotations, dtype=dtype),
            omega=jnp.asarray(omega, dtype=dtype),
            c=jnp.asarray(3.0 / h ** 2, dtype=dtype),
            d=jnp.asarray(-2.0 / h ** 3, dtype=dtype),
        )


def _segment(sp: RotSplineCoeffs, s):
    s = jnp.clip(s, 0.0, sp.length)
    n = sp.r.shape[0]
    idx = jnp.clip(jnp.floor(s / sp.delta).astype(jnp.int32), 0, n - 2)
    dx = s - idx.astype(s.dtype) * sp.delta
    return s, idx, dx


def _select(sp: RotSplineCoeffs, i):
    """Gather (R_i flat, omega_i, c_i, d_i) via one one-hot contraction
    (see `cubic._select` — avoids serialized per-lane TPU gathers).

    ``i`` is a segment index (0..n-2), so only the first n-1 knot rotations
    can be selected — the table is built on the segment arrays.
    """
    m = sp.omega.shape[0]              # n - 1 segments
    oh = (jnp.arange(m) == i).astype(sp.omega.dtype)
    rows = jnp.concatenate([
        sp.r[:m].reshape(m, 9), sp.omega,
        sp.c[:, None], sp.d[:, None]], axis=1)            # (m, 14)
    sel = oh @ rows
    return sel[:9].reshape(3, 3), sel[9:12], sel[12], sel[13]


def rot_spline_value(sp: RotSplineCoeffs, s) -> jnp.ndarray:
    """R(s); at the endpoint returns the final knot rotation exactly."""
    s, i, dx = _segment(sp, s)
    r_i, omega_i, c_i, d_i = _select(sp, i)
    blend = c_i * dx * dx + d_i * dx * dx * dx
    r_val = r_i @ so3.exp_rot(omega_i * blend)
    return jnp.where(s >= sp.length, sp.r[-1], r_val)


def rot_spline_derivative(sp: RotSplineCoeffs, s) -> jnp.ndarray:
    """dR/ds expressed as the angular-velocity vector (reference
    `CubicSplineRot::getDerivative`); 0 at the endpoint."""
    s, i, dx = _segment(sp, s)
    r_i, omega_i, c_i, d_i = _select(sp, i)
    dblend = 2.0 * c_i * dx + 3.0 * d_i * dx * dx
    der = omega_i * dblend
    return jnp.where(s >= sp.length, jnp.zeros_like(der), der)
