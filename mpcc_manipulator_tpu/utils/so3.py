"""SO(3) primitives in JAX: hat/vee, Log, Exp, right-Jacobian inverse.

Functional equivalents of the reference helpers ``getSkewMatrix`` /
``getInverseSkewVector`` / ``LogMatrix`` / ``ExpMatrix``
(`cpp/src/Spline/cubic_spline_rot.cpp:25-95`).  All branches are expressed as
``jnp.where`` with NaN-safe arguments so the functions are jit/vmap/grad
friendly on TPU (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (so(3) hat operator)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat` (reads the lower-triangular components)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def log_rot(r: jnp.ndarray) -> jnp.ndarray:
    """Matrix logarithm of a rotation, returned as a skew matrix.

    Three-branch structure mirrors the reference ``LogMatrix``:
    identity (theta ~ 0), generic, and theta ~ pi.  The pi branch extracts
    the rotation axis from the diagonal of ``R`` (well-conditioned) instead
    of the reference's eigen-decomposition — same mathematical result.
    """
    tr = jnp.trace(r)
    cos_th = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    # arccos via atan2: jnp.arccos is low-precision (~5e-8 abs error) on this
    # XLA build; atan2/sqrt are exact to ~1 ulp.
    th = jnp.arctan2(jnp.sqrt(jnp.clip(1.0 - cos_th * cos_th, 0.0, None)), cos_th)

    # generic branch: th/(2 sin th) (R - R^T), with safe sin
    sin_th = jnp.sin(th)
    safe_sin = jnp.where(jnp.abs(sin_th) < _EPS, 1.0, sin_th)
    generic = 0.5 * th / safe_sin * (r - r.T)

    # near-identity branch: Log(R) ~ (R - R^T)/2
    near_id = 0.5 * (r - r.T)

    # near-pi branch: R ~ I + 2 hat(a)^2 -> a_i = sqrt((R_ii+1)/2); recover
    # signs from the off-diagonal sums R_ij + R_ji = 2 a_i a_j.
    diag = jnp.diagonal(r)
    a_abs = jnp.sqrt(jnp.clip((diag + 1.0) / 2.0, 0.0, None))
    # pick the largest component as the sign anchor
    k = jnp.argmax(a_abs)
    one = jnp.ones((), dtype=r.dtype)
    signs = jnp.sign(jnp.where(
        jnp.arange(3) == k,
        jnp.ones(3, dtype=r.dtype),
        (r[k] + r[:, k]) / 2.0,
    ))
    # sign() of 0 is 0; fall back to +1 there so axis stays unit-norm
    signs = jnp.where(signs == 0, one, signs)
    axis = a_abs * signs
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), _EPS)
    near_pi = hat(axis * th)

    out = jnp.where(th < 1e-6, near_id, generic)
    out = jnp.where(jnp.pi - th < 1e-4, near_pi, out)
    return out


def log_rot_vec(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (axis*angle) logarithm: ``vee(log_rot(R))``."""
    return vee(log_rot(r))


def exp_rot(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential of a rotation vector ``omega`` (3,)."""
    th2 = jnp.dot(omega, omega)
    th = jnp.sqrt(th2)
    k = hat(omega)
    k2 = k @ k
    safe_th = jnp.where(th < _EPS, 1.0, th)
    # sin(th)/th and (1-cos th)/th^2 with Taylor fallbacks at 0
    a = jnp.where(th < _EPS, 1.0 - th2 / 6.0, jnp.sin(safe_th) / safe_th)
    b = jnp.where(th < _EPS, 0.5 - th2 / 24.0, (1.0 - jnp.cos(safe_th)) / (safe_th * safe_th))
    return jnp.eye(3, dtype=omega.dtype) + a * k + b * k2


def _jr_inv_with_coef(phi: jnp.ndarray, sign: float) -> jnp.ndarray:
    n2 = jnp.dot(phi, phi)
    n = jnp.sqrt(n2)
    k = hat(phi)
    safe_n = jnp.where(n < _EPS, 1.0, n)
    safe_n2 = jnp.where(n < _EPS, 1.0, n2)
    sin_n = jnp.sin(safe_n)
    safe_sin = jnp.where(jnp.abs(sin_n) < _EPS, 1.0, sin_n)
    coef = 1.0 / safe_n2 + sign * (1.0 + jnp.cos(safe_n)) / (2.0 * safe_n * safe_sin)
    jr_inv = jnp.eye(3, dtype=phi.dtype) + 0.5 * k + coef * (k @ k)
    return jnp.where(n < _EPS, jnp.eye(3, dtype=phi.dtype), jr_inv)


def right_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of the SO(3) right Jacobian at rotation vector ``phi``:

        J_r^{-1} = I + 1/2 hat(phi)
                   + (1/th^2 - (1+cos th)/(2 th sin th)) hat(phi)^2

    (satisfies d/dt Log(R Exp(t w))|_0 = J_r^{-1}(Log R) w; verified by
    finite differences in tests), with identity fallback for th < 1e-8.
    """
    return _jr_inv_with_coef(phi, -1.0)


def right_jacobian_inverse_ref(phi: jnp.ndarray) -> jnp.ndarray:
    """The *reference implementation's* variant (`cost.cpp:186-189`), which
    uses a ``+`` where the exact formula has ``-``.  Mathematically inexact
    (the heading-cost linearization it produces is only approximate), kept
    verbatim for trajectory conformance with the C++ engine; the SQP's
    Gauss-Newton + line search structure tolerates the inexact model.
    """
    return _jr_inv_with_coef(phi, +1.0)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def rot_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (x, y, z, w), w >= 0 branch-free."""
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best via where
    qw = jnp.sqrt(jnp.clip(1.0 + tr, 0.0, None)) / 2.0
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 0.0, None)) / 2.0
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 0.0, None)) / 2.0
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 0.0, None)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qx, qy, qz, qw])
    return q / jnp.linalg.norm(q)
