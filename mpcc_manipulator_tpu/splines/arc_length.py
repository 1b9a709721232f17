"""6-D arc-length-parameterized track spline: fit, evaluation, projection.

Reproduces the reference ``ArcLengthSpline`` (`arc_length_spline.cpp:33-379`):

* fit (`fitSpline`, :213-253): chord-length parameterization -> irregular
  cubic fit (x, y, z + SO(3)) -> resample to N_SPLINE equidistant-s points ->
  recompute chord length -> refit -> resample -> final regular-knot fit.
  This is one-time setup and runs on the host in float64 numpy.
* evaluation: device-side gather + Horner via :mod:`.cubic` / :mod:`.rotation`.
* projection (`projectOnSpline`, :318-379): fully jittable — masked global
  argmin fallback guarded by ``max_dist_proj`` plus a fixed 20-iteration
  Newton refinement with the reference's early-exit and
  give-back-the-guess-on-non-convergence semantics.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import N_SPLINE
from ..utils import so3
from .cubic import (CubicSplineCoeffs, HostCubicSpline, spline_derivative,
                    spline_second_derivative, spline_value)
from .rotation import RotSplineCoeffs, _np_log_rot_vec, rot_spline_derivative, rot_spline_value


@struct.dataclass
class TrackSpline:
    """Device-resident 6-D track: three position channels + SO(3) channel,
    plus the raw resampled waypoints used by the projection fallback."""

    sx: CubicSplineCoeffs
    sy: CubicSplineCoeffs
    sz: CubicSplineCoeffs
    sr: RotSplineCoeffs
    wp: jnp.ndarray       # (N_SPLINE, 3) resampled waypoints
    s_knots: jnp.ndarray  # (N_SPLINE,)
    length: jnp.ndarray   # total arc length


# ------------------------------------------------------------------
# Fit pipeline (host, float64)
# ------------------------------------------------------------------


def _chord_length(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Cumulative straight-line distance (`compArcLength`, :66-87)."""
    d = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2 + np.diff(z) ** 2)
    return np.concatenate([[0.0], np.cumsum(d)])


class _HostRotSpline:
    """Host-side SO(3) ease spline over irregular knots (fit pipeline only)."""

    def __init__(self, s: np.ndarray, rotations: np.ndarray):
        self.s = np.asarray(s, dtype=np.float64)
        self.r = np.asarray(rotations, dtype=np.float64)
        h = np.diff(self.s)
        self.c = 3.0 / h ** 2
        self.d = -2.0 / h ** 3
        self.omega = np.stack([
            _np_log_rot_vec(self.r[i].T @ self.r[i + 1]) for i in range(len(h))
        ])

    def __call__(self, t: float) -> np.ndarray:
        t = float(np.clip(t, self.s[0], self.s[-1]))
        if t >= self.s[-1]:
            return self.r[-1]
        i = int(np.clip(np.searchsorted(self.s, t, side="right") - 1, 0, len(self.c) - 1))
        dx = t - self.s[i]
        blend = self.c[i] * dx ** 2 + self.d[i] * dx ** 3
        w = self.omega[i] * blend
        th = np.linalg.norm(w)
        k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        if th < 1e-12:
            e = np.eye(3) + k
        else:
            e = np.eye(3) + np.sin(th) / th * k + (1 - np.cos(th)) / th ** 2 * (k @ k)
        return self.r[i] @ e


def _resample(sx, sy, sz, sr, total_len: float, n: int):
    s_new = np.linspace(0.0, total_len, n)
    x = sx(s_new)
    y = sy(s_new)
    z = sz(s_new)
    r = np.stack([sr(si) for si in s_new])
    return s_new, x, y, z, r


def gen_6d_spline(x: np.ndarray, y: np.ndarray, z: np.ndarray,
                  rotations: np.ndarray, dtype=jnp.float64) -> TrackSpline:
    """Full double-pass fit (`fitSpline`): fit -> resample -> refit -> resample
    -> final regular-knot device spline."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    rotations = np.asarray(rotations, dtype=np.float64)

    # pass 1: chord-length fit + resample
    s1 = _chord_length(x, y, z)
    _, x1, y1, z1, r1 = _resample(
        HostCubicSpline(s1, x), HostCubicSpline(s1, y), HostCubicSpline(s1, z),
        _HostRotSpline(s1, rotations), float(s1[-1]), N_SPLINE)

    # pass 2: recompute arc length on the resampled path, refit, resample
    s2 = _chord_length(x1, y1, z1)
    s_reg, x2, y2, z2, r2 = _resample(
        HostCubicSpline(s2, x1), HostCubicSpline(s2, y1), HostCubicSpline(s2, z1),
        _HostRotSpline(s2, r1), float(s2[-1]), N_SPLINE)

    # final regular-knot fit on device coefficients
    return TrackSpline(
        sx=CubicSplineCoeffs.from_fit(s_reg, x2, dtype=dtype),
        sy=CubicSplineCoeffs.from_fit(s_reg, y2, dtype=dtype),
        sz=CubicSplineCoeffs.from_fit(s_reg, z2, dtype=dtype),
        sr=RotSplineCoeffs.from_knots(s_reg, r2, dtype=dtype),
        wp=jnp.asarray(np.stack([x2, y2, z2], axis=1), dtype=dtype),
        s_knots=jnp.asarray(s_reg, dtype=dtype),
        length=jnp.asarray(float(s_reg[-1]), dtype=dtype),
    )


def load_track_waypoints(file: str):
    """Load raw track waypoints from a reference-format JSON file
    (keys X/Y/Z/quat_X..quat_W, see `cpp/src/Params/track.cpp:19-53`)."""
    with open(file, "r") as f:
        js = json.load(f)
    x = np.asarray(js["X"], dtype=np.float64)
    y = np.asarray(js["Y"], dtype=np.float64)
    z = np.asarray(js["Z"], dtype=np.float64)
    quat = np.stack([js["quat_X"], js["quat_Y"], js["quat_Z"], js["quat_W"]], axis=1)
    quat = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    rot = np.asarray(so3.quat_to_rot(jnp.asarray(quat)))
    return x, y, z, rot


def shift_track_to(x, y, z, position):
    """Translate the path so it starts at ``position`` (`track.cpp:57-66`)."""
    return (x - x[0] + position[0], y - y[0] + position[1], z - z[0] + position[2])


# ------------------------------------------------------------------
# Device evaluation
# ------------------------------------------------------------------


def track_position(tr: TrackSpline, s) -> jnp.ndarray:
    return jnp.stack([
        spline_value(tr.sx, s), spline_value(tr.sy, s), spline_value(tr.sz, s)])


def track_derivative(tr: TrackSpline, s) -> jnp.ndarray:
    return jnp.stack([
        spline_derivative(tr.sx, s), spline_derivative(tr.sy, s),
        spline_derivative(tr.sz, s)])


def track_second_derivative(tr: TrackSpline, s) -> jnp.ndarray:
    return jnp.stack([
        spline_second_derivative(tr.sx, s), spline_second_derivative(tr.sy, s),
        spline_second_derivative(tr.sz, s)])


def track_orientation(tr: TrackSpline, s) -> jnp.ndarray:
    return rot_spline_value(tr.sr, s)


def track_orientation_derivative(tr: TrackSpline, s) -> jnp.ndarray:
    return rot_spline_derivative(tr.sr, s)


# ------------------------------------------------------------------
# Projection
# ------------------------------------------------------------------


def project_on_spline(tr: TrackSpline, s_guess, ee_pos, max_dist_proj) -> jnp.ndarray:
    """Arc-length projection of ``ee_pos`` near ``s_guess``.

    Faithful to `projectOnSpline` (:318-379) including its quirks:

    * if the current-point distance exceeds ``max_dist_proj``, restart from
      the nearest resampled waypoint whose ``|s - s_guess| <= max_dist_proj``
      (global nearest waypoint if none qualifies);
    * if the restart point is the track end, return the track end;
    * otherwise refine with up to 20 Newton steps on ``||p(s) - ee||^2``,
      returning at the first step change ``<= 1e-5`` — and returning the
      *original guess* if 20 iterations never converge.
    """
    pos0 = track_position(tr, s_guess)
    dist0 = jnp.linalg.norm(ee_pos - pos0)

    # --- waypoint fallback (data-parallel argmin over N_SPLINE points)
    d2 = jnp.sum((tr.wp - ee_pos[None, :]) ** 2, axis=1)
    valid = jnp.abs(tr.s_knots - s_guess) <= max_dist_proj
    masked = jnp.where(valid, d2, jnp.inf)
    s_masked = tr.s_knots[jnp.argmin(masked)]
    s_global = tr.s_knots[jnp.argmin(d2)]
    s_fallback = jnp.where(jnp.any(valid), s_masked, s_global)
    s_opt0 = jnp.where(dist0 >= max_dist_proj, s_fallback, s_guess)

    at_end = s_opt0 >= tr.length

    def newton_body(_, carry):
        s_cur, converged, s_result = carry
        p = track_position(tr, s_cur)
        dp = track_derivative(tr, s_cur)
        ddp = track_second_derivative(tr, s_cur)
        diff = p - ee_pos
        jac = 2.0 * jnp.dot(diff, dp)
        hess = 2.0 * jnp.dot(dp, dp) + 2.0 * jnp.dot(diff, ddp)
        s_new = jnp.clip(s_cur - jac / hess, 0.0, tr.length)
        step_converged = jnp.abs(s_cur - s_new) <= 1e-5
        newly = jnp.logical_and(~converged, step_converged)
        s_result = jnp.where(newly, s_new, s_result)
        converged = jnp.logical_or(converged, step_converged)
        s_cur = jnp.where(converged, s_cur, s_new)
        return s_cur, converged, s_result

    import jax
    _, converged, s_result = jax.lax.fori_loop(
        0, 20, newton_body, (s_opt0, jnp.asarray(False), s_opt0))
    s_newton = jnp.where(converged, s_result, s_guess)
    return jnp.where(at_end, tr.length, s_newton)
