"""Track evaluation + projection — independent numpy over fitted coefficients.

Consumes the regular-knot coefficient arrays of a fitted
``mpcc_manipulator_tpu.splines.arc_length.TrackSpline`` (pure data) and
re-implements evaluation, SO(3) interpolation, and the reference's
``projectOnSpline`` (`arc_length_spline.cpp:318-379`) with plain Python
loops; no production evaluation code is used.
"""

from __future__ import annotations

import numpy as np


def log_rot(r: np.ndarray) -> np.ndarray:
    """SO(3) log as a rotation vector (`cubic_spline_rot.cpp` LogMatrix),
    including the trace ~ -1 branch via the symmetric eigenvector."""
    tr = np.trace(r)
    cos_th = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos_th)
    if th < 1e-10:
        return np.zeros(3)
    if np.pi - th < 1e-6:
        # axis from the +1 eigenvector of (R + R^T)/2
        w_, v_ = np.linalg.eigh((r + r.T) / 2.0)
        axis = v_[:, np.argmax(w_)]
        # fix sign so that Exp(th*axis) ~ R
        if np.linalg.norm(exp_rot(th * axis) - r) > np.linalg.norm(
                exp_rot(-th * axis) - r):
            axis = -axis
        return th * axis
    w = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    return th / (2.0 * np.sin(th)) * w


def skew(w: np.ndarray) -> np.ndarray:
    return np.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]],
                     [-w[1], w[0], 0.0]])


def exp_rot(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    k = skew(w)
    if th < 1e-12:
        return np.eye(3) + k
    return (np.eye(3) + np.sin(th) / th * k
            + (1.0 - np.cos(th)) / th ** 2 * (k @ k))


class OracleTrack:
    """Numpy copy of the device spline coefficients."""

    def __init__(self, tr):
        self.delta = float(tr.sx.delta)
        self.length = float(tr.length)
        self.coef = {ch: tuple(np.asarray(getattr(tr, ch).__getattribute__(f),
                                          dtype=np.float64)
                               for f in ("a", "b", "c", "d"))
                     for ch in ("sx", "sy", "sz")}
        self.r_knots = np.asarray(tr.sr.r, dtype=np.float64)
        self.omega = np.asarray(tr.sr.omega, dtype=np.float64)
        self.rc = np.asarray(tr.sr.c, dtype=np.float64)
        self.rd = np.asarray(tr.sr.d, dtype=np.float64)
        self.wp = np.asarray(tr.wp, dtype=np.float64)
        self.s_knots = np.asarray(tr.s_knots, dtype=np.float64)

    # ---- scalar channels
    def _seg(self, s: float):
        s = min(max(s, 0.0), self.length)
        n = self.coef["sx"][0].size
        i = int(min(max(np.floor(s / self.delta), 0), n - 2))
        return s, i, s - i * self.delta

    def pos(self, s: float) -> np.ndarray:
        s, i, dx = self._seg(s)
        out = np.zeros(3)
        for ch_i, ch in enumerate(("sx", "sy", "sz")):
            a, b, c, d = self.coef[ch]
            if s >= self.length:
                out[ch_i] = a[-1]
            else:
                out[ch_i] = a[i] + b[i] * dx + c[i] * dx ** 2 + d[i] * dx ** 3
        return out

    def dpos(self, s: float) -> np.ndarray:
        s, i, dx = self._seg(s)
        out = np.zeros(3)
        for ch_i, ch in enumerate(("sx", "sy", "sz")):
            a, b, c, d = self.coef[ch]
            out[ch_i] = 0.0 if s >= self.length else (
                b[i] + 2.0 * c[i] * dx + 3.0 * d[i] * dx ** 2)
        return out

    def ddpos(self, s: float) -> np.ndarray:
        s, i, dx = self._seg(s)
        out = np.zeros(3)
        for ch_i, ch in enumerate(("sx", "sy", "sz")):
            a, b, c, d = self.coef[ch]
            out[ch_i] = (2.0 * c[-1] if s >= self.length
                         else 2.0 * c[i] + 6.0 * d[i] * dx)
        return out

    # ---- SO(3) channel
    def rot(self, s: float) -> np.ndarray:
        s, i, dx = self._seg(s)
        if s >= self.length:
            return self.r_knots[-1]
        blend = self.rc[i] * dx ** 2 + self.rd[i] * dx ** 3
        return self.r_knots[i] @ exp_rot(self.omega[i] * blend)

    def drot(self, s: float) -> np.ndarray:
        s, i, dx = self._seg(s)
        if s >= self.length:
            return np.zeros(3)
        return self.omega[i] * (2.0 * self.rc[i] * dx + 3.0 * self.rd[i] * dx ** 2)

    # ---- projection (`projectOnSpline`, arc_length_spline.cpp:318-379)
    def project(self, s_guess: float, ee_pos: np.ndarray,
                max_dist_proj: float) -> float:
        pos0 = self.pos(s_guess)
        s_opt = s_guess
        if np.linalg.norm(ee_pos - pos0) >= max_dist_proj:
            d2 = np.sum((self.wp - ee_pos[None, :]) ** 2, axis=1)
            valid = np.abs(self.s_knots - s_guess) <= max_dist_proj
            if np.any(valid):
                masked = np.where(valid, d2, np.inf)
                s_opt = self.s_knots[int(np.argmin(masked))]
            else:
                s_opt = self.s_knots[int(np.argmin(d2))]
        if s_opt >= self.length:
            return self.length
        s_cur = s_opt
        for _ in range(20):
            p = self.pos(s_cur)
            dp = self.dpos(s_cur)
            ddp = self.ddpos(s_cur)
            diff = p - ee_pos
            jac = 2.0 * float(diff @ dp)
            hess = 2.0 * float(dp @ dp) + 2.0 * float(diff @ ddp)
            s_new = min(max(s_cur - jac / hess, 0.0), self.length)
            if abs(s_cur - s_new) <= 1e-5:
                return s_new
            s_cur = s_new
        return s_guess   # non-convergence: give back the guess
