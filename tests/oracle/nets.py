"""Collision MLPs — independent numpy forward + analytic input Jacobian.

Mirrors `SelfCollisionModel.cpp:75-250` / `EnvCollisionModel.cpp:75-247`:
"NeRF" encoding ``[x, sin x, cos x]``, ReLU hidden layers, linear output,
Jacobian accumulated layer-by-layer through the ReLU masks and the encoder
Jacobian.  Weights are loaded from the repo's cached ``.npz`` (numerically
identical to the reference's text files; they are data, not code).

Self-collision: 7 -> [256, 64] -> 1 (min link-link distance, cm).
Env-collision: 10 ([q; obs_pos]) -> [256]x4 -> 9 (per-link distance, cm);
the consumer slices the Jacobian to the first 7 (q) columns
(`robot_data.h:85`).
"""

from __future__ import annotations

import os

import numpy as np

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "..", "assets", "nn")


class MLP:
    def __init__(self, npz_path: str):
        z = np.load(npz_path)
        n = len(z.files) // 2
        self.w = [np.asarray(z[f"weight_{i}"], dtype=np.float64) for i in range(n)]
        self.b = [np.asarray(z[f"bias_{i}"], dtype=np.float64) for i in range(n)]

    def value_and_jacobian(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        d = x.size
        enc = np.concatenate([x, np.sin(x), np.cos(x)])
        # encoder Jacobian (3d, d)
        j_enc = np.concatenate([np.eye(d), np.diag(np.cos(x)),
                                np.diag(-np.sin(x))], axis=0)
        h = enc
        jac = j_enc
        for i in range(len(self.w) - 1):
            z_i = self.w[i] @ h + self.b[i]
            mask = (z_i > 0.0).astype(np.float64)
            h = np.maximum(z_i, 0.0)
            jac = (mask[:, None] * self.w[i]) @ jac
        y = self.w[-1] @ h + self.b[-1]
        jac = self.w[-1] @ jac
        return y, jac


def load_self() -> MLP:
    return MLP(os.path.join(_ASSETS, "self.npz"))


def load_env() -> MLP:
    return MLP(os.path.join(_ASSETS, "env.npz"))
