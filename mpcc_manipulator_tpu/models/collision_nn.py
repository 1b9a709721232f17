"""Learned collision-distance models: MLP forward + input Jacobian in JAX.

Capability parity with the reference networks
(`cpp/src/Constraints/SelfCollision/SelfCollisionModel.cpp:75-250`,
`EnvCollision/EnvCollisionModel.cpp`):

* self-collision:  q (7,)  -> min link-link distance [cm], layers 21->256->64->1
  with "NeRF" input encoding ``[x, sin x, cos x]``;
* env-collision:   [q (7,), obs_pos (3,)] -> per-link distance to a sphere
  obstacle [cm] (9 outputs), layers 30->256x4->9, same encoding.

The reference hand-rolls forward-mode Jacobian accumulation (~650 LoC of
layer-by-layer chain rule).  Here the same math is a handful of batched
matmuls: the Jacobian chain ``J_l = (relu'(z_l) * W_l) @ J_{l-1}`` maps
directly onto the MXU when vmapped over (scenarios x knots).  ReLU' uses the
``z > 0`` convention, matching the reference's ``ReLU_derivative``.

Weights load from the reference's plain-text parameter files
(``weight_i.txt`` / ``bias_i.txt``) or from a cached ``.npz``.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import PANDA_DOF, PANDA_NUM_LINKS


@struct.dataclass
class MLPParams:
    """Weights of one collision MLP (tuple-of-arrays pytree)."""

    weights: tuple  # tuple of (out, in) arrays
    biases: tuple   # tuple of (out,) arrays


def nerf_encode(x: jnp.ndarray) -> jnp.ndarray:
    """``[x, sin x, cos x]`` encoding (`SelfCollisionModel.cpp:143-151`)."""
    return jnp.concatenate([x, jnp.sin(x), jnp.cos(x)], axis=-1)


def _nerf_jacobian(x: jnp.ndarray) -> jnp.ndarray:
    """(3n, n) Jacobian of the NeRF encoding."""
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype)
    return jnp.concatenate([
        eye,
        jnp.diag(jnp.cos(x)),
        jnp.diag(-jnp.sin(x)),
    ], axis=0)


def _mm(a, b, mm_dtype):
    """Matmul with an optional reduced-precision MXU path.

    ``mm_dtype="bfloat16"`` casts both operands to bf16 and accumulates in
    float32 (``preferred_element_type``) — the TPU MXU's native mixed
    precision; result is cast back to the pipeline dtype.  ``None`` is the
    full-precision default (conformance mode).
    """
    if mm_dtype is None:
        return a @ b
    bd = jnp.dtype(mm_dtype)
    return jnp.matmul(a.astype(bd), b.astype(bd),
                      preferred_element_type=jnp.float32).astype(a.dtype)


def mlp_forward(params: MLPParams, x: jnp.ndarray, is_nerf: bool = True) -> jnp.ndarray:
    """Value-only forward pass (used by line-search-style cheap evals).

    Always full precision: the bf16 option (`nn_bf16`) exists for the hot
    per-tick Jacobian path only; this diagnostic path has no caller that
    would benefit."""
    h = nerf_encode(x) if is_nerf else x
    n_layer = len(params.weights)
    for i in range(n_layer - 1):
        h = jnp.maximum(params.weights[i] @ h + params.biases[i], 0.0)
    return params.weights[-1] @ h + params.biases[-1]


def mlp_forward_jacobian(params: MLPParams, x: jnp.ndarray, is_nerf: bool = True,
                         mm_dtype=None):
    """Forward pass + analytic input Jacobian.

    Returns ``(y (n_out,), dy/dx (n_out, n_in))``; values identical to the
    reference ``calculateMlpOutput`` chain-rule accumulation
    (`SelfCollisionModel.cpp:160-222`).  Accumulation direction is chosen by
    shape: reverse (output-side, like jacrev) when n_out < n_in-after-
    encoding, forward otherwise — for the 30-in/9-out env model reverse
    accumulation carries 9 rows instead of 30 columns through the four
    256-wide layers, ~3x fewer FLOPs (exact same Jacobian; matmul
    reassociation only).
    """
    h = nerf_encode(x) if is_nerf else x
    n_layer = len(params.weights)
    n_out = params.weights[-1].shape[0]
    n_enc = h.shape[-1]

    if n_out < n_enc:
        # reverse accumulation: propagate (n_out, width) from the output
        masks = []
        for i in range(n_layer - 1):
            z = _mm(params.weights[i], h, mm_dtype) + params.biases[i]
            masks.append((z > 0.0).astype(x.dtype))
            h = jnp.maximum(z, 0.0)
        y = _mm(params.weights[-1], h, mm_dtype) + params.biases[-1]
        jac = params.weights[-1]
        for i in reversed(range(n_layer - 1)):
            jac = _mm(jac * masks[i][None, :], params.weights[i], mm_dtype)
    else:
        # forward accumulation (reference direction)
        jac = jnp.eye(n_enc, dtype=x.dtype)
        for i in range(n_layer - 1):
            z = _mm(params.weights[i], h, mm_dtype) + params.biases[i]
            mask = (z > 0.0).astype(x.dtype)
            h = jnp.maximum(z, 0.0)
            jac = _mm(mask[:, None] * params.weights[i], jac, mm_dtype)
        y = _mm(params.weights[-1], h, mm_dtype) + params.biases[-1]
        jac = _mm(params.weights[-1], jac, mm_dtype)

    if is_nerf:
        jac = jac @ _nerf_jacobian(x)
    return y, jac


# ------------------------------------------------------------------
# Weight loading
# ------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_ASSET_NN_DIR = os.path.join(_REPO_ROOT, "assets", "nn")
_REFERENCE_NN_DIR = "/root/reference/cpp/NNmodel"

SELF_HIDDEN = (256, 64)
ENV_HIDDEN = (256, 256, 256, 256)


def _loadtxt(path: str) -> np.ndarray:
    """Flat float array from a text file — native fast parser when the
    runtime library is built, numpy fallback otherwise."""
    try:
        from ..runtime.native import parse_floats
        return parse_floats(path)
    except Exception:
        return np.loadtxt(path, dtype=np.float64).reshape(-1)


def _count_rows(path: str) -> int:
    with open(path, "r") as f:
        return sum(1 for line in f if line.strip())


def _load_txt_dir(directory: str, n_layers: int):
    ws, bs = [], []
    for i in range(n_layers):
        wfile = os.path.join(directory, f"weight_{i}.txt")
        rows = _count_rows(wfile)
        flat = _loadtxt(wfile)
        ws.append(flat.reshape(rows, -1))
        bs.append(np.atleast_1d(_loadtxt(os.path.join(directory, f"bias_{i}.txt"))))
    return ws, bs


def _load_npz(file: str, n_layers: int):
    data = np.load(file)
    ws = [data[f"weight_{i}"] for i in range(n_layers)]
    bs = [data[f"bias_{i}"] for i in range(n_layers)]
    return ws, bs


def _resolve_and_load(kind: str, n_layers: int):
    """Asset resolution: repo .npz cache -> reference text files."""
    npz = os.path.join(_ASSET_NN_DIR, f"{kind}.npz")
    if os.path.exists(npz):
        return _load_npz(npz, n_layers)
    txt_dir = os.path.join(_REFERENCE_NN_DIR, kind, "parameter")
    ws, bs = _load_txt_dir(txt_dir, n_layers)
    # cache to npz for standalone use
    os.makedirs(_ASSET_NN_DIR, exist_ok=True)
    np.savez(npz, **{f"weight_{i}": w for i, w in enumerate(ws)},
             **{f"bias_{i}": b for i, b in enumerate(bs)})
    return ws, bs


def _to_params(ws, bs, dtype) -> MLPParams:
    return MLPParams(
        weights=tuple(jnp.asarray(w, dtype=dtype) for w in ws),
        biases=tuple(jnp.asarray(b, dtype=dtype) for b in bs),
    )


def load_self_collision_nn(dtype=jnp.float64) -> MLPParams:
    """7-DOF self-collision min-distance model (output in cm)."""
    ws, bs = _resolve_and_load("self", len(SELF_HIDDEN) + 1)
    assert ws[0].shape == (SELF_HIDDEN[0], 3 * PANDA_DOF), ws[0].shape
    return _to_params(ws, bs, dtype)


def load_env_collision_nn(dtype=jnp.float64) -> MLPParams:
    """Per-link env-collision distance model: input [q(7), obs_pos(3)]."""
    ws, bs = _resolve_and_load("env", len(ENV_HIDDEN) + 1)
    assert ws[0].shape == (ENV_HIDDEN[0], 3 * (PANDA_DOF + 3)), ws[0].shape
    assert ws[-1].shape[0] == PANDA_NUM_LINKS
    return _to_params(ws, bs, dtype)
