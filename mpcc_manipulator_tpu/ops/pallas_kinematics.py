"""Fused Pallas TPU kernel: FK + point Jacobian + manipulability gradient.

Why a kernel: the RobotData sweep costs ~2.75 ms/tick at batch 1024, and a
DCE-split measurement (r4) shows the collision-NN linearizations are NOT
the problem (0.43 ms — XLA folds them into full MXU GEMMs); the cost is
the kinematics: the FK chain, the 6x7 point Jacobian, and above all the
closed-form manipulability gradient (~2.3 ms — a (7,6,7) dJ/dq tensor, a
6x6 Cholesky solve, and hundreds of 3-vector ops, all tiny per-lane work
XLA dispatches as small-op soup).  This kernel computes exactly those
quantities with scenarios in lanes (BT = 128) and every 3-vector/3x3
intermediate as per-lane registers; the joint frame offsets are Python
constants, so multiplications with their 0/+-1 entries constant-fold at
trace time.

Scope split: the NN forward/Jacobian passes STAY in XLA (they are real
matmuls); `ocp/robot_data.py` composes the two when
``SQPConfig.kin_backend == "pallas"``.

Equivalence contract: f32 agreement with `kinematics.fk_chain` /
`ee_jacobian` / `manipulability_and_grad_from_frames` (and the mobile
composition in `kinematics_mobile`), tested in interpret mode
(tests/test_pallas_kinematics.py).  The manipulability gradient is the
ANALYTIC closed form — `compute_robot_data` rejects other `mani_grad`
settings on this backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.kinematics import _P_OFF, _P_POST, _R_OFF, _R_POST
from ..system import PANDA, System

BT = 128
_ARM_DOF = 7


# ---- per-lane 3-vector / 3x3 helpers (values are python lists of (B,)
# arrays so constant operands fold at trace time)


def _matmul_const(a, c):
    """[9 x (B,)] row-major 3x3 times a CONSTANT numpy 3x3 (zeros skipped,
    +-1 folded)."""
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                w = float(c[k][j] if isinstance(c, (list, tuple)) else c[k, j])
                if w == 0.0:
                    continue
                term = a[3 * i + k] if w == 1.0 else (
                    -a[3 * i + k] if w == -1.0 else a[3 * i + k] * w)
                acc = term if acc is None else acc + term
            out.append(acc if acc is not None else jnp.zeros_like(a[0]))
    return out


def _matvec_const(a, v):
    """[9 x (B,)] 3x3 times a CONSTANT numpy 3-vector."""
    out = []
    for i in range(3):
        acc = None
        for k in range(3):
            w = float(v[k])
            if w == 0.0:
                continue
            term = a[3 * i + k] if w == 1.0 else a[3 * i + k] * w
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(a[0]))
    return out


def _matmul_ll(a, b):
    """[9] x [9] per-lane 3x3 @ 3x3."""
    return [a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j]
            + a[3 * i + 2] * b[6 + j]
            for i in range(3) for j in range(3)]


def _matvec_ll(a, v):
    return [a[3 * i] * v[0] + a[3 * i + 1] * v[1] + a[3 * i + 2] * v[2]
            for i in range(3)]


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _arm_fk(q_cols):
    """Unrolled Panda FK from 7 per-lane joint angles.

    Returns (p_ee [3], r_ee [9], origins [7][3], axes [7][3]) — all lists
    of (B,) values, arm-base frame.  Mirrors `kinematics.fk_chain`.
    """
    z = jnp.zeros_like(q_cols[0])
    o = jnp.ones_like(q_cols[0])
    r = [o, z, z, z, o, z, z, z, o]
    p = [z, z, z]
    origins, axes = [], []
    for i in range(_ARM_DOF):
        pv = _matvec_const(r, _P_OFF[i])
        p = [p[0] + pv[0], p[1] + pv[1], p[2] + pv[2]]
        r = _matmul_const(r, _R_OFF[i])
        origins.append(list(p))
        axes.append([r[2], r[5], r[8]])
        # r = r @ Rz(q_i): col0' = c*col0 + s*col1; col1' = -s*col0 + c*col1
        c, s = jnp.cos(q_cols[i]), jnp.sin(q_cols[i])
        r = [r[0] * c + r[1] * s, -r[0] * s + r[1] * c, r[2],
             r[3] * c + r[4] * s, -r[3] * s + r[4] * c, r[5],
             r[6] * c + r[7] * s, -r[6] * s + r[7] * c, r[8]]
    pv = _matvec_const(r, _P_POST)
    p_ee = [p[0] + pv[0], p[1] + pv[1], p[2] + pv[2]]
    r_ee = _matmul_const(r, _R_POST)
    return p_ee, r_ee, origins, axes


def _mani_and_grad(p_ee, origins, axes):
    """Arm manipulability + analytic gradient from the FK frames.

    Mirrors `kinematics.manipulability_and_grad_from_frames`:
    m = sqrt(det(J J')), dm_i = m * sum(dJ_i o (A^-1 J)); Cholesky with the
    same trace-scaled damping/floors as `kinematics._cholesky6`, det via
    the same clamped-pivot recursion as `_det_psd6`.
    """
    f32 = p_ee[0].dtype
    eps = float(jnp.finfo(f32).eps)
    # J columns: [jv_j (3); jw_j (3)] per joint
    re = [[p_ee[c] - origins[j][c] for c in range(3)]
          for j in range(_ARM_DOF)]
    jv_cols = [_cross(axes[j], re[j]) for j in range(_ARM_DOF)]
    cols = [jv_cols[j] + axes[j] for j in range(_ARM_DOF)]   # 7 x [6]

    # A = J J' (6x6 symmetric)
    a = [[None] * 6 for _ in range(6)]
    for r_i in range(6):
        for c_i in range(r_i, 6):
            acc = cols[0][r_i] * cols[0][c_i]
            for j in range(1, _ARM_DOF):
                acc = acc + cols[j][r_i] * cols[j][c_i]
            a[r_i][c_i] = acc
            a[c_i][r_i] = acc

    # det via clamped-pivot recursion (kinematics._det_psd6)
    det = None
    m = [[a[i][j] for j in range(6)] for i in range(6)]
    for step in range(6):
        pivot = m[0][0]
        det = pivot if det is None else det * pivot
        if step < 5:
            safe = jnp.where(pivot > 1e-30, pivot, 1.0)
            n = len(m) - 1
            col = [m[1 + i][0] for i in range(n)]
            m = [[m[1 + i][1 + j] - col[i] * col[j] / safe
                  for j in range(n)] for i in range(n)]
    mani = jnp.sqrt(jnp.clip(det, 0.0, None))

    # damped Cholesky of A (kinematics._cholesky6 semantics)
    trace = a[0][0] + a[1][1] + a[2][2] + a[3][3] + a[4][4] + a[5][5]
    scale = trace / 6.0 + eps
    shift = 10.0 * eps * scale
    floor = eps * scale
    mm = [[a[i][j] + (shift if i == j else 0.0) for j in range(6)]
          for i in range(6)]
    l_mat = [[None] * 6 for _ in range(6)]
    for j in range(6):
        dgj = jnp.sqrt(jnp.maximum(mm[j][j], floor))
        for i in range(6):
            l_mat[i][j] = (mm[i][j] / dgj) if i >= j else None
        if j < 5:
            for i2 in range(j + 1, 6):
                for j2 in range(j + 1, 6):
                    mm[i2][j2] = mm[i2][j2] - l_mat[i2][j] * l_mat[j2][j]

    def cho_solve(rhs):
        """Solve (L L') x = rhs for one [6]-list rhs."""
        ys = []
        for i in range(6):
            acc = rhs[i]
            for j in range(i):
                acc = acc - l_mat[i][j] * ys[j]
            ys.append(acc / l_mat[i][i])
        xs = [None] * 6
        for i in reversed(range(6)):
            acc = ys[i]
            for j in range(i + 1, 6):
                acc = acc - l_mat[j][i] * xs[j]
            xs[i] = acc / l_mat[i][i]
        return xs

    ainv_cols = [cho_solve(cols[j]) for j in range(_ARM_DOF)]  # (A^-1 J)

    # dJ/dq_i contracted with A^-1 J (kinematics.jacobian_derivative)
    dm = []
    for i in range(_ARM_DOF):
        acc = None
        for j in range(_ARM_DOF):
            if i < j:
                zixzj = _cross(axes[i], axes[j])
                djv = _cross(zixzj, re[j])
                t2 = _cross(axes[i], re[j])
                t3 = _cross(axes[j], t2)
                djv = [djv[c] + t3[c] for c in range(3)]
                djw = zixzj
            else:
                djv = _cross(axes[j], jv_cols[i])
                djw = None
            term = (djv[0] * ainv_cols[j][0] + djv[1] * ainv_cols[j][1]
                    + djv[2] * ainv_cols[j][2])
            if djw is not None:
                term = term + (djw[0] * ainv_cols[j][3]
                               + djw[1] * ainv_cols[j][4]
                               + djw[2] * ainv_cols[j][5])
            acc = term if acc is None else acc + term
        dm.append(mani * acc)
    return mani, dm, jv_cols


def _kin_kernel(q_ref, pe_out, re_out, jv_out, jw_out, m_out, dm_out,
                *, dof, base_dof, nknots):
    for k in range(nknots):
        qk = q_ref[k]                        # (dof, B)
        q_cols = [qk[base_dof + i] for i in range(_ARM_DOF)]
        p_l, r_l, origins, axes = _arm_fk(q_cols)
        mani, dm_arm, jv_cols_l = _mani_and_grad(p_l, origins, axes)

        if base_dof == 0:
            p_ee, r_ee = p_l, r_l
            jv_cols = jv_cols_l
            jw_cols = axes
            dm = dm_arm
        else:
            xb, yb, th = qk[0], qk[1], qk[2]
            c, s = jnp.cos(th), jnp.sin(th)
            z = jnp.zeros_like(c)
            rb = [c, -s, z, s, c, z, z, z, jnp.ones_like(c)]
            p_rot = _matvec_ll(rb, p_l)
            p_ee = [p_rot[0] + xb, p_rot[1] + yb, p_rot[2]]
            r_ee = _matmul_ll(rb, r_l)
            # base columns: prismatic x/y, revolute z about the base origin
            # (cross(ez, p_ee - pb) = (-(pe-pb)_y, (pe-pb)_x, 0))
            jv_cols = [
                [jnp.ones_like(c), z, z],
                [z, jnp.ones_like(c), z],
                [-p_rot[1], p_rot[0], z],
            ] + [_matvec_ll(rb, jv_cols_l[j]) for j in range(_ARM_DOF)]
            ez = [z, z, jnp.ones_like(c)]
            jw_cols = ([[z, z, z], [z, z, z], ez]
                       + [_matvec_ll(rb, axes[j]) for j in range(_ARM_DOF)])
            dm = [z, z, z] + dm_arm

        pe_out[k] = jnp.stack(p_ee, axis=0)
        re_out[k] = jnp.stack(r_ee, axis=0)
        # (3, dof) row-major flatten
        jv_out[k] = jnp.stack(
            [jv_cols[j][r] for r in range(3) for j in range(dof)], axis=0)
        jw_out[k] = jnp.stack(
            [jw_cols[j][r] for r in range(3) for j in range(dof)], axis=0)
        m_out[k] = mani[None]
        dm_out[k] = jnp.stack(dm, axis=0)


@functools.partial(jax.jit, static_argnames=("system", "interpret"))
def _kin_batched(qs_b: jnp.ndarray, system: System = PANDA,
                 interpret: bool = False):
    """(b, K, dof) joint configs -> batched FK/Jacobian/manipulability."""
    b, nk, dof = qs_b.shape
    f32 = jnp.float32
    in_dtype = qs_b.dtype
    q_in = jnp.moveaxis(qs_b.astype(f32), 0, -1)       # (K, dof, b)

    b_pad = ((b + BT - 1) // BT) * BT
    if b_pad != b:
        q_in = jnp.concatenate(
            [q_in, jnp.repeat(q_in[..., :1], b_pad - b, axis=-1)], axis=-1)
    n_tiles = b_pad // BT

    def spec(a_shape):
        nlead = len(a_shape) - 1
        return pl.BlockSpec(a_shape[:-1] + (BT,),
                            lambda i, _n=nlead: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((nk, 3, b_pad), f32),          # p_ee
        jax.ShapeDtypeStruct((nk, 9, b_pad), f32),          # r_ee
        jax.ShapeDtypeStruct((nk, 3 * dof, b_pad), f32),    # jv
        jax.ShapeDtypeStruct((nk, 3 * dof, b_pad), f32),    # jw
        jax.ShapeDtypeStruct((nk, 1, b_pad), f32),          # manipul
        jax.ShapeDtypeStruct((nk, dof, b_pad), f32),        # d_manipul
    ]
    kern = functools.partial(_kin_kernel, dof=dof,
                             base_dof=system.base_dof, nknots=nk)
    pe, re, jv, jw, mani, dm = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[spec(q_in.shape)],
        out_shape=out_shapes,
        out_specs=[spec(s.shape) for s in out_shapes],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_in)

    ub = lambda a: jnp.moveaxis(a, -1, 0)[:b].astype(in_dtype)
    return (ub(pe), ub(re).reshape(b, nk, 3, 3),
            ub(jv).reshape(b, nk, 3, dof), ub(jw).reshape(b, nk, 3, dof),
            ub(mani)[..., 0], ub(dm))


_KIN_CACHE: dict = {}


def make_pallas_kinematics(system: System = PANDA, interpret: bool = False):
    """Build (and cache) the custom-vmap kinematics sweep for a system."""
    key = (system.name, interpret)
    if key in _KIN_CACHE:
        return _KIN_CACHE[key]

    @jax.custom_batching.custom_vmap
    def sweep(qs):
        outs = _kin_batched(qs[None], system, interpret)
        return jax.tree.map(lambda a: a[0], outs)

    @sweep.def_vmap
    def _vmap_rule(axis_size, in_batched, qs):
        qs_b = qs if in_batched[0] else jnp.broadcast_to(
            qs[None], (axis_size,) + qs.shape)
        outs = _kin_batched(qs_b, system, interpret)
        return outs, jax.tree.map(lambda _: True, outs)

    _KIN_CACHE[key] = sweep
    return sweep


def kin_sweep(qs: jnp.ndarray, system: System = PANDA,
              interpret: bool | None = None):
    """FK + 6xdof Jacobian + manipulability(+grad) for (K, dof) configs.

    Returns ``(p_ee (K,3), r_ee (K,3,3), jv (K,3,dof), jw (K,3,dof),
    manipul (K,), d_manipul (K,dof))`` — the kinematic half of RobotData.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return make_pallas_kinematics(system, interpret)(qs)
