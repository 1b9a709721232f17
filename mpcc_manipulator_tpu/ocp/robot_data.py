"""Per-knot kinematic/NN linearization cache ("RobotData").

Functional equivalent of the reference ``RobotData`` struct
(`cpp/include/Model/robot_data.h:11-94`): everything the QP assembly needs
about the robot at one joint configuration — EE pose, Jacobians,
manipulability + gradient, self-collision distance + gradient, per-link
env-collision distances + Jacobian.

Faithful semantic detail: the reference computes this **once per MPC tick**
at the warm-start guess (`OsqpInterface::setInitialGuess`,
`osqp_interface.cpp:110-122`) and the SQP loop / line search then reuse the
stale cache while s, vs, u keep moving.  We reproduce exactly that: one
batched evaluation over the (N+1) horizon knots per tick, outside the SQP
while-loop.  On TPU the whole horizon (or scenarios x knots) is one fused
batch of FK chains and NN matmuls.

System dispatch: the cache is shape-generic over :class:`~..system.System`
(all gradient fields sized ``(dof,)``).  For the mobile platform:

* self-collision depends only on the arm joints — base columns of the
  gradient are zero;
* the env-collision MLP was trained with the obstacle in the arm base frame
  (`EnvCollisionModel.cpp`, input ``[q(7); obs_pos(3)]``), so the world
  obstacle is transformed into the moving base frame and the distance
  Jacobian w.r.t. the base coordinates follows by the chain rule through
  that transform;
* singularity handling (reward + constraint) uses the **arm** manipulability
  ``m(q_arm)``, not the full 6 x 10 Jacobian's: the full-Jacobian volume grows
  without bound in base displacement (the yaw column's lever arm is
  ``|p_ee - p_base|``), which (a) makes the reward an unbounded objective the
  optimizer pumps through null-space motion (verified: closed-loop runaway —
  base retreating at its rate limit while an arm joint swings to inflate
  ``m``), and (b) means the singularity *constraint* would never bind,
  defeating its purpose of keeping the arm away from wrist singularities.
  Arm manipulability is rotation-invariant, so evaluating it in the arm base
  frame is exact.  Gradient by exact AD, zero on base columns (there is no
  reference FD behavior to conform to — the mobile system is dormant in the
  reference, `robot_model.cpp:321-352`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import collision_nn as cnn
from ..models import kinematics as kin
from ..models import kinematics_mobile as kinm
from ..system import PANDA, System


@struct.dataclass
class RobotData:
    """Batched over a leading knot axis when produced by :func:`compute_robot_data`."""

    q: jnp.ndarray            # (..., dof)
    ee_pos: jnp.ndarray       # (..., 3)
    ee_rot: jnp.ndarray       # (..., 3, 3)
    jv: jnp.ndarray           # (..., 3, dof)
    jw: jnp.ndarray           # (..., 3, dof)
    manipul: jnp.ndarray      # (...,)
    d_manipul: jnp.ndarray    # (..., dof)
    sel_dist: jnp.ndarray     # (...,)  [cm]
    d_sel_dist: jnp.ndarray   # (..., dof)
    env_dist: jnp.ndarray     # (..., num_links) [cm]
    d_env_dist: jnp.ndarray   # (..., num_links, dof)
    obs_radius: jnp.ndarray   # scalar (broadcast)


def _single_knot(q, obs_pos, sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                 mani_grad: str = "fd", nn_mm_dtype=None):
    p_ee, r_ee, origins, axes = kin.fk_chain(q)
    jv = jnp.cross(axes, p_ee[None, :] - origins).T
    jw = axes.T
    if mani_grad == "analytic":
        # closed-form dm/dq sharing this FK pass (exact; == AD to roundoff)
        manipul, d_manipul = kin.manipulability_and_grad_from_frames(
            p_ee, origins, axes)
    else:
        manipul = kin.manipulability(q)
        d_manipul = (kin.manipulability_gradient_fd(q) if mani_grad == "fd"
                     else kin.manipulability_gradient_ad(q))
    sel, d_sel = cnn.mlp_forward_jacobian(sel_nn, q, mm_dtype=nn_mm_dtype)
    env_in = jnp.concatenate([q, obs_pos])
    env, d_env_full = cnn.mlp_forward_jacobian(env_nn, env_in,
                                               mm_dtype=nn_mm_dtype)
    # reference slices the env Jacobian to the joint columns (`robot_data.h:85`)
    d_env = d_env_full[:, :q.shape[0]]
    return p_ee, r_ee, jv, jw, manipul, d_manipul, sel[0], d_sel[0], env, d_env


def _single_knot_mobile(q_m, obs_pos, sel_nn: cnn.MLPParams,
                        env_nn: cnn.MLPParams, nn_mm_dtype=None):
    """10-DOF variant: q_m = [x_b, y_b, th_b, q1..q7]."""
    dtype = q_m.dtype
    base, q = kinm.split_q(q_m)
    rb, pb = kinm._base_transform(base)
    p_ee = kinm.ee_position(q_m)
    r_ee = kinm.ee_orientation(q_m)
    j = kinm.ee_jacobian(q_m)
    jv, jw = j[:3], j[3:]
    # arm-only manipulability (see module docstring); zero base gradient
    manipul = kin.manipulability(q)
    d_manipul = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), kin.manipulability_gradient_ad(q)])

    # self-collision: arm joints only; base columns zero
    sel, d_sel_arm = cnn.mlp_forward_jacobian(sel_nn, q, mm_dtype=nn_mm_dtype)
    d_sel = jnp.concatenate([jnp.zeros(3, dtype=dtype), d_sel_arm[0]])

    # env-collision: obstacle expressed in the (moving) arm base frame
    rel = obs_pos - pb
    obs_local = rb.T @ rel
    env_in = jnp.concatenate([q, obs_local])
    env, d_env_full = cnn.mlp_forward_jacobian(env_nn, env_in,
                                               mm_dtype=nn_mm_dtype)
    d_env_q = d_env_full[:, :q.shape[0]]
    d_env_o = d_env_full[:, q.shape[0]:]          # (links, 3) wrt obs_local
    # chain rule: d obs_local/d(x_b, y_b, th_b)
    th = base[2]
    c, s = jnp.cos(th), jnp.sin(th)
    drt_dth = jnp.array([[-s, c, 0.0], [-c, -s, 0.0], [0.0, 0.0, 0.0]],
                        dtype=dtype)              # d(R^T)/dth
    d_obs_local = jnp.concatenate(
        [-rb.T[:, :2], (drt_dth @ rel)[:, None]], axis=1)   # (3, 3)
    d_env_base = d_env_o @ d_obs_local            # (links, 3)
    d_env = jnp.concatenate([d_env_base, d_env_q], axis=1)  # (links, dof)
    return p_ee, r_ee, jv, jw, manipul, d_manipul, sel[0], d_sel, env, d_env


def _nn_knot(q, obs_pos, sel_nn, env_nn, system: System, nn_mm_dtype=None):
    """The NN half of one knot (self/env distances + Jacobians) — real
    matmuls; stays XLA regardless of the kinematics backend."""
    dtype = q.dtype
    if system.base_dof == 0:
        sel, d_sel = cnn.mlp_forward_jacobian(sel_nn, q,
                                              mm_dtype=nn_mm_dtype)
        env, d_env_full = cnn.mlp_forward_jacobian(
            env_nn, jnp.concatenate([q, obs_pos]), mm_dtype=nn_mm_dtype)
        return sel[0], d_sel[0], env, d_env_full[:, :q.shape[0]]
    base, q_arm = kinm.split_q(q)
    rb, pb = kinm._base_transform(base)
    sel, d_sel_arm = cnn.mlp_forward_jacobian(sel_nn, q_arm,
                                              mm_dtype=nn_mm_dtype)
    d_sel = jnp.concatenate([jnp.zeros(3, dtype=dtype), d_sel_arm[0]])
    rel = obs_pos - pb
    obs_local = rb.T @ rel
    env, d_env_full = cnn.mlp_forward_jacobian(
        env_nn, jnp.concatenate([q_arm, obs_local]), mm_dtype=nn_mm_dtype)
    d_env_q = d_env_full[:, :q_arm.shape[0]]
    d_env_o = d_env_full[:, q_arm.shape[0]:]
    th = base[2]
    c, s = jnp.cos(th), jnp.sin(th)
    drt_dth = jnp.array([[-s, c, 0.0], [-c, -s, 0.0], [0.0, 0.0, 0.0]],
                        dtype=dtype)
    d_obs_local = jnp.concatenate(
        [-rb.T[:, :2], (drt_dth @ rel)[:, None]], axis=1)
    d_env = jnp.concatenate([d_env_o @ d_obs_local, d_env_q], axis=1)
    return sel[0], d_sel, env, d_env


def compute_robot_data(qs: jnp.ndarray, obs_pos: jnp.ndarray, obs_radius,
                       sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                       mani_grad: str = "fd",
                       system: System = PANDA,
                       kin_backend: str = "xla",
                       kin_interpret: bool | None = None,
                       nn_mm_dtype: str | None = None) -> RobotData:
    """Evaluate the full cache for a batch of joint configurations.

    ``qs``: (K, dof) — typically K = N+1 horizon knots.  The obstacle is
    shared across knots (the reference passes one obstacle per tick,
    `osqp_interface.cpp:102-108`).

    ``kin_backend="pallas"`` computes the kinematic half (FK, point
    Jacobian, manipulability + analytic gradient) in the fused lane-batch
    kernel (`ops/pallas_kinematics.py`) and only the NN half in XLA.

    ``nn_mm_dtype="bfloat16"`` runs the collision-NN GEMMs in bf16 with
    f32 accumulation (MXU mixed precision) — measured A/B drift and the
    default decision are recorded in docs/ARCHITECTURE.md and
    tests/test_nn_bf16.py.
    """
    if kin_backend == "pallas":
        if system.base_dof == 0 and mani_grad != "analytic":
            raise ValueError(
                "kin_backend='pallas' implements the analytic manipulability"
                " gradient only; set mani_grad='analytic' (or kin_backend="
                "'xla' for the fd/ad variants)")
        from ..ops.pallas_kinematics import kin_sweep
        p_ee, r_ee, jv, jw, mani, d_mani = kin_sweep(
            qs, system=system, interpret=kin_interpret)
        sel, d_sel, env, d_env = jax.vmap(
            lambda q: _nn_knot(q, obs_pos, sel_nn, env_nn, system,
                               nn_mm_dtype))(qs)
        return RobotData(
            q=qs, ee_pos=p_ee, ee_rot=r_ee, jv=jv, jw=jw,
            manipul=mani, d_manipul=d_mani,
            sel_dist=sel, d_sel_dist=d_sel,
            env_dist=env, d_env_dist=d_env,
            obs_radius=jnp.asarray(obs_radius, dtype=qs.dtype),
        )
    if system.base_dof == 0:
        f = jax.vmap(lambda q: _single_knot(q, obs_pos, sel_nn, env_nn,
                                            mani_grad, nn_mm_dtype))
    else:
        f = jax.vmap(lambda q: _single_knot_mobile(q, obs_pos, sel_nn, env_nn,
                                                   nn_mm_dtype))
    p_ee, r_ee, jv, jw, mani, d_mani, sel, d_sel, env, d_env = f(qs)
    return RobotData(
        q=qs, ee_pos=p_ee, ee_rot=r_ee, jv=jv, jw=jw,
        manipul=mani, d_manipul=d_mani,
        sel_dist=sel, d_sel_dist=d_sel,
        env_dist=env, d_env_dist=d_env,
        obs_radius=jnp.asarray(obs_radius, dtype=qs.dtype),
    )


def index_robot_data(rb: RobotData, k) -> RobotData:
    """Select knot ``k`` from a batched RobotData (obs_radius stays scalar)."""
    return RobotData(
        q=rb.q[k], ee_pos=rb.ee_pos[k], ee_rot=rb.ee_rot[k],
        jv=rb.jv[k], jw=rb.jw[k], manipul=rb.manipul[k],
        d_manipul=rb.d_manipul[k], sel_dist=rb.sel_dist[k],
        d_sel_dist=rb.d_sel_dist[k], env_dist=rb.env_dist[k],
        d_env_dist=rb.d_env_dist[k], obs_radius=rb.obs_radius,
    )
