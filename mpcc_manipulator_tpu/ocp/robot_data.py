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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import PANDA_DOF, PANDA_NUM_LINKS
from ..models import collision_nn as cnn
from ..models import kinematics as kin


@struct.dataclass
class RobotData:
    """Batched over a leading knot axis when produced by :func:`compute_robot_data`."""

    q: jnp.ndarray            # (..., 7)
    ee_pos: jnp.ndarray       # (..., 3)
    ee_rot: jnp.ndarray       # (..., 3, 3)
    jv: jnp.ndarray           # (..., 3, 7)
    jw: jnp.ndarray           # (..., 3, 7)
    manipul: jnp.ndarray      # (...,)
    d_manipul: jnp.ndarray    # (..., 7)
    sel_dist: jnp.ndarray     # (...,)  [cm]
    d_sel_dist: jnp.ndarray   # (..., 7)
    env_dist: jnp.ndarray     # (..., 9) [cm]
    d_env_dist: jnp.ndarray   # (..., 9, 7)
    obs_radius: jnp.ndarray   # scalar (broadcast)


def _single_knot(q, obs_pos, sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                 mani_grad: str = "fd"):
    p_ee, r_ee, origins, axes = kin.fk_chain(q)
    jv = jnp.cross(axes, p_ee[None, :] - origins).T
    jw = axes.T
    manipul = kin.manipulability(q)
    d_manipul = (kin.manipulability_gradient_fd(q) if mani_grad == "fd"
                 else kin.manipulability_gradient_ad(q))
    sel, d_sel = cnn.mlp_forward_jacobian(sel_nn, q)
    env_in = jnp.concatenate([q, obs_pos])
    env, d_env_full = cnn.mlp_forward_jacobian(env_nn, env_in)
    # reference slices the env Jacobian to the joint columns (`robot_data.h:85`)
    d_env = d_env_full[:, :PANDA_DOF]
    return p_ee, r_ee, jv, jw, manipul, d_manipul, sel[0], d_sel[0], env, d_env


def compute_robot_data(qs: jnp.ndarray, obs_pos: jnp.ndarray, obs_radius,
                       sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                       mani_grad: str = "fd") -> RobotData:
    """Evaluate the full cache for a batch of joint configurations.

    ``qs``: (K, 7) — typically K = N+1 horizon knots.  The obstacle is shared
    across knots (the reference passes one obstacle per tick,
    `osqp_interface.cpp:102-108`).
    """
    f = jax.vmap(lambda q: _single_knot(q, obs_pos, sel_nn, env_nn, mani_grad))
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
