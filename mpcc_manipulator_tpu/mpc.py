"""MPC orchestration: the full control tick as one jittable pure function.

Functional port of `MPC::runMPC_` (`cpp/src/MPC/mpc.cpp:104-190`):

  1. project s onto the track from the current EE position; recompute
     vs = (Jv dq) . t(s);
  2. invalidate the warm start if the projection jumped > max_dist_proj;
  3. warm start: shift horizon + RK4 rollout of the tail knot
     (`updateInitialGuess`) or cold start all-knots-at-x0
     (`generateNewInitialGuess`) — both computed, selected branch-free;
  4. one batched RobotData sweep over the N+1 knots (FK + NN linearization,
     frozen for the whole tick — reference semantics);
  5. SQP solve;
  6. status machine: 5-strike tolerance of MAX_ITER_EXCEEDED
     (`mpc.cpp:127-188`).

The carry (:class:`MPCCarry`) is the tick-to-tick state the reference keeps
in member variables.  ``mpc_step`` is pure: jit it once, ``vmap`` it over
scenario batches, ``shard_map`` it over a device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .models import collision_nn as cnn
from .models import dynamics as dyn
from .models import kinematics as kin
from .models import kinematics_mobile as kinm
from .ocp import qp_data
from .ocp.robot_data import compute_robot_data
from .params import MPCCParams, SQPConfig
from .solver import sqp as sqp_mod
from .splines import arc_length as als
from .splines.arc_length import TrackSpline
from .system import PANDA, System


@struct.dataclass
class MPCCarry:
    """Tick-to-tick solver state (reference `mpc.h:118-126`), plus the last
    QP primal/dual for cross-tick ADMM warm starts (speed-only extension)."""

    z_guess: jnp.ndarray           # (n_var,) last horizon (raw units)
    valid_guess: jnp.ndarray       # bool
    num_guess_failed: jnp.ndarray  # int32 consecutive-failure counter
    qp_x: jnp.ndarray              # (n_var,) last QP primal step
    qp_y: jnp.ndarray              # (n_constr,) last QP dual
    # cross-tick interior-point warm state (riccati paths, packed
    # (N+1, nc_stage) rows; all-ones = cold).  Consumed only when
    # SQPConfig.ipm_warm_start is set; reset on guess invalidation.
    ipm_s: jnp.ndarray
    ipm_lam: jnp.ndarray


@struct.dataclass
class MPCOutput:
    u0: jnp.ndarray          # (NU,) first optimal input
    x0_updated: jnp.ndarray  # (NX,) state with projected s / re-derived vs
    horizon_x: jnp.ndarray   # (N+1, NX)
    horizon_u: jnp.ndarray   # (N, NU)
    status: jnp.ndarray      # sqp_mod.Status code
    ok: jnp.ndarray          # bool: reference `runMPC_` return value
    sqp_iters: jnp.ndarray
    qp_iters: jnp.ndarray


def init_carry(dtype=jnp.float32, system: System = PANDA) -> MPCCarry:
    return MPCCarry(
        z_guess=jnp.zeros(system.n_var, dtype=dtype),
        valid_guess=jnp.asarray(False),
        num_guess_failed=jnp.asarray(0, dtype=jnp.int32),
        qp_x=jnp.zeros(system.n_var, dtype=dtype),
        qp_y=jnp.zeros(system.n_constr, dtype=dtype),
        ipm_s=jnp.ones((system.horizon + 1, system.nc_stage), dtype=dtype),
        ipm_lam=jnp.ones((system.horizon + 1, system.nc_stage), dtype=dtype),
    )


def _shift_warm_start(z: jnp.ndarray, x0: jnp.ndarray, ts,
                      system: System = PANDA) -> jnp.ndarray:
    """`updateInitialGuess` (`mpc.cpp:54-68`): shift knots down by one,
    pin knot 0 at x0, duplicate knot N-1, RK4-roll the new terminal knot."""
    n = system.horizon
    xs, us = qp_data.split_z(z, system)
    xs_s = jnp.concatenate([x0[None, :], xs[2:], xs[-1:]], axis=0)  # knots 0..N-1
    us_s = jnp.concatenate([us[1:], us[-1:]], axis=0)
    # replicate reference ordering: x[N-1] copies x[N-2] *after* the shift
    xs_s = xs_s.at[n - 1].set(xs_s[n - 2])
    us_s = us_s.at[n - 1].set(us_s[n - 2])
    x_term = dyn.rk4_step(xs_s[n - 1], us_s[n - 1], ts)
    xs_new = jnp.concatenate([xs_s[:n], x_term[None, :]], axis=0)
    return qp_data.join_z(xs_new, us_s)


def _cold_start(x0: jnp.ndarray, dtype, system: System = PANDA) -> jnp.ndarray:
    """`generateNewInitialGuess` (`mpc.cpp:79-89`)."""
    return jnp.concatenate([jnp.tile(x0, system.horizon + 1),
                            jnp.zeros(system.horizon * system.nu, dtype=dtype)])


def _unwrap_s(z: jnp.ndarray, length, system: System = PANDA) -> jnp.ndarray:
    """`unwrapInitialGuess`: clamp s of knots 1..N to [-inf, L] (the reference
    only applies the min against track length)."""
    xs, us = qp_data.split_z(z, system)
    s = xs[:, system.s_idx]
    s_new = jnp.concatenate([s[:1], jnp.minimum(s[1:], length)])
    xs = xs.at[:, system.s_idx].set(s_new)
    return qp_data.join_z(xs, us)


@partial(jax.jit, static_argnames=("cfg", "exact_heading_jac", "ts", "system"))
def mpc_step(track: TrackSpline, params: MPCCParams, sel_nn: cnn.MLPParams,
             env_nn: cnn.MLPParams, carry: MPCCarry, x0: jnp.ndarray,
             u0: jnp.ndarray, obs_pos: jnp.ndarray, obs_radius,
             ts: float = 0.01, cfg: SQPConfig = SQPConfig(),
             exact_heading_jac: bool = False,
             system: System = PANDA) -> tuple[MPCCarry, MPCOutput]:
    """One full MPC tick.  Pure; returns the new carry and the solution."""
    dtype = x0.dtype
    q = x0[:system.dof]
    dq = u0[:system.dof]
    _kin = kin if system.base_dof == 0 else kinm

    # --- 1. projection + vs re-derivation (`mpc.cpp:107-115`)
    last_s = x0[system.s_idx]
    ee_pos = _kin.ee_position(q)
    s_proj = als.project_on_spline(track, last_s, ee_pos, params.model.max_dist_proj)
    jv = _kin.ee_jacobian(q)[:3]
    vs = jnp.dot(jv @ dq, als.track_derivative(track, s_proj))
    x0_new = x0.at[system.s_idx].set(s_proj).at[system.vs_idx].set(vs)

    # --- 2. warm-start invalidation on projection jump (`mpc.cpp:117-121`)
    jumped = jnp.abs(last_s - s_proj) > params.model.max_dist_proj
    valid = jnp.logical_and(carry.valid_guess, ~jumped)
    n_failed = carry.num_guess_failed + jnp.where(jumped, 1, 0).astype(jnp.int32)

    # --- 3. warm start selection (both branches are cheap; select)
    z_warm = _unwrap_s(_shift_warm_start(carry.z_guess, x0_new, ts, system),
                       track.length, system)
    z_cold = _unwrap_s(_cold_start(x0_new, dtype, system), track.length, system)
    z0 = jnp.where(valid, z_warm, z_cold)

    # --- 4. per-tick RobotData sweep (frozen linearization cache)
    xs0, _ = qp_data.split_z(z0, system)
    rb = compute_robot_data(xs0[:, :system.dof], obs_pos, obs_radius, sel_nn,
                            env_nn, mani_grad=cfg.mani_grad, system=system,
                            kin_backend=cfg.kin_backend,
                            kin_interpret=cfg.ipm_interpret,
                            nn_mm_dtype="bfloat16" if cfg.nn_bf16 else None)

    # --- 5. SQP (QP warm start carried across ticks; zeroed on cold start)
    qp_x0 = jnp.where(valid, carry.qp_x, 0.0)
    qp_y0 = jnp.where(valid, carry.qp_y, 0.0)
    ipm_s0 = jnp.where(valid, carry.ipm_s, 1.0)
    ipm_lam0 = jnp.where(valid, carry.ipm_lam, 1.0)
    res = sqp_mod.solve_ocp(track, rb, params, cfg, z0, u0, ts,
                            exact_heading_jac=exact_heading_jac,
                            qp_x0=qp_x0, qp_y0=qp_y0,
                            ipm_s0=ipm_s0, ipm_lam0=ipm_lam0, system=system)

    # --- 6. status machine (`mpc.cpp:138-188`)
    solved = res.success
    valid_next = solved
    n_failed_next = jnp.where(solved, 0, n_failed + 1).astype(jnp.int32)
    ok = jnp.logical_or(
        solved,
        jnp.logical_and(res.status == sqp_mod.Status.MAX_ITER_EXCEEDED,
                        n_failed_next < 5))

    xs, us = qp_data.split_z(res.z, system)
    # strong-type the carry leaves: a weak-typed bool here changes the jit
    # cache key on the next tick and silently recompiles the whole step
    # the ADMM path returns 1x1 IPM placeholders — keep the carry's slots
    ipm_s_new = (res.ipm_s if res.ipm_s.shape == carry.ipm_s.shape
                 else carry.ipm_s)
    ipm_lam_new = (res.ipm_lam if res.ipm_lam.shape == carry.ipm_lam.shape
                   else carry.ipm_lam)
    new_carry = MPCCarry(z_guess=res.z,
                         valid_guess=valid_next.astype(jnp.bool_),
                         num_guess_failed=n_failed_next,
                         qp_x=res.qp_x, qp_y=res.qp_y,
                         ipm_s=ipm_s_new, ipm_lam=ipm_lam_new)
    out = MPCOutput(u0=us[0], x0_updated=x0_new, horizon_x=xs, horizon_u=us,
                    status=res.status, ok=ok, sqp_iters=res.sqp_iters,
                    qp_iters=res.qp_iters)
    return new_carry, out
