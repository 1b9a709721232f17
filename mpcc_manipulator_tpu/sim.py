"""Closed-loop simulation drivers (reference `cpp/src/main.cpp`, `python/main.py`).

Two flavors:

* :func:`closed_loop_scan` — the whole rollout (MPC tick + RK4 plant) as one
  ``lax.scan`` on device: zero host round-trips, used for benchmarking and
  batched scenario studies.  Termination is handled by masking (once the
  end-point criterion fires, the state freezes), mirroring the reference's
  break condition (`main.cpp:174-178`).
* :func:`ClosedLoopSim` — a stepwise host-driven loop with per-tick logging
  parity (q, EE pose, manipulability, NN min-dist, s, vs, timing), for
  interactive use.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import N_VAR, NU, NX, PANDA_DOF, StateIndex
from .models import collision_nn as cnn
from .models import dynamics as dyn
from .models import kinematics as kin
from .mpc import MPCCarry, init_carry, mpc_step
from .params import MPCCParams, SQPConfig
from .splines import arc_length as als
from .splines.arc_length import TrackSpline
from .utils import so3


@partial(jax.jit, static_argnames=("cfg", "n_steps", "ts", "exact_heading_jac"))
def closed_loop_scan(track: TrackSpline, params: MPCCParams,
                     sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                     x_init: jnp.ndarray, obs_pos: jnp.ndarray, obs_radius,
                     n_steps: int = 100, ts: float = 0.01,
                     cfg: SQPConfig = SQPConfig(),
                     exact_heading_jac: bool = False):
    """Device-side rollout.  Returns stacked (states, inputs, status, ok)."""
    dtype = x_init.dtype
    carry0 = (init_carry(dtype), x_init, jnp.zeros(NU, dtype=dtype),
              jnp.asarray(False))

    end_pos = als.track_position(track, track.length)
    end_rot = als.track_orientation(track, track.length)

    def step(carry, _):
        mpc_carry, x, u, finished = carry
        new_mpc_carry, out = mpc_step(track, params, sel_nn, env_nn, mpc_carry,
                                      x, u, obs_pos, obs_radius, ts=ts, cfg=cfg,
                                      exact_heading_jac=exact_heading_jac)
        x_next = dyn.sim_time_step(out.x0_updated, out.u0, ts)

        # end-point criterion (`main.cpp:174-178`)
        ee = kin.ee_position(x_next[:PANDA_DOF])
        ee_rot = kin.ee_orientation(x_next[:PANDA_DOF])
        ori_err = jnp.linalg.norm(so3.log_rot_vec(end_rot.T @ ee_rot))
        reached = ((jnp.linalg.norm(ee - end_pos) < 1e-2)
                   & (ori_err < 1e-3)
                   & (jnp.abs(x_next[StateIndex.s] - track.length) < 1e-2))
        fin_next = jnp.logical_or(finished, reached)

        # freeze once finished
        x_out = jnp.where(finished, x, x_next)
        u_out = jnp.where(finished, u, out.u0)
        mpc_out = jax.tree.map(
            lambda a, b: jnp.where(finished, a, b), mpc_carry, new_mpc_carry)
        return ((mpc_out, x_out, u_out, fin_next),
                (x_out, u_out, out.status, out.ok, fin_next))

    _, traj = jax.lax.scan(step, carry0, None, length=n_steps)
    return traj


@dataclass
class ClosedLoopSim:
    """Host-driven closed loop with logging parity (reference `python/main.py`)."""

    track: TrackSpline
    params: MPCCParams
    sel_nn: cnn.MLPParams
    env_nn: cnn.MLPParams
    ts: float = 0.01
    cfg: SQPConfig = SQPConfig()
    exact_heading_jac: bool = False
    log: dict = field(default_factory=lambda: {
        "q": [], "qdot": [], "min_dist": [], "mani": [], "s": [], "vs": [],
        "ee_pos": [], "solve_time": [], "status": []})

    def run(self, x0: np.ndarray, n_steps: int = 1000, obs_pos=(3.0, 3.0, 3.0),
            obs_radius: float = 0.0, verbose: bool = False):
        x = jnp.asarray(x0)
        u = jnp.zeros(NU, dtype=x.dtype)
        carry = init_carry(x.dtype)
        obs = jnp.asarray(obs_pos, dtype=x.dtype)

        end_pos = np.asarray(als.track_position(self.track, self.track.length))
        end_rot = np.asarray(als.track_orientation(self.track, self.track.length))

        for i in range(n_steps):
            t0 = time.perf_counter()
            carry, out = mpc_step(self.track, self.params, self.sel_nn,
                                  self.env_nn, carry, x, u, obs, obs_radius,
                                  ts=self.ts, cfg=self.cfg,
                                  exact_heading_jac=self.exact_heading_jac)
            out.u0.block_until_ready()
            dt = time.perf_counter() - t0
            u = out.u0
            x = dyn.sim_time_step(out.x0_updated, u, self.ts)

            q = np.asarray(x[:PANDA_DOF])
            ee = np.asarray(kin.ee_position(jnp.asarray(q)))
            mani = float(kin.manipulability(jnp.asarray(q)))
            min_dist = float(cnn.mlp_forward(self.sel_nn, jnp.asarray(q))[0])
            self.log["q"].append(q)
            self.log["qdot"].append(np.asarray(u[:PANDA_DOF]))
            self.log["min_dist"].append(min_dist)
            self.log["mani"].append(mani)
            self.log["s"].append(float(x[StateIndex.s]))
            self.log["vs"].append(float(x[StateIndex.vs]))
            self.log["ee_pos"].append(ee)
            self.log["solve_time"].append(dt)
            self.log["status"].append(int(out.status))

            if verbose:
                print(f"step {i:5d}  s={float(x[StateIndex.s]):.4f} "
                      f"mani={mani:.4f} min_dist={min_dist:.2f}cm "
                      f"t={dt * 1e3:.2f}ms status={int(out.status)}")

            ee_rot = np.asarray(kin.ee_orientation(jnp.asarray(q)))
            ori_err = np.linalg.norm(np.asarray(
                so3.log_rot_vec(jnp.asarray(end_rot.T @ ee_rot))))
            if (np.linalg.norm(ee - end_pos) < 1e-2 and ori_err < 1e-3
                    and abs(float(x[StateIndex.s]) - float(self.track.length)) < 1e-2):
                if verbose:
                    print("End point reached!!!")
                break
        return x, self.log
