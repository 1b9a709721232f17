"""User-facing API mirroring the reference Python package (`python/MPCC/MPCC.py`).

Drop-in surface for reference users:

    mpc = MPCC()
    mpc.setTrack(state)
    status, state, u0, horizon, times = mpc.runMPC(state, input)

plus ``setParam`` (whitelisted nested dict, `MPCC.py:33-55`), ``getSplinePath``,
``getRefPose``, ``getContourError``.  Under the hood everything funnels into
the jitted :func:`mpcc_manipulator_tpu.mpc.mpc_step`.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from . import config as C
from .models import collision_nn as cnn
from .models import kinematics as kin
from .mpc import init_carry, mpc_step
from .params import DEFAULT_PARAM_DIR, load_params
from .splines import arc_length as als

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: parameter-key whitelists (reference `MPCC.py:37-43`)
PARAM_KEY_WHITELIST = {
    "param": ["max_dist_proj", "desired_ee_velocity", "s_trust_region",
              "tol_sing", "tol_selcol", "tol_envcol", "deaccelerate_ratio"],
    "cost": ["qC", "qCNmult", "qL", "qVs", "qOri", "qSing", "rdq", "rddq",
             "rdVs", "qC_reduction_ratio", "qL_increase_ratio",
             "qOri_reduction_ratio"],
    "bounds": [f"q{i}{s}" for i in range(1, 8) for s in "lu"]
              + ["sl", "su", "vsl", "vsu"]
              + [f"dq{i}{s}" for i in range(1, 8) for s in "lu"]
              + ["dVsl", "dVsu"]
              + [f"ddq{i}{s}" for i in range(1, 8) for s in "lu"],
    "normalization": [f"q{i}" for i in range(1, 8)] + ["s", "vs"]
                     + [f"dq{i}" for i in range(1, 8)] + ["dVs"],
    "sqp": ["eps_prim", "eps_dual", "line_search_tau", "line_search_eta",
            "line_search_rho", "max_iter", "line_search_max_iter", "do_SOC",
            "use_BFGS"],
}


class MPCC:
    """High-level controller object with reference-compatible methods."""

    def __init__(self, param_dir: str | None = None, track_path: str | None = None,
                 dtype=jnp.float64, exact_heading_jac: bool = False):
        cfg_file = os.path.join(param_dir or DEFAULT_PARAM_DIR, "config.json")
        with open(cfg_file) as f:
            self.jsonConfig = json.load(f)
        self.Ts = float(self.jsonConfig["Ts"])
        self.pred_horizon = C.N
        self.robot_dof = C.PANDA_DOF
        self.num_links = C.PANDA_NUM_LINKS
        self._dtype = dtype
        self._param_dir = param_dir
        self._overrides: dict = {}
        self._exact_heading_jac = exact_heading_jac
        self.params, self.sqp_cfg = load_params(param_dir, dtype=dtype)
        self.sel_nn = cnn.load_self_collision_nn(dtype=dtype)
        self.env_nn = cnn.load_env_collision_nn(dtype=dtype)
        self.track_path = track_path or os.path.join(
            _REPO_ROOT, "assets", "tracks", "track.json")
        self.track = None
        self.track_set = False
        self._carry = None

    # -------------------------------------------------- parameters
    def setParam(self, param_value: dict) -> None:
        """Merge a nested override dict (whitelisted) and rebuild params —
        no recompilation happens (params are traced pytree leaves)."""
        assert set(param_value).issubset(PARAM_KEY_WHITELIST), (
            f"Parameter groups must be a subset of {list(PARAM_KEY_WHITELIST)}, "
            f"got {list(param_value)}")
        for group, values in param_value.items():
            allowed = PARAM_KEY_WHITELIST[group]
            assert set(values).issubset(allowed), (
                f"Keys for {group} must be a subset of {allowed}, got {list(values)}")
            self._overrides.setdefault(group, {}).update(values)
        self.params, self.sqp_cfg = load_params(
            self._param_dir, overrides=self._overrides, dtype=self._dtype)

    # -------------------------------------------------- track
    def setTrack(self, state: np.ndarray) -> None:
        """Load the track JSON, shift it to the current EE position, fit the
        6-D arc-length spline (`MPCC.py:57-73`)."""
        state = np.asarray(state)
        assert state.size == C.NX, f"State size {state.size} != {C.NX}"
        # CPU-backend FK: avoids a TPU device->host readback in the setup
        # path (slow-dispatch-mode gotcha, docs/ARCHITECTURE.md)
        ee_pos = kin.ee_position_host(state[:C.PANDA_DOF])
        x, y, z, rots = als.load_track_waypoints(self.track_path)
        x, y, z = als.shift_track_to(x, y, z, ee_pos)
        self.track = als.gen_6d_spline(x, y, z, rots, dtype=self._dtype)
        self.track_set = True
        self._carry = init_carry(self._dtype)

    def getSplinePath(self):
        assert self.track_set, "Set Track first!"
        pos = np.asarray(self.track.wp)
        ss = self.track.s_knots
        rot = np.stack([np.asarray(als.track_orientation(self.track, s)) for s in ss])
        return pos, rot, np.asarray(ss)

    def getRefPose(self, path_parameter: float):
        assert self.track_set, "Set Track first!"
        s = jnp.asarray(path_parameter, dtype=self._dtype)
        return (np.asarray(als.track_position(self.track, s)),
                np.asarray(als.track_orientation(self.track, s)))

    def getContourError(self, s: float, ee_posi: np.ndarray) -> float:
        ref = np.asarray(als.track_position(
            self.track, jnp.asarray(s, dtype=self._dtype)))
        return float(np.linalg.norm(ref - np.asarray(ee_posi)))

    def getTrackLength(self) -> float:
        return float(self.track.length)

    # -------------------------------------------------- solve
    def runMPC(self, state: np.ndarray, input: np.ndarray,
               obs_position=np.array([3.0, 3.0, 3.0]), obs_radius: float = 0.0,
               profile: bool = False):
        """One control tick; returns
        ``(status_ok, updated_state, u0, horizon, compute_time)`` exactly like
        the reference wrapper (`MPCC.py:92-114`).

        ``profile=False`` (default) runs the fused jitted tick — fastest, and
        the phase entries of ``compute_time`` are 0.0 because single phases
        do not exist inside one XLA computation; only ``total`` is measured.
        ``profile=True`` drives the same tick host-side with per-phase
        ``block_until_ready`` timing, filling real
        ``set_env/set_qp/solve_qp/get_alpha`` values (reference
        `ComputeTime`, `python/MPCC/MPCC.py:108-112`) at the cost of
        eager-loop overhead.
        """
        assert self.track_set, "Set Track first!"
        state = np.asarray(state)
        assert state.size == C.NX, f"State size {state.size} != {C.NX}"
        x0 = jnp.asarray(state, dtype=self._dtype)
        u0 = jnp.asarray(input, dtype=self._dtype)
        obs = jnp.asarray(obs_position, dtype=self._dtype)

        if profile:
            from .solver.sqp_debug import mpc_step_profiled
            self._carry, out, times = mpc_step_profiled(
                self.track, self.params, self.sel_nn, self.env_nn,
                self._carry, x0, u0, obs,
                jnp.asarray(obs_radius, dtype=self._dtype),
                ts=self.Ts, cfg=self.sqp_cfg,
                exact_heading_jac=self._exact_heading_jac)
            phase = times.as_dict()
            total = phase.pop("total")
        else:
            t0 = time.perf_counter()
            self._carry, out = mpc_step(
                self.track, self.params, self.sel_nn, self.env_nn, self._carry,
                x0, u0, obs, float(obs_radius), ts=self.Ts, cfg=self.sqp_cfg,
                exact_heading_jac=self._exact_heading_jac)
            out.u0.block_until_ready()
            total = time.perf_counter() - t0
            phase = {"set_qp": 0.0, "solve_qp": 0.0, "get_alpha": 0.0,
                     "set_env": 0.0}

        horizon = [{"state": np.asarray(out.horizon_x[k]),
                    "input": (np.asarray(out.horizon_u[k]) if k < C.N
                              else np.zeros(C.NU))}
                   for k in range(C.N + 1)]
        compute_time = {"total": total, **phase,
                        "sqp_iters": int(out.sqp_iters),
                        "qp_iters": int(out.qp_iters)}
        return (bool(out.ok), np.asarray(out.x0_updated), np.asarray(out.u0),
                horizon, compute_time)
