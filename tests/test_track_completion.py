"""Full-track closed-loop completion (the reference's implicit integration
test): run `assets/tracks/track.json` to the end-point criterion
``||EE-end|| < 1e-2  AND  ori < 1e-3  AND  |s-L| < 1e-2``
(`cpp/src/main.cpp:174-178`), in

  (a) float64 + the `riccati` structured backend, and
  (b) float32 + `riccati_pallas` — the production TPU kernel configuration,
      running under the Pallas interpreter on CPU.

Round-2 verdict: nothing automated proved the controller *completes* the
real track (the longest loop was 40 ticks).  The scan is chunked so the run
stops at the first finished chunk instead of paying the full n_sim budget.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mpcc_manipulator_tpu.config import NU, PANDA_DOF, StateIndex
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.sim import closed_loop_scan
from mpcc_manipulator_tpu.splines import arc_length as als

X0 = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
TS = 0.01
N_SIM = 10000          # reference budget (`config.json:3`)
CHUNK = 250


def _run_to_completion(dtype, cfg, max_ticks):
    ee = kin.ee_position_host(X0[:PANDA_DOF])
    xw, yw, zw, rots = als.load_track_waypoints("assets/tracks/track.json")
    xw, yw, zw = als.shift_track_to(xw, yw, zw, ee)
    track = als.gen_6d_spline(xw, yw, zw, rots, dtype=dtype)
    params, _ = load_params(dtype=dtype)
    sel = cnn.load_self_collision_nn(dtype=dtype)
    env = cnn.load_env_collision_nn(dtype=dtype)
    obs = jnp.asarray([3., 3., 3.], dtype=dtype)
    rad = jnp.asarray(0.0, dtype=dtype)

    x = jnp.asarray(X0, dtype=dtype)
    ticks = 0
    ok_frac_min = 1.0
    # chunked rollout: closed_loop_scan freezes the state once the
    # criterion fires, so re-seeding each chunk from the last state is
    # exact; we stop at the first chunk that reports finished
    while ticks < max_ticks:
        xs, us, status, ok, fin = closed_loop_scan(
            track, params, sel, env, x, obs, rad, n_steps=CHUNK, cfg=cfg)
        fin_np = np.asarray(fin)
        ok_np = np.asarray(ok)
        active = ~np.concatenate([[False], fin_np[:-1]])  # ticks before finish
        if active.any():
            ok_frac_min = min(ok_frac_min, float(ok_np[active].mean()))
        ticks += CHUNK
        x = jnp.asarray(np.asarray(xs)[-1])
        if bool(fin_np[-1]):
            break
    finished = bool(fin_np[-1])
    x_fin = np.asarray(x)
    ee_fin = np.asarray(kin.ee_position(jnp.asarray(x_fin[:PANDA_DOF],
                                                    dtype=dtype)))
    end = np.asarray(als.track_position(track, track.length))
    return finished, ticks, x_fin, float(np.linalg.norm(ee_fin - end)), \
        float(track.length), ok_frac_min


@pytest.mark.slow
def test_full_track_completion_f64_riccati():
    cfg = SQPConfig(max_iter=20, qp_solver="riccati", ipm_max_iter=25)
    finished, ticks, x_fin, ee_err, length, ok_frac = _run_to_completion(
        jnp.float64, cfg, N_SIM)
    assert finished, (ticks, x_fin[StateIndex.s], length, ee_err)
    assert ticks < N_SIM
    assert abs(x_fin[StateIndex.s] - length) < 1e-2
    assert ee_err < 1e-2
    assert ok_frac == 1.0, f"solver reported not-ok ticks (frac ok={ok_frac})"


@pytest.mark.slow
def test_full_track_completion_f32_riccati_pallas():
    # production TPU kernel configuration (bench.py), interpret mode on CPU
    cfg = SQPConfig(max_iter=20, qp_solver="riccati_pallas", ipm_max_iter=25)
    finished, ticks, x_fin, ee_err, length, ok_frac = _run_to_completion(
        jnp.float32, cfg, 3000)
    assert finished, (ticks, x_fin[StateIndex.s], length, ee_err)
    assert abs(x_fin[StateIndex.s] - length) < 1e-2
    assert ee_err < 1e-2
    assert ok_frac == 1.0, f"solver reported not-ok ticks (frac ok={ok_frac})"
