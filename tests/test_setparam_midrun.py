"""Mid-run ``setParam`` end-to-end: the reference's live re-parameterization.

The reference flips cost/model params at tick 200 of its closed loop
(`cpp/src/main.cpp:103-106`: ``param["desired_ee_velocity"]``,
``cost_param["qOri_reduction_ratio"]`` via ``mpc.setParam(param_value)``)
and keeps solving with the same controller object.  This pins the same
contract through :class:`mpcc_manipulator_tpu.api.MPCC`, scaled to a
40-tick loop with the flip at tick 20:

(a) the closed-loop trajectory RESPONDS to the flip — cutting
    ``desired_ee_velocity`` 0.2 -> 0.05 must slow the path-velocity state
    ``vs`` in the post-flip window, and
(b) ZERO new XLA compilations occur after the flip — params are traced
    pytree leaves (docs/ARCHITECTURE.md "setParam never recompiles"), so
    the rebuilt ``MPCCParams`` pytree hits the existing ``mpc_step``
    executable (asserted via the jit cache size).
"""

import numpy as np

from mpcc_manipulator_tpu import config as C
from mpcc_manipulator_tpu.api import MPCC
from mpcc_manipulator_tpu.models.dynamics import sim_time_step
from mpcc_manipulator_tpu.mpc import mpc_step
from mpcc_manipulator_tpu.params import SQPConfig

X0 = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.])
# small budgets for CPU test speed; riccati = production solver family
CFG = SQPConfig(max_iter=5, qp_solver="riccati", ipm_max_iter=15)

N_TICKS = 40
FLIP_AT = 20  # reference scenario scaled 200/600 -> 20/60 of the loop


def test_setparam_midrun_changes_behavior_without_recompile():
    mpc = MPCC()
    mpc.sqp_cfg = CFG
    mpc.setTrack(X0)

    state, u = X0.copy(), np.zeros(C.NU)
    vs_hist = []
    cache_after_warm = None
    for tick in range(N_TICKS):
        if tick == FLIP_AT:
            cache_pre_flip = mpc_step._cache_size()
            # the reference's exact flip (`main.cpp:45-48,103-106`), with
            # desired_ee_velocity moved DOWN so the response is visible in
            # a short window
            mpc.setParam({
                "param": {"desired_ee_velocity": 0.05},
                "cost": {"qOri_reduction_ratio": 0.1},
            })
            # setParam rebuilds sqp_cfg from sqp.json; restore the test's
            # small-budget cfg (same object => same static jit key)
            mpc.sqp_cfg = CFG
            assert mpc_step._cache_size() == cache_pre_flip
        ok, state, u, horizon, times = mpc.runMPC(state, u)
        assert ok, f"tick {tick} not ok"
        state = np.asarray(sim_time_step(state, u, mpc.Ts))
        vs_hist.append(state[C.StateIndex.vs])
        if tick == 2:
            cache_after_warm = mpc_step._cache_size()

    # (b) no recompilation at any point after warm-up — in particular none
    # caused by the tick-20 setParam (params are traced leaves)
    assert mpc_step._cache_size() == cache_after_warm, (
        "setParam caused new XLA compilations "
        f"({cache_after_warm} -> {mpc_step._cache_size()})")

    # (a) the trajectory responds: vs tracks desired_ee_velocity, so the
    # post-flip window must be decisively slower than the pre-flip window
    vs = np.asarray(vs_hist)
    pre = float(np.mean(vs[FLIP_AT - 8:FLIP_AT]))
    post = float(np.mean(vs[-8:]))
    assert pre > 0.05, f"pre-flip vs {pre} never reached cruise"
    assert post < 0.6 * pre, (
        f"vs did not respond to desired_ee_velocity flip: pre {pre}, post {post}")
    # and it settles near the new setpoint (loose band: taper/cost coupling)
    assert post < 0.12, post
