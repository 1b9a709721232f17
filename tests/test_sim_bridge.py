"""Isaac-style bridge driver: topic contract + closed loop over the
loopback transport (reference `python/main_w_isaac.py` semantics)."""

import numpy as np

from mpcc_manipulator_tpu.runtime.sim_bridge import (
    IsaacBridge, LoopbackSimTransport, PANDA_JOINT_NAMES, WHEEL_JOINT_NAMES)


def test_bridge_closed_loop_and_topic_contract():
    q0 = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4])
    transport = LoopbackSimTransport(q0)
    bridge = IsaacBridge(transport)
    transport.start()
    for _ in range(12):
        transport.spin_once()

    lg = bridge.log
    assert len(lg["s"]) == 12
    assert all(lg["ok"])
    # progress strictly advances after the ramp-up ticks
    assert lg["s"][-1] > lg["s"][2] > 0.0

    cmds = transport.published["/joint_command"]
    assert len(cmds) == 12
    msg = cmds[-1]
    # reference contract: husky wheels zero-padded ahead of the arm joints
    assert msg["name"][:4] == WHEEL_JOINT_NAMES
    assert msg["name"][4:] == PANDA_JOINT_NAMES
    assert msg["position"][:4] == [0.0] * 4
    assert msg["velocity"][:4] == [0.0] * 4
    assert len(msg["position"]) == 11
    # commanded velocities are the MPC's u0
    assert np.allclose(msg["velocity"][4:], bridge._input[:7])
    # telemetry channels present (reference path topics)
    assert "/mpcc/splined_path" in transport.published
    assert "/mpcc/local_path" in transport.published
