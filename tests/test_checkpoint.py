"""Checkpoint/resume: a restored run continues bit-identically.

The loop state is the explicit pytree ``(MPCCarry, x, u)``; saving it at
tick k and resuming must reproduce the uninterrupted trajectory exactly
(same jitted program, same inputs -> deterministic).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import PANDA_DOF
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import dynamics as dyn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.runtime import checkpoint as ckpt
from mpcc_manipulator_tpu.splines import arc_length as als

TS = 0.01
CFG = SQPConfig(max_iter=2, qp_solver="riccati", ipm_max_iter=6)


@pytest.fixture(scope="module")
def setup():
    params, _ = load_params(dtype=jnp.float32)
    sel_nn = cnn.load_self_collision_nn(dtype=jnp.float32)
    env_nn = cnn.load_env_collision_nn(dtype=jnp.float32)
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.],
                     dtype=jnp.float32)
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    phi = np.linspace(0, 2 * np.pi, 40)
    track = als.gen_6d_spline(
        np.zeros(40) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (40, 1, 1)),
        dtype=jnp.float32)
    return params, sel_nn, env_nn, track, x0


def _tick(setup, state):
    params, sel_nn, env_nn, track, _ = setup
    carry, x, u = state
    obs = jnp.asarray([3., 3., 3.], dtype=jnp.float32)
    carry, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                          obs, jnp.float32(0.0), ts=TS, cfg=CFG)
    x = dyn.sim_time_step(out.x0_updated, out.u0, TS)
    return (carry, x, out.u0)


def test_resume_is_bit_identical(setup, tmp_path):
    _, _, _, _, x0 = setup
    state = (init_carry(jnp.float32), x0, jnp.zeros(8, dtype=jnp.float32))

    # uninterrupted: 6 ticks
    ref = state
    for _ in range(6):
        ref = _tick(setup, ref)

    # interrupted: 3 ticks, checkpoint, restore, 3 more
    st = state
    for k in range(3):
        st = _tick(setup, st)
    path = str(tmp_path / "ckpt_3.npz")
    ckpt.save_state(path, st, step=3)

    template = (init_carry(jnp.float32), x0, jnp.zeros(8, dtype=jnp.float32))
    st2, step = ckpt.restore_state(path, template)
    assert step == 3
    for _ in range(3):
        st2 = _tick(setup, st2)

    for a, b in zip((ref[1], ref[2]), (st2[1], st2[2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_and_mismatch(setup, tmp_path):
    _, _, _, _, x0 = setup
    state = (init_carry(jnp.float32), x0, jnp.zeros(8, dtype=jnp.float32))
    ckpt.save_state(str(tmp_path / "ckpt_1.npz"), state, step=1)
    ckpt.save_state(str(tmp_path / "ckpt_10.npz"), state, step=10)
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("ckpt_10.npz")
    assert ckpt.latest_checkpoint(str(tmp_path / "nope")) is None

    # wrong template structure fails loudly
    with pytest.raises(ValueError):
        ckpt.restore_state(str(tmp_path / "ckpt_1.npz"), (x0,))

    # wrong leaf shape fails loudly
    bad = (init_carry(jnp.float32), jnp.zeros(10, dtype=jnp.float32),
           jnp.zeros(8, dtype=jnp.float32))
    with pytest.raises(ValueError):
        ckpt.restore_state(str(tmp_path / "ckpt_1.npz"), bad)


def test_dtype_mismatch_refused_widening_allowed(setup, tmp_path):
    """A float64 checkpoint must not silently truncate into a float32
    template; the value-preserving direction (f32 ckpt -> f64 template)
    stays allowed."""
    _, _, _, _, x0 = setup
    state64 = (init_carry(jnp.float64),
               x0.astype(jnp.float64), jnp.zeros(8, dtype=jnp.float64))
    ckpt.save_state(str(tmp_path / "c64.npz"), state64, step=3)
    tmpl32 = (init_carry(jnp.float32),
              x0.astype(jnp.float32), jnp.zeros(8, dtype=jnp.float32))
    with pytest.raises(ValueError, match="dtype"):
        ckpt.restore_state(str(tmp_path / "c64.npz"), tmpl32)

    ckpt.save_state(str(tmp_path / "c32.npz"), tmpl32, step=4)
    restored, step = ckpt.restore_state(str(tmp_path / "c32.npz"), state64)
    assert step == 4
    assert np.asarray(restored[1]).dtype == np.float64
