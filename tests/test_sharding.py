"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates the mandated distributed axis: batched scenario solves sharded
data-parallel over a `jax.sharding.Mesh`, producing identical results to the
unsharded vmap and actually placing shards on all devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.config import NU, PANDA_DOF
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.parallel import sharding as shd
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.splines import arc_length as als


@pytest.fixture(scope="module")
def problem():
    params, _ = load_params(dtype=jnp.float32)
    cfg = SQPConfig(max_iter=2, qp_max_iter=50)
    sel_nn = cnn.load_self_collision_nn(dtype=jnp.float32)
    env_nn = cnn.load_env_collision_nn(dtype=jnp.float32)
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4, 0., 0.],
                     dtype=jnp.float32)
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.15 * np.cos(phi) - 0.15 + ee[1],
        0.15 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)),
        dtype=jnp.float32)
    return params, cfg, sel_nn, env_nn, track, x0


def _batch_inputs(x0, batch):
    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(np.asarray(x0)[None, :]
                       + 0.005 * rng.standard_normal((batch, 9)),
                       dtype=jnp.float32)
    u0_b = jnp.zeros((batch, NU), dtype=jnp.float32)
    obs_b = jnp.tile(jnp.asarray([3.0, 3.0, 3.0], dtype=jnp.float32)[None, :],
                     (batch, 1))
    rad_b = jnp.zeros(batch, dtype=jnp.float32)
    return x0_b, u0_b, obs_b, rad_b


def test_mesh_has_8_devices():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest must set xla_force_host_platform_device_count"


def test_sharded_step_matches_vmap(problem):
    params, cfg, sel_nn, env_nn, track, x0 = problem
    batch = 16
    x0_b, u0_b, obs_b, rad_b = _batch_inputs(x0, batch)
    carry_b = shd.batch_init_carry(batch, jnp.float32)

    # unsharded vmap reference
    carry_ref, out_ref = jax.jit(
        lambda *a: shd.batched_mpc_step(*a, ts=0.01, cfg=cfg)
    )(track, params, sel_nn, env_nn, carry_b, x0_b, u0_b, obs_b, rad_b)

    # sharded over the 8-device mesh
    mesh = shd.make_mesh(jax.devices("cpu")[:8])
    step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    args_r = (shd.replicate(track, mesh), shd.replicate(params, mesh),
              shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh))
    carry_sh, out_sh = step(*args_r, *scen)

    # Sharded vs unsharded partitionings fuse/reassociate float32 reductions
    # differently; ~1e-7-level per-op rounding differences are amplified
    # through 2 SQP x 50 ADMM iterations, so bit-parity is not expected —
    # agreement to ~1e-4 on O(0.05..2) outputs is.
    np.testing.assert_allclose(out_sh.u0, out_ref.u0, rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(out_sh.x0_updated, out_ref.x0_updated,
                               rtol=2e-3, atol=5e-4)
    # outputs actually live sharded across the mesh
    assert len(out_sh.u0.sharding.device_set) == 8


def test_fleet_diagnostics_reduction(problem):
    params, cfg, sel_nn, env_nn, track, x0 = problem
    batch = 8
    x0_b, u0_b, obs_b, rad_b = _batch_inputs(x0, batch)
    carry_b = shd.batch_init_carry(batch, jnp.float32)
    mesh = shd.make_mesh(jax.devices("cpu")[:8])
    step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    args_r = (shd.replicate(track, mesh), shd.replicate(params, mesh),
              shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh))
    _, out = step(*args_r, *scen)
    diag = jax.jit(shd.fleet_diagnostics)(out.ok, out.sqp_iters)
    assert 0.0 <= float(diag["success_rate"]) <= 1.0
    assert float(diag["mean_sqp_iters"]) >= 0.0
