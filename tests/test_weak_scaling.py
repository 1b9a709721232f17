"""Weak-scaling structure: the compiled sharded tick moves no problem data
across partitions.

The reference has no distributed axis at all (SURVEY.md §2); for the batched
scenario axis mandated by BASELINE.json, weak scaling is determined entirely
by the communication structure of the compiled program.  This pins it: the
only cross-partition collectives allowed in the sharded step are the
batch-wide ``lax.while_loop`` convergence votes — O(1) predicate bytes,
independent of mesh size, batch size, and problem size — and in
``SQPConfig.fleet_mode`` (fixed-trip loops) not even those: zero
collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.weak_scaling import audit_collectives
from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.config import PANDA_DOF
from mpcc_manipulator_tpu.params import SQPConfig, load_params
from mpcc_manipulator_tpu.parallel import sharding as shd
from mpcc_manipulator_tpu.splines import arc_length as als


def test_sharded_step_collectives_are_vote_bytes_only():
    params, _ = load_params(dtype=jnp.float32)
    cfg = SQPConfig(max_iter=1, qp_solver="riccati", ipm_max_iter=2)
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

    n, batch = 2, 4
    cpu_devices = jax.devices("cpu")
    # guard against a vacuous pass: if the 8-virtual-device XLA flag did not
    # take (run outside conftest), a 1-device mesh would compile zero
    # collectives and the assertions below would hold trivially
    assert len(cpu_devices) >= n, (
        f"need >= {n} virtual CPU devices, got {len(cpu_devices)} — "
        "xla_force_host_platform_device_count flag not in effect")
    mesh = shd.make_mesh(cpu_devices[:n])
    assert mesh.devices.size == n
    carry_b = shd.batch_init_carry(batch, jnp.float32)
    x0_b = jnp.tile(x0[None], (batch, 1))
    u0_b = jnp.zeros((batch, 8), dtype=jnp.float32)
    obs_b = jnp.tile(jnp.asarray([3., 3., 3.], dtype=jnp.float32)[None], (batch, 1))
    rad_b = jnp.zeros(batch, dtype=jnp.float32)
    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    args = (shd.replicate(track, mesh), shd.replicate(params, mesh),
            shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh), *scen)

    step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
    compiled = step.lower(*args).compile()
    counts, payload = audit_collectives(compiled.as_text())

    assert set(counts) <= {"all-reduce"}, counts
    assert payload <= 16, (counts, payload)  # predicate votes, not data


def test_fleet_mode_sharded_step_has_zero_collectives():
    """SQPConfig.fleet_mode replaces data-dependent while_loops with
    fixed-trip masked fori_loops, so even the convergence-vote all-reduces
    disappear: the compiled sharded program must contain NO cross-partition
    collectives at all."""
    params, _ = load_params(dtype=jnp.float32)
    cfg = SQPConfig(max_iter=2, qp_solver="riccati", ipm_max_iter=3,
                    fleet_mode=True)
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

    n, batch = 2, 4
    cpu_devices = jax.devices("cpu")
    assert len(cpu_devices) >= n
    mesh = shd.make_mesh(cpu_devices[:n])
    carry_b = shd.batch_init_carry(batch, jnp.float32)
    x0_b = jnp.tile(x0[None], (batch, 1))
    u0_b = jnp.zeros((batch, 8), dtype=jnp.float32)
    obs_b = jnp.tile(jnp.asarray([3., 3., 3.], dtype=jnp.float32)[None],
                     (batch, 1))
    rad_b = jnp.zeros(batch, dtype=jnp.float32)
    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    args = (shd.replicate(track, mesh), shd.replicate(params, mesh),
            shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh), *scen)
    step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
    compiled = step.lower(*args).compile()
    counts, payload = audit_collectives(compiled.as_text())
    assert counts == {}, counts
    assert payload == 0


def test_collective_audit_regex_matches_variadic_and_async_forms():
    """The audit regex must count tuple-shaped (variadic) collectives and
    async '-start' ops — XLA's all-reduce combiner emits exactly these
    (advisor finding, round 2)."""
    hlo = "\n".join([
        "  %ar.0 = pred[] all-reduce(pred[] %p), replica_groups={}, to_apply=%or",
        "  %ar.1 = (f32[1024,8]{1,0}, f32[1024]{0}) all-reduce("
        "f32[1024,8] %a, f32[1024] %b), replica_groups={}, to_apply=%add",
        "  %ars.2 = (f32[16]{0}, f32[16]{0}, u32[]) all-reduce-start("
        "f32[16] %c), replica_groups={}, to_apply=%add",
        "  %ard.2 = f32[16]{0} all-reduce-done((f32[16], f32[16], u32[]) %ars.2)",
        "  %ag.3 = bf16[64,128]{1,0} all-gather(bf16[8,128] %d), dimensions={0}",
        "  %not.a.collective = f32[4]{0} add(f32[4] %x, f32[4] %y)",
    ])
    counts, payload = audit_collectives(hlo)
    # -done excluded by design (it would double-count its -start)
    assert counts == {"all-reduce": 3, "all-gather": 1}, counts
    # pred[]=1 + (1024*8+1024)*4 + (16+16)*4+4 + 64*128*2
    assert payload == 1 + (1024 * 8 + 1024) * 4 + (16 + 16) * 4 + 4 + 64 * 128 * 2
