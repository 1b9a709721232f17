"""Multi-chip scaling: batched scenario solves sharded over a device mesh.

The reference is strictly single-process/single-robot (SURVEY.md section 2);
the distributed axis of this framework is *batched scenario MPCC*: thousands
of independent (x0, u0, obstacle, carry) tuples solved per step, data-parallel
over TPU chips.

Design (scaling-book recipe): pick a 1-D ``Mesh`` over all chips with axis
``"batch"``; scenario arrays are sharded on their leading axis via
``NamedSharding``; the jitted, vmapped ``mpc_step`` then runs fully
chip-local — each scenario's SQP/ADMM never crosses the ICI, so the only
collectives XLA inserts are for scalar diagnostics reductions.  Weak scaling
is therefore near-perfect by construction; cross-chip work appears only in
the (optional) fleet-level reductions provided here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import collision_nn as cnn
from ..mpc import MPCCarry, init_carry, mpc_step
from ..params import MPCCParams, SQPConfig
from ..splines.arc_length import TrackSpline
from ..system import PANDA, System


def make_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """1-D data-parallel mesh over all available devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_init_carry(batch: int, dtype=jnp.float32,
                     system: System = PANDA) -> MPCCarry:
    one = init_carry(dtype, system)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), one)


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place a scenario-batched pytree with its leading axis sharded over the
    mesh; everything else (track, params, weights) is replicated."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def batched_mpc_step(track: TrackSpline, params: MPCCParams,
                     sel_nn: cnn.MLPParams, env_nn: cnn.MLPParams,
                     carry: MPCCarry, x0: jnp.ndarray, u0: jnp.ndarray,
                     obs_pos: jnp.ndarray, obs_radius: jnp.ndarray,
                     ts: float = 0.01, cfg: SQPConfig = SQPConfig(),
                     exact_heading_jac: bool = False,
                     system: System = PANDA):
    """vmapped MPC tick over a leading scenario axis.

    All scenario inputs carry a leading batch dim; track/params/weights are
    shared.  Composes with jit + shardings: under a mesh the batch axis
    splits across chips and each chip runs its share as one fused program.
    """
    step = partial(mpc_step, ts=ts, cfg=cfg, exact_heading_jac=exact_heading_jac,
                   system=system)
    return jax.vmap(
        lambda c, x, u, op, orr: step(track, params, sel_nn, env_nn, c, x, u, op, orr)
    )(carry, x0, u0, obs_pos, obs_radius)


def make_sharded_step(mesh: Mesh, ts: float = 0.01, cfg: SQPConfig = SQPConfig(),
                      axis_name: str = "batch", exact_heading_jac: bool = False,
                      system: System = PANDA):
    """jit-compiled batched step with explicit in/out shardings on the mesh.

    Returns ``step(track, params, sel_nn, env_nn, carry, x0, u0, obs_pos,
    obs_radius) -> (carry, output)`` where the scenario args/outputs are
    sharded on their leading axis.
    """
    batch_sh = NamedSharding(mesh, P(axis_name))
    repl_sh = NamedSharding(mesh, P())

    def step(track, params, sel_nn, env_nn, carry, x0, u0, obs_pos, obs_radius):
        return batched_mpc_step(track, params, sel_nn, env_nn, carry, x0, u0,
                                obs_pos, obs_radius, ts=ts, cfg=cfg,
                                exact_heading_jac=exact_heading_jac,
                                system=system)

    shardings = (repl_sh, repl_sh, repl_sh, repl_sh,
                 batch_sh, batch_sh, batch_sh, batch_sh, batch_sh)
    return jax.jit(step, in_shardings=shardings,
                   out_shardings=(batch_sh, batch_sh))


def fleet_diagnostics(ok: jnp.ndarray, sqp_iters: jnp.ndarray):
    """Cross-chip reduction example: solve success rate + mean SQP iterations
    (an ICI psum under the hood when sharded)."""
    return {
        "success_rate": jnp.mean(ok.astype(jnp.float32)),
        "mean_sqp_iters": jnp.mean(sqp_iters.astype(jnp.float32)),
    }
