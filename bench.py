"""Benchmark: MPCC solves/sec/chip + solve latency vs the Ts budget.

Prints ONE JSON line:
  {"metric": "mpcc_solves_per_sec_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": R, ...extras}

Baseline normalization: the reference is a single-robot CPU controller with a
hard real-time budget of Ts = 0.01 s per solve (`cpp/Params/config.json:4`),
i.e. 100 solves/s sustained.  ``vs_baseline`` is therefore
solves/s/chip / 100 — how many real-time reference controllers one chip
replaces.  Extras report single-solve latency percentiles against the same
10 ms budget.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem
    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.parallel import sharding as shd

    dtype = jnp.float32
    track, params, _, sel_nn, env_nn, carry, x0, u0, obs = _build_problem(
        dtype, small=False)
    # Production solver configuration: structured Riccati/IPM QP backend
    # (~12 Newton steps/QP) + exact AD manipulability gradient.  Override
    # via env for ablations (MPCC_QP_SOLVER=admm, MPCC_QP_BACKEND=pallas,
    # MPCC_MANI_GRAD=fd).
    cfg = SQPConfig(
        max_iter=20,
        qp_solver=os.environ.get("MPCC_QP_SOLVER", "riccati"),
        ipm_max_iter=25,
        qp_max_iter=200, qp_check_every=25,
        qp_backend=os.environ.get("MPCC_QP_BACKEND", "xla"),
        mani_grad=os.environ.get("MPCC_MANI_GRAD", "ad"),
    )

    from mpcc_manipulator_tpu.mpc import mpc_step

    rad = jnp.asarray(0.0, dtype=dtype)

    # ---------------- single-solve latency ----------------
    def one(carry, x, u):
        return mpc_step(track, params, sel_nn, env_nn, carry, x, u, obs, rad,
                        ts=0.01, cfg=cfg)

    carry1, out = one(carry, x0, u0)   # compile
    out.u0.block_until_ready()
    lat = []
    state, inp = x0, u0
    c = carry1
    for _ in range(50):
        t0 = time.perf_counter()
        c, out = one(c, state, inp)
        out.u0.block_until_ready()
        lat.append(time.perf_counter() - t0)
        inp = out.u0
        from mpcc_manipulator_tpu.models.dynamics import sim_time_step
        state = sim_time_step(out.x0_updated, inp, 0.01)
    lat_ms = np.asarray(lat) * 1e3
    p50, p99 = float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99))

    # ---------------- batched throughput ----------------
    batch = int(os.environ.get("MPCC_BENCH_BATCH", "256"))
    mesh = shd.make_mesh()
    carry_b = shd.batch_init_carry(batch, dtype)
    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(np.asarray(x0)[None, :]
                       + 0.01 * rng.standard_normal((batch, 9)), dtype=dtype)
    u0_b = jnp.zeros((batch, 8), dtype=dtype)
    obs_b = jnp.tile(obs[None, :], (batch, 1))
    rad_b = jnp.zeros(batch, dtype=dtype)

    step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    tr_r = shd.replicate(track, mesh)
    pr_r = shd.replicate(params, mesh)
    sn_r = shd.replicate(sel_nn, mesh)
    en_r = shd.replicate(env_nn, mesh)

    carry_s, x0_s, u0_s, obs_s, rad_s = scen
    cb, ob = step(tr_r, pr_r, sn_r, en_r, *scen)   # compile (fresh inputs)
    ob.u0.block_until_ready()
    # warm up the feedback pattern too (outputs carry mesh shardings; a
    # mismatched obs/rad sharding here would recompile inside the timed loop)
    cb, ob = step(tr_r, pr_r, sn_r, en_r, cb, ob.x0_updated, ob.u0,
                  obs_s, rad_s)
    ob.u0.block_until_ready()
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        cb, ob = step(tr_r, pr_r, sn_r, en_r, cb, ob.x0_updated, ob.u0,
                      obs_s, rad_s)
    ob.u0.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    n_chips = len(mesh.devices.flatten())
    solves_per_sec_per_chip = batch / dt / n_chips

    result = {
        "metric": "mpcc_solves_per_sec_per_chip",
        "value": round(solves_per_sec_per_chip, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec_per_chip / 100.0, 3),
        "latency_p50_ms": round(p50, 3),
        "latency_p99_ms": round(p99, 3),
        "ts_budget_ms": 10.0,
        "batch": batch,
        "n_chips": n_chips,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
