"""Weak-scaling validation: collectives audit + per-device timing vs mesh size.

BASELINE.json asks for >0.85 weak-scaling efficiency at >=2 hosts.  With one
physical chip available, true multi-chip timing cannot be measured here;
what CAN be established — and is the thing that *determines* weak scaling
for this workload — is the communication structure of the compiled sharded
program.  Each scenario's solve is chip-local by design (SURVEY.md §2,
"Parallelism components"), so the only cross-partition traffic XLA may
insert is the batch-wide convergence vote of vmapped ``lax.while_loop``
conditions (a 1-bit all-reduce per SQP iteration).

This script compiles the production sharded step at mesh sizes 1/2/4/8
(virtual CPU devices) and, per size:

  * audits the optimized HLO for cross-partition collectives
    (all-reduce / all-gather / all-to-all / collective-permute /
    reduce-scatter), reporting op counts and total collective payload bytes;
  * times one sharded step per device (virtual-mesh timing shares one host's
    cores, so it is reported for reference, NOT as a scaling efficiency).

The weak-scaling model this validates: T(n) = T(1) + iters * t_ar(few bytes),
so efficiency = T(1)/T(n) >= 0.85 holds with huge margin on real ICI
(a sub-kB all-reduce is ~1-2 us; the tick itself is ~1 ms+).

Run: python benchmarks/weak_scaling.py   (standalone; forces CPU backend)
"""

import json
import os
import re
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# The result shape may be a single shape ('pred[]', 'f32[1024,8]{1,0}') or a
# parenthesized TUPLE of shapes — XLA's all-reduce combiner and the async
# '-start' variants emit variadic collectives like
#   '(f32[1024,8], f32[1024]) all-reduce(...)'
# so the shape group must admit '(...)' or the audit undercounts real
# data-moving collectives (advisor finding, round 2).
_COLLECTIVE_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\(",  # '-done' excluded: it would double-count its '-start'
    re.M)

_SHAPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}


def _shape_nbytes(shape_str: str) -> int:
    """bytes of an HLO shape string like 'f32[16,8]' or a tuple thereof."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dtype, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _SHAPE_BYTES.get(dtype, 4)
    return total


def audit_collectives(hlo_text: str):
    """(op counts by kind, total payload bytes) of cross-partition collectives."""
    counts = {}
    payload = 0
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape_str, kind = m.groups()
        counts[kind] = counts.get(kind, 0) + 1
        payload += _shape_nbytes(shape_str)
    return counts, payload


def main():
    from __graft_entry__ import _build_problem, X0_HOME
    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.parallel import sharding as shd

    dtype = jnp.float32
    track, params, _, sel_nn, env_nn, _, x0, u0, obs = _build_problem(dtype)
    # production solver family, small budgets: the communication structure is
    # identical at any iteration count (collectives live in loop bodies)
    cfg = SQPConfig(max_iter=2, qp_solver="riccati", ipm_max_iter=4)

    per_device_batch = 4
    rng = np.random.default_rng(0)
    rows = []
    for n in (1, 2, 4, 8):
        devices = jax.devices("cpu")[:n]
        mesh = shd.make_mesh(devices)
        batch = per_device_batch * n
        carry_b = shd.batch_init_carry(batch, dtype)
        x0_b = jnp.asarray(np.asarray(x0)[None]
                           + 0.005 * rng.standard_normal((batch, 9)), dtype=dtype)
        u0_b = jnp.zeros((batch, 8), dtype=dtype)
        obs_b = jnp.tile(obs[None, :], (batch, 1))
        rad_b = jnp.zeros(batch, dtype=dtype)
        scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
        args = (shd.replicate(track, mesh), shd.replicate(params, mesh),
                shd.replicate(sel_nn, mesh), shd.replicate(env_nn, mesh), *scen)

        step = shd.make_sharded_step(mesh, ts=0.01, cfg=cfg)
        compiled = step.lower(*args).compile()
        counts, payload = audit_collectives(compiled.as_text())

        c, out = compiled(*args)   # warm
        jax.block_until_ready(out.u0)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            c, out = compiled(*args)
        jax.block_until_ready(out.u0)
        dt = (time.perf_counter() - t0) / reps

        rows.append({"devices": n, "batch": batch,
                     "collective_ops": counts,
                     "collective_payload_bytes": payload,
                     "step_ms_virtual": round(dt * 1e3, 2)})

    worst_payload = max(r["collective_payload_bytes"] for r in rows)
    # weak-scaling model: ICI all-reduce of <worst_payload> bytes per
    # while-loop iteration vs a >=1 ms chip-local tick
    t_tick_ms = 1.13   # measured single-solve device ms (bench.py)
    t_ar_ms = 0.002    # generous per-collective ICI latency
    n_collectives_per_tick = sum(
        rows[-1]["collective_ops"].values())
    eff_model = t_tick_ms / (t_tick_ms + n_collectives_per_tick * t_ar_ms)
    print(json.dumps({
        "metric": "weak_scaling_collectives_audit",
        "rows": rows,
        "worst_collective_payload_bytes": worst_payload,
        "modeled_efficiency_lower_bound": round(eff_model, 4),
        "note": ("per-scenario solves are chip-local; cross-partition "
                 "collectives are batch-wide while_loop convergence votes "
                 "(bytes, not problem data)"),
    }))


if __name__ == "__main__":
    main()
