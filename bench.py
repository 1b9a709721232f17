"""Benchmark: MPCC solves/sec/chip + p50/p99 per-solve latency vs the Ts budget.

Prints ONE JSON line:
  {"metric": "mpcc_solves_per_sec_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": R, ...extras}

Baseline normalization: the reference is a single-robot CPU controller with a
hard real-time budget of Ts = 0.01 s per solve (`cpp/Params/config.json:4`),
i.e. 100 solves/s sustained.  ``vs_baseline`` is therefore
solves/s/chip / 100 — how many real-time reference controllers one chip
replaces.  The primary entry is the fixed-base Panda (the reference's active
system); the ``husky_panda`` sub-entry is BASELINE config 5 — the 10-DOF
mobile platform at a 4096-scenario batch through the same production Pallas
kernel.

Measurement methodology (important on this environment's tunneled TPU):
``block_until_ready`` does NOT reliably wait for device execution over the
axon tunnel, and a device->host readback flips the process into a slow
synchronous dispatch mode (docs/ARCHITECTURE.md "remote-TPU dispatch
gotcha").  Naive per-call wall timing therefore measures either nothing or
the tunnel round-trip.  Instead we chain K closed-loop control ticks inside
ONE jitted ``fori_loop`` (K is a traced argument: one executable), force a
scalar readback to synchronize, and compute per-tick device time from the
slope between two K values — launch overhead and tunnel RTT cancel exactly.
Each repetition yields one slope sample; the reported p50/p99 are over the
sample distribution (>=10 reps; non-positive samples, where tunnel noise
exceeded the signal, are dropped and counted).  Validated against raw
matmul peak: the method reproduces ~193 TFLOP/s f32 on the v5e chip
(hardware peak ~197).

FLOP accounting: per-executable FLOPs come from XLA's compiled-HLO cost
analysis (``jitted.lower(...).compile().cost_analysis()``) — exact for
everything XLA sees.  Two caveats are handled explicitly: (a) HLO cost
analysis counts a while/fori loop BODY ONCE, so the per-tick total composes
the separately-lowered per-SQP-iteration executables (stage assembly +
line-search evaluation) scaled by the measured mean SQP iteration count;
(b) the Pallas IPM kernel is an opaque custom call (0 HLO flops), so its
per-iteration FLOPs use the analytic structured-sweep model scaled by the
measured Newton iteration count, and kernel-only MFU is reported separately.
The old coarse analytic whole-tick model is retained as a cross-check field.
"""

import json
import os
import time
from functools import partial

import numpy as np

PEAK_TFLOPS = 197.0   # v5e f32 peak; slope method measures 193 on matmul


def kernel_flops_per_iter(system) -> float:
    """Analytic FLOPs of ONE IPM Newton iteration in the Pallas kernel
    (per scenario, f32; MACs x2).  Structured sweep terms per stage:
    C'WC rank-1 updates (npc rows), the Riccati matrix recursion
    (P@at, bt'Pa, R-bar, nu-Cholesky + solves, P-update), and the
    row-space vector updates.  Coarse (+-30%) — the kernel is opaque to
    XLA cost analysis, so this is the honest substitute."""
    nx, nu, npc = system.nx, system.nu, system.npc
    nxt = nx + nu
    nc = system.nc_stage
    n_st = system.horizon
    per_stage = (npc * (nx * nx + nu * nx + nu * nu)   # C' diag(w) C
                 + nxt ** 3                            # P @ at (+ Q-bar)
                 + 2 * nu * nxt * nxt                  # bt'Pa, P-update
                 + nu ** 3 // 3                        # Cholesky
                 + nu * nu * (nxt + 1)                 # gain/ff solves
                 + nu * nxt)                           # vector sweep
    rows = 8 * nc                                      # slack/dual updates
    return 2.0 * n_st * (per_stage + rows)


def _xla_flops(fn, *args) -> float:
    """Total FLOPs of the compiled executable for fn(*args), from XLA's
    HLO cost analysis.  Returns -1.0 if the backend doesn't support it."""
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", -1.0))
    except Exception:
        return -1.0


def _slope_time(call, k1: int, k2: int, reps: int = 10):
    """Per-unit-time sample distribution via the (k2-k1) slope.

    ``call(k)`` must synchronize.  Returns a stats dict; non-positive
    samples (tunnel noise > signal) are dropped but counted."""
    call(k1)  # warm (compile + first sync readback)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call(k1)
        t1 = time.perf_counter()
        call(k2)
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    valid = np.asarray([s for s in per if s > 0.0])
    if valid.size == 0:       # degenerate; report the least-bad sample
        valid = np.asarray([max(per)])
    return {
        "p50": float(np.percentile(valid, 50)),
        "p95": float(np.percentile(valid, 95)),
        "p99": float(np.percentile(valid, 99)),
        "mean": float(np.mean(valid)),
        "stderr": float(np.std(valid) / np.sqrt(valid.size)),
        "n_samples": int(valid.size),
        "n_dropped": int(reps - valid.size),
    }


def _measure_system(system, batch: int, cfg, reps_single: int,
                    reps_batched: int, k_single=(20, 120), k_batched=(3, 23),
                    with_flops: bool = True):
    """Full single-solve + batched-throughput measurement for one platform."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem, X0_HOME, X0_HOME_MOBILE
    from mpcc_manipulator_tpu.parallel import sharding as shd
    from mpcc_manipulator_tpu.mpc import mpc_step
    from mpcc_manipulator_tpu.models.dynamics import sim_time_step

    dtype = jnp.float32
    ts = 0.01
    track, params, _, sel_nn, env_nn, carry, x0, u0, obs = _build_problem(
        dtype, small=False, system=system)
    x0_home = X0_HOME if system.name == "panda" else X0_HOME_MOBILE

    step_fn = partial(mpc_step, ts=ts, cfg=cfg, system=system)

    @jax.jit
    def chain_single(carry, x, u, obs, rad, k):
        def body(i, st):
            carry, x, u = st
            carry2, out = step_fn(track, params, sel_nn, env_nn, carry, x, u,
                                  obs, rad)
            x2 = sim_time_step(out.x0_updated, out.u0, ts)
            return (carry2, x2, out.u0)
        return jax.lax.fori_loop(0, k, body, (carry, x, u))

    rad = jnp.asarray(0.0, dtype=dtype)

    def run_single(k):
        c, x, u = chain_single(carry, x0, u0, obs, rad, jnp.asarray(k))
        return float(u[0])  # sync readback

    # reps_single=0 skips the (batch-independent) single-solve latency —
    # used by the batch-scaling sweep, where only throughput varies
    lat = (_slope_time(run_single, *k_single, reps=reps_single)
           if reps_single > 0 else None)

    # ---------------- batched throughput ----------------
    mesh = shd.make_mesh()
    n_chips = len(mesh.devices.flatten())
    carry_b = shd.batch_init_carry(batch, dtype, system=system)
    rng = np.random.default_rng(0)
    # host-side construction only: a device->host readback here would flip
    # the tunnel into slow dispatch (docs/ARCHITECTURE.md)
    x0_b = jnp.asarray(
        x0_home[None, :] + 0.01 * rng.standard_normal((batch, system.nx)),
        dtype=dtype)
    u0_b = jnp.zeros((batch, system.nu), dtype=dtype)
    obs_b = jnp.tile(obs[None, :], (batch, 1))
    rad_b = jnp.zeros(batch, dtype=dtype)

    batched_step = jax.vmap(
        lambda c, x, u, o, r: step_fn(track, params, sel_nn, env_nn,
                                      c, x, u, o, r))

    @jax.jit
    def chain_batched(carry_b, x_b, u_b, obs_b, rad_b, k):
        def body(i, st):
            carry_b, x_b, u_b = st
            carry2, out = batched_step(carry_b, x_b, u_b, obs_b, rad_b)
            x2 = jax.vmap(lambda x, u: sim_time_step(x, u, ts))(
                out.x0_updated, out.u0)
            return (carry2, x2, out.u0)
        return jax.lax.fori_loop(0, k, body, (carry_b, x_b, u_b))

    scen = shd.shard_batch((carry_b, x0_b, u0_b, obs_b, rad_b), mesh)
    carry_s, x0_s, u0_s, obs_s, rad_s = scen

    def run_batched(k):
        c, x, u = chain_batched(carry_s, x0_s, u0_s, obs_s, rad_s,
                                jnp.asarray(k))
        return float(u[0, 0])  # sync readback

    step_t = _slope_time(run_batched, *k_batched, reps=reps_batched)
    solves_per_sec_per_chip = batch / step_t["p50"] / n_chips

    out = {
        "solves_per_sec_per_chip": round(solves_per_sec_per_chip, 2),
        "batch": batch,
        "n_chips": n_chips,
        **({"lat_p50_ms": round(lat["p50"] * 1e3, 4),
            "lat_p95_ms": round(lat["p95"] * 1e3, 4),
            "lat_p99_ms": round(lat["p99"] * 1e3, 4),
            "lat_stderr_ms": round(lat["stderr"] * 1e3, 4),
            "lat_samples": lat["n_samples"],
            "lat_dropped": lat["n_dropped"]} if lat is not None else {}),
        "batched_step_p50_ms": round(step_t["p50"] * 1e3, 4),
        "batched_step_p95_ms": round(step_t["p95"] * 1e3, 4),
        "batched_step_p99_ms": round(step_t["p99"] * 1e3, 4),
        "batched_step_stderr_ms": round(step_t["stderr"] * 1e3, 4),
    }

    if not with_flops:
        return out, None
    # ---------------- FLOP / MFU accounting (after all timing: the
    # diagnostic readback flips the tunneled process into slow dispatch)
    from mpcc_manipulator_tpu.ocp import qp_stages as qps
    from mpcc_manipulator_tpu.ocp import qp_data
    from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data

    carry_d, out_d = jax.jit(batched_step)(carry_s, x0_s, u0_s, obs_s, rad_s)
    sqp_mean = float(jnp.mean(out_d.sqp_iters.astype(jnp.float32)))
    ipm_mean = float(jnp.mean(out_d.qp_iters.astype(jnp.float32)))

    # per-executable XLA flops at the batched shapes (per scenario)
    N = system.horizon
    z_b = jnp.tile(
        jnp.concatenate([jnp.tile(x0, N + 1), jnp.zeros(N * system.nu,
                                                        dtype=dtype)])[None],
        (batch, 1))
    cu_b = jnp.zeros((batch, system.nu), dtype=dtype)

    def rb_of(z, ob, r):
        xs = z[:system.nx * (N + 1)].reshape(N + 1, system.nx)
        return compute_robot_data(xs[:, :system.dof], ob, r, sel_nn, env_nn,
                                  mani_grad=cfg.mani_grad, system=system)

    def asm_of(z, ob, r, cu):
        rb = rb_of(z, ob, r)
        return qps.build_qp_stages_k(track, z, rb, params, cu, ts, False,
                                     system=system)

    def eval_of(z, ob, r, cu):
        rb = rb_of(z, ob, r)
        obj = qp_data.total_objective(track, z, rb, params, False,
                                      system=system)
        c, l, u = qp_data.constraint_values(track, z, rb, params, cu, ts,
                                            system=system)
        return obj, c

    f_rb = _xla_flops(jax.vmap(rb_of), z_b, obs_b, rad_b)
    f_rb_asm = _xla_flops(jax.vmap(asm_of), z_b, obs_b, rad_b, cu_b)
    f_rb_eval = _xla_flops(jax.vmap(eval_of), z_b, obs_b, rad_b, cu_b)
    f_tick_once = _xla_flops(
        lambda c, x, u, o, r: batched_step(c, x, u, o, r)[1].u0,
        carry_s, x0_s, u0_s, obs_s, rad_s)

    flops = None
    if min(f_rb, f_rb_asm, f_rb_eval, f_tick_once) > 0:
        f_asm = (f_rb_asm - f_rb) / batch          # one SQP-iter assembly
        f_eval = (f_rb_eval - f_rb) / batch        # one line-search eval
        # compiled tick counts each loop body once; add the extra
        # (sqp_mean - 1) iterations of assembly + line-search evaluation
        f_xla_tick = (f_tick_once / batch
                      + max(sqp_mean - 1.0, 0.0) * (f_asm + f_eval))
        f_kernel = kernel_flops_per_iter(system) * ipm_mean
        flops = {
            "flops_per_tick": round(f_xla_tick + f_kernel),
            "flops_per_tick_xla": round(f_xla_tick),
            "flops_rb": round(f_rb / batch),
            "flops_assembly_per_sqp": round(f_asm),
            "flops_eval_per_sqp": round(f_eval),
            "flops_kernel_per_ipm_iter": round(kernel_flops_per_iter(system)),
        }
        total = f_xla_tick + f_kernel
        achieved = total * solves_per_sec_per_chip / 1e12
        flops["achieved_tflops"] = round(achieved, 3)
        flops["mfu_pct"] = round(100.0 * achieved / PEAK_TFLOPS, 3)
        # kernel-only utilization: the IPM kernel's analytic flops over the
        # fraction of the step it occupies cannot be isolated without a
        # device profile, so report its flop-rate against the whole step
        # (a lower bound on the kernel's own utilization)
        k_tflops = f_kernel * solves_per_sec_per_chip / 1e12
        flops["kernel_achieved_tflops"] = round(k_tflops, 3)
        flops["kernel_mfu_pct"] = round(100.0 * k_tflops / PEAK_TFLOPS, 3)
    out["mean_sqp_iters"] = round(sqp_mean, 2)
    out["mean_ipm_iters"] = round(ipm_mean, 2)
    return out, flops


def main():
    import jax

    # persistent compilation cache: the full two-system bench compiles ~8
    # large programs (~25+ min cold over the remote-compile tunnel); repeat
    # runs (driver invocations after a warm-up) load the executables
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpcc_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.system import SYSTEMS

    # Production solver configuration: structured Riccati/IPM QP backend
    # solved by the fused Pallas kernel (one launch per QP, batch in lanes)
    # + exact AD manipulability gradient.  Override via env for ablations
    # (MPCC_QP_SOLVER=riccati|riccati_struct|admm, MPCC_QP_BACKEND=pallas,
    # MPCC_MANI_GRAD=fd, MPCC_IPM_SCHEME=adaptive, MPCC_IPM_WARM=0).
    solver = os.environ.get("MPCC_QP_SOLVER", "riccati_pallas")
    # Real-time-iteration mode is the FLEET-HEADLINE default since r5:
    # one warm-started SQP iteration per tick (SQPConfig.rti).  It passes
    # the full 100-tick oracle conformance gate and the obstacle/CBF
    # contract (tests/test_rti.py) at +17%/+23% throughput; the converged
    # reference-semantics loop is MPCC_RTI=0 (and remains the default of
    # api.MPCC and every conformance test).
    rti = os.environ.get("MPCC_RTI", "1") == "1"
    cfg = SQPConfig(
        max_iter=1 if rti else 20,
        rti=rti,
        qp_solver=solver,
        ipm_max_iter=25,
        qp_max_iter=200, qp_check_every=25,
        qp_backend=os.environ.get("MPCC_QP_BACKEND", "xla"),
        mani_grad=os.environ.get("MPCC_MANI_GRAD", "analytic"),
        # "adaptive" overtook mehrotra once the kernel's dof-block + bd
        # structure exploits cheapened the matrix sweep (r4 ablation:
        # Panda 227.6k vs 218.6k, Husky 104.7k vs 82.0k solves/s) —
        # more Newton iterations, each much cheaper
        ipm_scheme=os.environ.get("MPCC_IPM_SCHEME", "adaptive"),
        ipm_warm_start=os.environ.get("MPCC_IPM_WARM", "1") == "1",
        # fused Pallas stage-QP assembly (ops/pallas_assembly.py): measured
        # r4 at batch 1024 Panda, 31.1k -> 100.3k solves/s/chip
        # (batched step 32.9 -> 10.2 ms).  Its StageQPK output is only
        # consumed by the kernel solver, so it follows MPCC_QP_SOLVER
        # (the sqp.py guard rejects the combination otherwise);
        # MPCC_QP_ASSEMBLY overrides explicitly.
        qp_assembly=os.environ.get(
            "MPCC_QP_ASSEMBLY",
            "pallas" if solver == "riccati_pallas" else "xla"),
        # fused Pallas kinematics (ops/pallas_kinematics.py): FK + point
        # Jacobian + analytic manipulability gradient in lanes; the
        # collision-NN matmuls stay XLA/MXU.  MPCC_KIN_BACKEND=xla ablates.
        kin_backend=os.environ.get("MPCC_KIN_BACKEND", "pallas"),
        # MPCC_NN_BF16=1: collision-NN GEMMs in bf16/f32-accum (ablation;
        # default off — see ARCHITECTURE.md tolerance discussion)
        nn_bf16=os.environ.get("MPCC_NN_BF16", "0") == "1",
    )

    primary_name = os.environ.get("MPCC_SYSTEM", "panda")
    primary = SYSTEMS[primary_name]
    # horizon is a System field since r5 (SURVEY §5 long-context axis);
    # MPCC_HORIZON=20 benches the same stack at a doubled lookahead
    n_h = int(os.environ.get("MPCC_HORIZON", "10"))
    if n_h != primary.horizon:
        import dataclasses
        primary = dataclasses.replace(primary, horizon=n_h)
    batch = int(os.environ.get("MPCC_BENCH_BATCH", "1024"))
    # >=50 single-solve slope samples so p95/p99 are sample-supported
    # percentiles, not the max of a dozen draws (round-4 verdict).  Each
    # rep is ~0.1 s of device time; the executables come from the
    # persistent compile cache, so total bench wall stays bounded.
    res, flops = _measure_system(primary, batch, cfg,
                                 reps_single=50, reps_batched=20)

    result = {
        "metric": "mpcc_solves_per_sec_per_chip",
        "value": res["solves_per_sec_per_chip"],
        "unit": "solves/s",
        "vs_baseline": round(res["solves_per_sec_per_chip"] / 100.0, 3),
        "system": primary_name,
        "ts_budget_ms": 10.0,
        **{k: v for k, v in res.items() if k != "solves_per_sec_per_chip"},
    }
    if flops:
        result.update(flops)

    # ---------------- BASELINE config 5: Husky+Panda at batch 4096 ----------
    if (primary_name == "panda"
            and os.environ.get("MPCC_BENCH_MOBILE", "1") == "1"):
        # release the Panda executables/buffers first: leftover HBM state
        # from the primary measurement slows the 4096-scenario mobile run
        # ~2x (r4 measured 26k vs 49k solves/s standalone)
        import gc
        del res, flops
        gc.collect()
        jax.clear_caches()
        mobile_batch = int(os.environ.get("MPCC_BENCH_BATCH_MOBILE", "4096"))
        # k_batched must reach steady state: the first ~8 ticks pay cold
        # IPM warm-start transients (the batched while-loop runs to the
        # slowest of 4096 lanes), and a (2, 10) window measured ~2x the
        # steady-state step time (r4: 26k vs 49k solves/s)
        m_res, m_flops = _measure_system(
            SYSTEMS["husky_panda"], mobile_batch, cfg,
            reps_single=50, reps_batched=20, k_batched=(3, 23),
            with_flops=False)
        m_res["vs_baseline"] = round(
            m_res["solves_per_sec_per_chip"] / 100.0, 3)
        result["husky_panda"] = m_res
        # matched-batch point: the r5 batch curve put the mobile knee at
        # ~512-1024 (124.7k @1024 vs 104.5k @4096 — the 4096 penalty is
        # the batched while-loop running to the slowest of 4096 lanes);
        # report husky@1024 for apples-to-apples with the Panda headline
        if mobile_batch != 1024:
            # drop the 4096-run's executables/buffers first — leftover HBM
            # state skews throughput (same ~2x effect as the Panda->mobile
            # transition above; r4 measured finding)
            del m_res, m_flops
            gc.collect()
            jax.clear_caches()
            m1k, _ = _measure_system(
                SYSTEMS["husky_panda"], 1024, cfg,
                reps_single=0, reps_batched=12, k_batched=(3, 23),
                with_flops=False)
            result["husky_panda_b1024"] = {
                "solves_per_sec_per_chip": m1k["solves_per_sec_per_chip"],
                "batched_step_p50_ms": m1k["batched_step_p50_ms"],
                "vs_baseline": round(
                    m1k["solves_per_sec_per_chip"] / 100.0, 3),
            }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
