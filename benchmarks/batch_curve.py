"""Batch-scaling curve: solves/s/chip vs scenario batch size, both platforms.

Round-4 verdict: Panda had only ever been benched at 1024 and Husky at
4096, so the throughput knee was unknown.  This sweep measures the batched
closed-loop step (same chained-``fori_loop`` slope methodology as bench.py,
single-solve latency skipped — it is batch-independent) across batch sizes
and prints one JSON line per point:

  {"system": "panda", "batch": 2048, "solves_per_sec_per_chip": ...,
   "batched_step_p50_ms": ..., "eps_ipm": 1e-05}

Also the driver for the IPM tolerance-frontier ablation: run with
``MPCC_EPS_IPM=1e-4`` (etc.) to re-measure the curve at a looser
complementarity target (the constant is baked into the compiled programs,
so each eps value is its own process).

Run: python benchmarks/batch_curve.py [panda_batches] [husky_batches]
     e.g. python benchmarks/batch_curve.py 1024,2048,4096,8192 1024,2048,4096
Diagnostic tooling, not part of the library API.
"""

import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpcc_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bench import _measure_system
    from mpcc_manipulator_tpu.params import SQPConfig
    from mpcc_manipulator_tpu.solver.qp_ipm import EPS_IPM
    from mpcc_manipulator_tpu.system import SYSTEMS

    solver = os.environ.get("MPCC_QP_SOLVER", "riccati_pallas")
    rti = os.environ.get("MPCC_RTI", "0") == "1"
    cfg = SQPConfig(
        max_iter=1 if rti else 20,
        rti=rti,
        qp_solver=solver,
        ipm_max_iter=25,
        qp_max_iter=200, qp_check_every=25,
        qp_backend=os.environ.get("MPCC_QP_BACKEND", "xla"),
        mani_grad="analytic",
        ipm_scheme=os.environ.get("MPCC_IPM_SCHEME", "adaptive"),
        ipm_warm_start=True,
        # the Pallas assembly feeds StageQPK and is only consumed by the
        # kernel solver (sqp.py guard) — follow the solver unless overridden
        qp_assembly=os.environ.get(
            "MPCC_QP_ASSEMBLY",
            "pallas" if solver == "riccati_pallas" else "xla"),
        kin_backend="pallas",
    )

    panda_batches = [int(b) for b in
                     (sys.argv[1] if len(sys.argv) > 1
                      else "1024,2048,4096,8192").split(",") if b]
    husky_batches = [int(b) for b in
                     (sys.argv[2] if len(sys.argv) > 2
                      else "1024,2048,4096").split(",") if b]

    for name, batches in (("panda", panda_batches),
                          ("husky_panda", husky_batches)):
        system = SYSTEMS[name]
        for batch in batches:
            # drop the previous point's executables/buffers: leftover HBM
            # state slows large-batch runs ~2x (bench.py mobile note)
            gc.collect()
            jax.clear_caches()
            res, _ = _measure_system(
                system, batch, cfg, reps_single=0, reps_batched=12,
                k_batched=(3, 23), with_flops=False)
            res.pop("mean_sqp_iters", None)
            print(json.dumps({"system": name, "eps_ipm": EPS_IPM, **res}),
                  flush=True)


if __name__ == "__main__":
    main()
