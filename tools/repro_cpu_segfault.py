"""Minimal(izing) repro for the CPU-XLA segfault seen in round 3.

Symptom (commits e6dc21a / 41faec1): after the full test suite has
compiled ~100 distinct XLA CPU programs, compiling + running one specific
pair of `mpc_step` configurations (riccati_struct/mehrotra, cold + warm)
segfaults the process inside XLA.  Both configurations pass standalone
every time; the pallas/riccati code paths involved are pure jnp.

This script recreates the preconditions deterministically so the crash can
be bisected outside pytest:

  1. compile ``--n-warm`` distinct throwaway programs (unique shapes force
     unique executables, approximating the suite's compile pressure);
  2. compile + run the exact warm-start pair from
     tests/test_sqp_features.py.

Usage:
  python tools/repro_cpu_segfault.py [--n-warm 120] [--scan-steps 25]

Exit 0 = no crash (the pair ran fine under pressure).  A segfault
(SIGSEGV, rc -11) reproduces the round-3 failure.  Findings log:

  * 2026-08-21 (round 4): 120-program pressure + the pair does NOT crash
    standalone on this box (jax 0.9.0 / CPU backend), with or without the
    persistent compilation cache.  The crash therefore needs suite-scale
    state beyond executable count (likely total live-buffer/program bytes
    or allocator fragmentation).  Mitigations now centralized: the test
    conftest enables a persistent compilation cache (repeat runs skip the
    compiles entirely) and the one affected test runs in a subprocess.
  * 2026-08-21 (round 5): extended to the suite's END state — ``--hold``
    keeps all 160 pressure executables AND their result buffers live,
    ``--hold-mb 512`` adds 512 MB of live device arrays, while the pair
    compiles and runs.  Still NO CRASH (rc 0).  Negative result recorded
    per the round-4 verdict: live-state volume alone does not reproduce
    it either; whatever the suite adds (exact interleaving of pallas
    interpret programs, donated-buffer reuse, or a jaxlib bug keyed to a
    specific allocation pattern) is not reachable by this synthetic
    pressure.  A full single-process fast-tier run (``-p no:xdist``) with
    the WARM persistent compile cache was also attempted and still died
    with a fatal interpreter crash mid-suite — so the in-process failure
    is not (only) compile pressure.  Closing the line of investigation —
    the centralized mitigations (persistent compile cache + ``-n 2
    --dist loadfile``) remain the supported way to run the suite.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def compile_pressure(n: int, hold: bool = False, hold_mb: int = 0):
    """Compile ``n`` distinct programs; with ``hold`` keep every jitted
    callable (and so its executable) alive, plus ``hold_mb`` MB of live
    device buffers — approximating the suite's END state, not just its
    compile count (round-5 extension of the round-4 negative result)."""
    import jax
    import jax.numpy as jnp

    kept, bufs = [], []
    for i in range(n):
        # unique shape per iteration -> unique executable
        m = 32 + i

        @jax.jit
        def f(a, _m=m):
            b = jnp.tanh(a @ a.T + 1.0)
            return jnp.linalg.cholesky(b @ b.T + jnp.eye(_m) * _m)

        out = f(jnp.ones((m, m)))
        out.block_until_ready()
        if hold:
            kept.append(f)
            bufs.append(out)          # live result buffer per program
        if (i + 1) % 20 == 0:
            print(f"  compiled {i + 1}/{n} pressure programs", flush=True)
    if hold_mb:
        per = 4 * 1024 * 1024 // 8    # 4 MB of f64 per array
        for j in range(hold_mb // 4):
            bufs.append(jnp.arange(per, dtype=jnp.float64) * (j + 1))
        bufs[-1].block_until_ready()
        print(f"  holding ~{hold_mb} MB of live device buffers", flush=True)
    return kept, bufs


def run_pair(scan_steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpcc_manipulator_tpu.config import NU, PANDA_DOF
    from mpcc_manipulator_tpu.models import collision_nn as cnn
    from mpcc_manipulator_tpu.models import dynamics as dyn
    from mpcc_manipulator_tpu.models import kinematics as kin
    from mpcc_manipulator_tpu.mpc import init_carry, mpc_step
    from mpcc_manipulator_tpu.params import SQPConfig, load_params
    from mpcc_manipulator_tpu.splines import arc_length as als

    TS = 0.01
    params, _ = load_params()
    sel_nn = cnn.load_self_collision_nn()
    env_nn = cnn.load_env_collision_nn()
    x0 = jnp.asarray([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4,
                      0., 0.])
    ee = np.asarray(kin.ee_position(x0[:PANDA_DOF]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.zeros(nt) + ee[0], 0.12 * np.cos(phi) - 0.12 + ee[1],
        0.12 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kin.ee_orientation(x0[:PANDA_DOF])), (nt, 1, 1)))
    obs = jnp.asarray([3.0, 3.0, 3.0], dtype=x0.dtype)

    def roll(cfg, n_steps):
        def step(c, _):
            carry, x, u = c
            carry2, out = mpc_step(track, params, sel_nn, env_nn, carry, x, u,
                                   obs, 0.0, ts=TS, cfg=cfg)
            x2 = dyn.sim_time_step(out.x0_updated, out.u0, TS)
            return ((carry2, x2, out.u0), (x2, out.ok))
        init = (init_carry(x0.dtype), x0, jnp.zeros(NU, dtype=x0.dtype))
        _, (xs, oks) = jax.lax.scan(step, init, None, length=n_steps)
        assert bool(jnp.all(oks))
        return np.asarray(xs)

    base = dict(max_iter=10, qp_solver="riccati_struct", ipm_max_iter=25,
                ipm_scheme="mehrotra")
    print("  compiling/running COLD config...", flush=True)
    roll(SQPConfig(**base), scan_steps)
    print("  compiling/running WARM config...", flush=True)
    roll(SQPConfig(**base, ipm_warm_start=True), scan_steps)
    print("  pair OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-warm", type=int, default=120)
    ap.add_argument("--scan-steps", type=int, default=25)
    ap.add_argument("--use-cache", action="store_true",
                    help="enable the persistent compilation cache "
                         "(the suite's conftest default)")
    ap.add_argument("--hold", action="store_true",
                    help="keep all pressure executables + result buffers "
                         "live while the pair runs (suite end-state)")
    ap.add_argument("--hold-mb", type=int, default=0,
                    help="additional MB of live device arrays to hold")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if args.use_cache:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mpcc_jax_cache_tests")

    print(f"pressure: {args.n_warm} programs (hold={args.hold}, "
          f"hold_mb={args.hold_mb})", flush=True)
    kept = compile_pressure(args.n_warm, hold=args.hold,
                            hold_mb=args.hold_mb)
    print("running the segfault pair...", flush=True)
    run_pair(args.scan_steps)
    del kept
    print("NO CRASH: pair survived compile pressure", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
