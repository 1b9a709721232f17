"""Multi-process `jax.distributed` weak scaling — executed for real.

Launches `benchmarks/multihost_weak_scaling.py` (coordinator mode), which
spawns a 2-process CPU cluster on this machine, runs the production sharded
fleet step with process-local scenario data assembled into global arrays,
and measures per-step time at 1 vs 2 processes with fixed per-process batch.

Asserts BASELINE.md's weak-scaling contract (>0.85 efficiency at >= 2
"hosts") on the virtual cluster, plus the communication-structure invariant
(cross-process collectives are while-loop vote bytes, not problem data).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "benchmarks", "multihost_weak_scaling.py")


@pytest.mark.slow
def test_two_process_cluster_runs_and_weak_scales():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--port", "29561", "--reps", "7"],
        capture_output=True, text=True, timeout=2700, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines()
            if l.startswith('{"metric": "multiprocess_weak_scaling"')]
    assert line, out.stdout
    rep = json.loads(line[-1])

    # the cluster really was multi-process with a global mesh
    assert rep["multi_proc"]["procs"] == 2
    assert rep["multi_proc"]["global_devices"] == 2
    assert rep["multi_proc"]["local_devices"] == 1
    assert rep["multi_proc"]["global_batch"] == 16
    # every scenario in the global (cross-process) batch solved/ran ok
    assert rep["multi_proc"]["ok_count"] == rep["multi_proc"]["global_batch"]

    # communication structure: fleet_mode fixed-trip loops -> the compiled
    # sharded program crosses processes with NOTHING at all
    ops = rep["multi_proc"]["collective_ops"]
    assert ops == {}, ops
    assert rep["multi_proc"]["collective_payload_bytes"] == 0, rep

    # weak scaling on the virtual cluster (1 core + 1 device per process);
    # the upper bound guards measurement sanity — an efficiency much above 1
    # means the two phases were not comparable (r3 measured 1.39 from
    # warm-up asymmetry), which would make the lower bound vacuous
    assert 0.85 <= rep["efficiency"] <= 1.15, rep
