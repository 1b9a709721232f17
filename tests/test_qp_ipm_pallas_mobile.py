"""Fused Pallas IPM kernel at Husky+Panda (10-DOF mobile) dimensions.

BASELINE config 5 names the mobile platform as the batched flagship; the
kernel takes its dims (nx=12, nu=11, dof=10, npc=11 -> nc=77) from the
``System`` descriptor, and this file proves the instantiation is *correct*,
not just that it compiles: interpret-mode step-exactness against the XLA
structured reference `solve_qp_ipm_s` on a real mobile QP (same contract as
tests/test_qp_ipm_pallas.py for the Panda).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# slow tier: mobile-dims interpret runs are the widest kernel programs in
# the suite (~3 min); the fast tier keeps the Panda kernel equivalence
# (tests/test_qp_ipm_pallas.py) and the dryrun certifies the mobile config
pytestmark = pytest.mark.slow

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics_mobile as kinm
from mpcc_manipulator_tpu.ocp import qp_stages as qps
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.params import load_params
from mpcc_manipulator_tpu.solver import qp_ipm, qp_ipm_pallas
from mpcc_manipulator_tpu.splines import arc_length as als
from mpcc_manipulator_tpu.system import HUSKY_PANDA as SYS

TS = 0.01
DT = jnp.float32   # the kernel is a float32 TPU path

X0 = np.array([0.0, 0.0, 0.0,
               0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, np.pi / 4,
               0.05, 0.1])


@pytest.fixture(scope="module")
def qp_batch():
    params, _ = load_params(system=SYS, dtype=DT)
    sel_nn = cnn.load_self_collision_nn(dtype=DT)
    env_nn = cnn.load_env_collision_nn(dtype=DT)
    x0 = jnp.asarray(X0, dtype=DT)
    ee = np.asarray(kinm.ee_position(x0[:SYS.dof]))
    nt = 60
    phi = np.linspace(0, 2 * np.pi, nt)
    track = als.gen_6d_spline(
        np.linspace(0, 0.8, nt) + ee[0],
        0.12 * np.cos(phi) - 0.12 + ee[1],
        0.12 * np.sin(phi) + ee[2],
        np.tile(np.asarray(kinm.ee_orientation(x0[:SYS.dof])), (nt, 1, 1)),
        dtype=DT)

    rng = np.random.default_rng(1)
    B = 3
    n_var = SYS.n_var
    z0 = np.concatenate([np.tile(X0, 11), np.zeros(SYS.nu * 10)])
    zs = jnp.asarray(z0[None] + 0.002 * rng.standard_normal((B, n_var)),
                     dtype=DT)

    def build(z):
        xs = z[:SYS.nx * 11].reshape(11, SYS.nx)
        rb = compute_robot_data(xs[:, :SYS.dof],
                                jnp.asarray([3., 3., 3.], dtype=DT),
                                jnp.asarray(0.0, DT), sel_nn, env_nn,
                                mani_grad="ad", system=SYS)
        cu = jnp.zeros(SYS.nu, dtype=DT)
        qs = qps.build_qp_stages_s(track, z, rb, params, cu, TS, False,
                                   system=SYS)
        qk = qps.build_qp_stages_k(track, z, rb, params, cu, TS, False,
                                   system=SYS)
        return qs, qk

    return jax.vmap(build)(zs)


def test_mobile_qpk_repacks_to_qps(qp_batch):
    """Kernel-direct assembly carries the same QP at mobile dims."""
    qp_s, qp_k = qp_batch
    re_s = jax.vmap(lambda q: qps.qpk_to_qps(q, system=SYS))(qp_k)
    sl = {"d_xu": np.s_[:, 1:], "d_xl": np.s_[:, 1:],
          "cpx": np.s_[:, :-1], "d_p": np.s_[:, :-1]}
    for f in qp_s.__dataclass_fields__:
        idx = sl.get(f, np.s_[:])
        a, b = getattr(qp_s, f)[idx], getattr(re_s, f)[idx]
        assert float(jnp.max(jnp.abs(a - b))) < 1e-6, f


@pytest.mark.parametrize("scheme", ["adaptive", "mehrotra"])
def test_mobile_pallas_ipm_matches_xla_reference(qp_batch, scheme):
    """Both centering schemes at nx=12/nu=11/nc=77: kernel vs XLA reference.

    Iteration counts may differ by at most one (f32 summation-order drift
    near the convergence thresholds — ADVICE r3); verdicts and the primal
    step must agree.
    """
    qp_s, qp_k = qp_batch
    ref = jax.vmap(lambda q: qp_ipm.solve_qp_ipm_s(q, max_iter=30,
                                                   scheme=scheme))(qp_s)
    sol = qp_ipm_pallas._solve_batched(qp_k, system=SYS, max_iter=30,
                                       interpret=True, scheme=scheme)
    assert int(np.max(np.abs(np.asarray(ref.iters)
                             - np.asarray(sol.iters)))) <= 1
    np.testing.assert_array_equal(np.asarray(ref.solved),
                                  np.asarray(sol.solved))
    assert bool(jnp.all(sol.solved))
    assert float(jnp.max(jnp.abs(ref.du - sol.du))) < 1e-3
    assert float(jnp.max(jnp.abs(ref.dx_tilde - sol.dx_tilde))) < 1e-3


def test_mobile_pallas_warm_start(qp_batch):
    """Warm-started mobile solves: correct and fewer iterations than cold."""
    qp_s, qp_k = qp_batch
    cold = qp_ipm_pallas._solve_batched(qp_k, system=SYS, max_iter=30,
                                        interpret=True)
    ws = jnp.clip(cold.s_rows, 1e-2, 1e3)
    wl = jnp.clip(cold.lam_rows, 1e-2, 1e3)
    warm = qp_ipm_pallas._solve_batched(qp_k, system=SYS, max_iter=30,
                                        interpret=True, warm_s=ws, warm_lam=wl)
    ref = jax.vmap(lambda q, a, b: qp_ipm.solve_qp_ipm_s(
        q, max_iter=30, warm_s=a, warm_lam=b))(qp_s, ws, wl)
    assert bool(jnp.all(warm.solved))
    assert float(jnp.max(jnp.abs(ref.du - warm.du))) < 1e-3
    assert int(jnp.max(warm.iters)) < int(jnp.max(cold.iters))
