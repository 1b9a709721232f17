"""Pallas kinematics kernel vs the XLA reference (interpret mode).

`ops/pallas_kinematics.py` computes FK, the 6xdof point Jacobian, and the
analytic manipulability gradient; contract is f32-level agreement with
`kinematics.fk_chain`/`ee_jacobian`/`manipulability_and_grad_from_frames`
(and the mobile composition), plus RobotData-level agreement of the full
`kin_backend="pallas"` path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcc_manipulator_tpu.models import collision_nn as cnn
from mpcc_manipulator_tpu.models import kinematics as kin
from mpcc_manipulator_tpu.ocp.robot_data import compute_robot_data
from mpcc_manipulator_tpu.ops import pallas_kinematics as pkin
from mpcc_manipulator_tpu.system import HUSKY_PANDA, PANDA

DT = jnp.float32

Q_HOME = np.array([0., 0., 0., -np.pi / 2, 0., np.pi / 2, np.pi / 4])


def _qs(system, n=8, seed=3):
    rng = np.random.default_rng(seed)
    if system.base_dof == 0:
        base = np.tile(Q_HOME, (n, 1))
    else:
        base = np.tile(np.concatenate([[0.1, -0.2, 0.4], Q_HOME]), (n, 1))
    return jnp.asarray(base + 0.3 * rng.standard_normal(base.shape),
                       dtype=DT)


def test_kin_kernel_matches_xla_panda():
    qs = _qs(PANDA)
    pe, re, jv, jw, mani, dm = pkin.kin_sweep(qs, system=PANDA,
                                              interpret=True)

    def ref_one(q):
        p_ee, r_ee, origins, axes = kin.fk_chain(q)
        jv1 = jnp.cross(axes, p_ee[None, :] - origins).T
        m, d = kin.manipulability_and_grad_from_frames(p_ee, origins, axes)
        return p_ee, r_ee, jv1, axes.T, m, d

    rpe, rre, rjv, rjw, rm, rdm = jax.vmap(ref_one)(qs)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(rpe), atol=2e-6)
    np.testing.assert_allclose(np.asarray(re), np.asarray(rre), atol=2e-6)
    np.testing.assert_allclose(np.asarray(jv), np.asarray(rjv), atol=2e-6)
    np.testing.assert_allclose(np.asarray(jw), np.asarray(rjw), atol=2e-6)
    np.testing.assert_allclose(np.asarray(mani), np.asarray(rm),
                               rtol=2e-5, atol=1e-6)
    # the gradient runs ill-conditioned intermediates (A^-1 J) in f32
    np.testing.assert_allclose(np.asarray(dm), np.asarray(rdm),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("system", [PANDA, HUSKY_PANDA],
                         ids=["panda", "husky_panda"])
def test_robot_data_pallas_backend_matches_xla(system):
    """Full RobotData with kin_backend='pallas' vs the XLA path."""
    sel_nn = cnn.load_self_collision_nn(dtype=DT)
    env_nn = cnn.load_env_collision_nn(dtype=DT)
    qs = _qs(system, n=6)
    obs = jnp.asarray([0.5, 0.1, 0.5], dtype=DT)
    mg = "analytic" if system.base_dof == 0 else "ad"
    ref = compute_robot_data(qs, obs, 3.0, sel_nn, env_nn, mani_grad=mg,
                             system=system, kin_backend="xla")
    got = compute_robot_data(qs, obs, 3.0, sel_nn, env_nn,
                             mani_grad="analytic", system=system,
                             kin_backend="pallas", kin_interpret=True)
    for f in ref.__dataclass_fields__:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        g = np.asarray(getattr(got, f), dtype=np.float64)
        assert a.shape == g.shape, f
        scale = max(1.0, np.abs(a).max())
        # d_manipul: analytic vs AD agree to roundoff, but the f32 solve
        # amplifies near-singular configurations — keep a looser bound
        tol = 2e-3 if f == "d_manipul" else 1e-5
        assert np.abs(a - g).max() <= tol * scale, (f, np.abs(a - g).max())


def test_kin_kernel_rejects_fd_gradient():
    sel_nn = cnn.load_self_collision_nn(dtype=DT)
    env_nn = cnn.load_env_collision_nn(dtype=DT)
    with pytest.raises(ValueError, match="analytic"):
        compute_robot_data(_qs(PANDA, 2), jnp.zeros(3, DT), 0.0, sel_nn,
                           env_nn, mani_grad="fd", system=PANDA,
                           kin_backend="pallas", kin_interpret=True)
