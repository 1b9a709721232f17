"""Mass matrix / nonlinear-effects tests (independent energy cross-checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpcc_manipulator_tpu.models import rigid_body as rb
from mpcc_manipulator_tpu.models.rigid_body import (_COM_EFF, _INERTIA_EFF,
                                                    _MASS_EFF, _frames)
from mpcc_manipulator_tpu.config import PANDA_DOF


def _kinetic_direct(q, qd):
    """Kinetic energy summed per body from COM velocities and angular
    velocities — no mass-matrix involved (independent check)."""
    rs, ps = _frames(q)
    axes = [r[:, 2] for r in rs]
    T = 0.0
    for body in range(PANDA_DOF):
        com_w = ps[body] + rs[body] @ jnp.asarray(_COM_EFF[body], dtype=q.dtype)
        w = jnp.zeros(3, dtype=q.dtype)
        v = jnp.zeros(3, dtype=q.dtype)
        for j in range(body + 1):
            w = w + axes[j] * qd[j]
            v = v + jnp.cross(axes[j], com_w - ps[j]) * qd[j]
        i_w = rs[body] @ jnp.asarray(_INERTIA_EFF[body], dtype=q.dtype) @ rs[body].T
        T = T + 0.5 * _MASS_EFF[body] * jnp.dot(v, v) + 0.5 * w @ i_w @ w
    return T


def test_mass_matrix_symmetric_pd():
    rng = np.random.default_rng(0)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
        m = np.asarray(rb.mass_matrix(q))
        assert np.allclose(m, m.T, atol=1e-10)
        assert np.linalg.eigvalsh(m).min() > 0


def test_mass_matrix_matches_direct_kinetic_energy():
    rng = np.random.default_rng(1)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
        qd = jnp.asarray(rng.standard_normal(7))
        t_direct = float(_kinetic_direct(q, qd))
        t_crba = 0.5 * float(qd @ rb.mass_matrix(q) @ qd)
        assert abs(t_direct - t_crba) < 1e-9 * max(1.0, abs(t_direct))


def test_nle_gravity_only_at_rest():
    # at qdot = 0 the NLE is pure gravity torque: check against FD of the
    # potential energy
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, 7))
    tau = np.asarray(rb.nonlinear_effects(q, jnp.zeros(7)))

    def potential(qq):
        rs, ps = _frames(qq)
        u = 0.0
        for i in range(PANDA_DOF):
            com_w = ps[i] + rs[i] @ jnp.asarray(_COM_EFF[i], dtype=qq.dtype)
            u = u - _MASS_EFF[i] * (-9.81) * 0 - _MASS_EFF[i] * jnp.dot(
                jnp.asarray([0.0, 0.0, -9.81], dtype=qq.dtype), com_w)
        return u

    eps = 1e-6
    for i in range(7):
        dq = jnp.zeros(7).at[i].set(eps)
        fd = (float(potential(q + dq)) - float(potential(q - dq))) / (2 * eps)
        assert abs(fd - tau[i]) < 1e-5


def test_nle_power_balance():
    # energy rate: d/dt(T + U) = qd . tau with tau = M qdd + nle; choose
    # qdd = 0 so tau = nle and dT/dt must equal qd.(Mdot qd)/... verified
    # via finite differences of total energy along the flow
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, 7))
    qd = jnp.asarray(rng.standard_normal(7) * 0.5)
    tau = np.asarray(rb.nonlinear_effects(q, qd))

    def total_energy(qq, qqd):
        rs, ps = _frames(qq)
        u = 0.0
        for i in range(PANDA_DOF):
            com_w = ps[i] + rs[i] @ jnp.asarray(_COM_EFF[i], dtype=qq.dtype)
            u = u - _MASS_EFF[i] * jnp.dot(
                jnp.asarray([0.0, 0.0, -9.81], dtype=qq.dtype), com_w)
        return float(_kinetic_direct(qq, qqd)) + float(u)

    # with qdd = 0, d/dt E = qd^T (C qd + g) = qd . nle
    eps = 1e-6
    e_plus = total_energy(q + eps * qd, qd)
    e_minus = total_energy(q - eps * qd, qd)
    de_dt = (e_plus - e_minus) / (2 * eps)
    assert abs(de_dt - float(np.dot(np.asarray(qd), tau))) < 1e-4
