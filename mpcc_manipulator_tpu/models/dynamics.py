"""System dynamics: continuous model, exact ZOH discretization, integrators.

The model is the linear ODE of the reference (`cpp/src/Model/model.cpp:31-65`):

    qdot = dq,   sdot = vs,   vsdot = dVs

The reference discretizes by a (9+8+1)-dim matrix exponential every knot
(`model.cpp:67-91`).  Because ``A`` here is nilpotent (``A @ A == 0``) the
exponential has the closed form

    Ad = I + A*Ts,   Bd = B*Ts + A @ B * Ts^2 / 2,   gd = 0

which we precompute once as constants — removing an 18x18 ``expm`` per knot
per SQP iteration from the hot path with *exactly* identical numerics
(verified against ``scipy.linalg.expm`` in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..system import PANDA, System

FINE_TIME_STEP = 1e-3   # plant substep (`integrator.h:53`)


def continuous_ab(system: System = PANDA) -> tuple[np.ndarray, np.ndarray]:
    """Continuous-time (A, B) as numpy constants."""
    dof, nx, nu = system.dof, system.nx, system.nu
    a = np.zeros((nx, nx))
    a[system.s_idx, system.vs_idx] = 1.0
    b = np.zeros((nx, nu))
    b[:dof, :dof] = np.eye(dof)
    b[system.vs_idx, system.dvs_idx] = 1.0
    return a, b


def discrete_ab(ts: float, system: System = PANDA
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact ZOH (Ad, Bd, gd) via the closed form (A is nilpotent)."""
    a, b = continuous_ab(system)
    ad = np.eye(system.nx) + a * ts
    bd = b * ts + a @ b * (ts * ts / 2.0)
    gd = np.zeros(system.nx)
    return ad, bd, gd


def dynamics_f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Continuous dynamics ``f(x, u)`` (`Model::getF`).

    Shape-generic: the velocity-controlled dof count is derived from the
    input size (``x = [q(dof), s, vs]``, ``u = [dq(dof), dVs]``), so the same
    function serves the fixed-base and mobile systems.
    """
    dof = u.shape[-1] - 1
    return jnp.concatenate([
        u[:dof],
        x[dof + 1][None],   # sdot = vs
        u[dof][None],       # vsdot = dVs
    ])


def rk4_step(x: jnp.ndarray, u: jnp.ndarray, ts) -> jnp.ndarray:
    """Classic RK4 step (`Integrator::RK4`)."""
    k1 = dynamics_f(x, u)
    k2 = dynamics_f(x + ts / 2.0 * k1, u)
    k3 = dynamics_f(x + ts / 2.0 * k2, u)
    k4 = dynamics_f(x + ts * k3, u)
    return x + ts * (k1 / 6.0 + k2 / 3.0 + k3 / 3.0 + k4 / 6.0)


def euler_step(x: jnp.ndarray, u: jnp.ndarray, ts) -> jnp.ndarray:
    """Forward-Euler step (`Integrator::EF`)."""
    return x + ts * dynamics_f(x, u)


from functools import partial


@partial(jax.jit, static_argnames=("ts", "fine_step"))
def sim_time_step(x: jnp.ndarray, u: jnp.ndarray, ts: float,
                  fine_step: float = FINE_TIME_STEP) -> jnp.ndarray:
    """Plant integration: repeated RK4 at 1 ms substeps
    (`Integrator::simTimeStep`).  jitted with static step counts so repeated
    host-loop calls hit the compile cache."""
    n = int(round(ts / fine_step))
    return jax.lax.fori_loop(0, n, lambda _, xc: rk4_step(xc, u, fine_step), x)
