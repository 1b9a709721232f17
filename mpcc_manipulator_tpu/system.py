"""System descriptors: the robot platform as a static (trace-time) object.

The reference hard-codes one active system — the fixed-base Panda
(`cpp/include/config.h:29-36`; the Husky mobile base exists only as the
dormant ``setHusky``, `robot_model.cpp:321-352`).  This framework makes the
platform a first-class *static* parameter: a frozen, hashable dataclass of
integer dimensions that jitted functions take as a ``static_argnames`` entry.
Every OCP/solver module derives its shapes from the :class:`System` instead
of module constants, so the same code compiles for:

* ``PANDA`` — fixed-base 7-DOF arm, the reference-conformance target
  (state ``[q(7), s, vs]``, input ``[dq(7), dVs]``);
* ``HUSKY_PANDA`` — 10-DOF mobile manipulator (BASELINE configs 4-5):
  planar virtual base joints + arm (state ``[x_b, y_b, th_b, q(7), s, vs]``,
  input ``[dx_b, dy_b, dth_b, dq(7), dVs]``), matching the reference's
  virtual-joint construction of the Husky base.

Only integers/strings live here (hashable -> usable as a jit static arg);
kinematics dispatch happens in `ocp/robot_data.py` by ``system.name``.
"""

from __future__ import annotations

import dataclasses

# Default horizon and spline resolution (`cpp/include/config.h:35-36`).
# The reference bakes N=10 at compile time; here it is a *field* of the
# static System descriptor, so any horizon compiles through the same
# stage-separable machinery (`dataclasses.replace(PANDA, horizon=20)`) —
# the long-context scaling axis of SURVEY.md §5.
N = 10
N_SPLINE = 100
INF = 1e30


@dataclasses.dataclass(frozen=True)
class System:
    """Static dimensional description of one robot platform."""

    name: str            # kinematics dispatch key: "panda" | "husky_panda"
    base_dof: int        # 0 (fixed base) or 3 (planar virtual joints)
    arm_dof: int = 7
    num_links: int = 9   # env-collision distance rows (link0..7 + hand)
    horizon: int = N     # MPC horizon (knots 0..horizon)

    # ---- velocity-controlled generalized coordinates
    @property
    def dof(self) -> int:
        return self.base_dof + self.arm_dof

    # ---- state / input / constraint dimensions
    @property
    def nx(self) -> int:
        """State dim: [q(dof), s, vs]."""
        return self.dof + 2

    @property
    def nu(self) -> int:
        """Input dim: [dq(dof), dVs]."""
        return self.dof + 1

    @property
    def npc(self) -> int:
        """Polytopic rows/knot: self-collision, singularity, env rows."""
        return 2 + self.num_links

    # ---- state/input component indices
    @property
    def s_idx(self) -> int:
        return self.dof

    @property
    def vs_idx(self) -> int:
        return self.dof + 1

    @property
    def dvs_idx(self) -> int:
        return self.dof

    @property
    def arm_slice(self) -> slice:
        """Slice of the arm joints inside q / dq vectors."""
        return slice(self.base_dof, self.base_dof + self.arm_dof)

    # ---- dense decision-vector layout (`osqp_interface.h:113-117`)
    @property
    def n_var(self) -> int:
        return self.nx * (self.horizon + 1) + self.nu * self.horizon

    @property
    def n_eq(self) -> int:
        return self.nx * (self.horizon + 1)

    @property
    def n_ineqb(self) -> int:
        # state boxes + input boxes + rate rows (nu-strided, dof used/knot)
        return (self.nx * (self.horizon + 1) + self.nu * self.horizon
                + self.nu * self.horizon)

    @property
    def n_ineqp(self) -> int:
        return self.npc * (self.horizon + 1)

    @property
    def n_constr(self) -> int:
        return self.n_eq + self.n_ineqb + self.n_ineqp

    # ---- stage-separable (Riccati/IPM) layout, state augmentation
    # x~ = [x; u_prev]  (`ocp/qp_stages.py`)
    @property
    def nxt(self) -> int:
        return self.nx + self.nu

    @property
    def nzt(self) -> int:
        return self.nxt + self.nu

    @property
    def nc_stage(self) -> int:
        """Inequality rows per stage: state box x2, input box x2,
        rate rows x2 (all dof inputs), polytopic."""
        return 2 * self.nx + 2 * self.nu + 2 * self.dof + self.npc


PANDA = System(name="panda", base_dof=0)
HUSKY_PANDA = System(name="husky_panda", base_dof=3)

SYSTEMS = {s.name: s for s in (PANDA, HUSKY_PANDA)}

# Sanity: the Panda instance reproduces the reference's compile-time layout.
assert PANDA.nx == 9 and PANDA.nu == 8 and PANDA.npc == 11
assert PANDA.n_var == 179 and PANDA.n_constr == 479
assert HUSKY_PANDA.nx == 12 and HUSKY_PANDA.nu == 11 and HUSKY_PANDA.dof == 10
