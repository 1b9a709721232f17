"""Static problem dimensions and index maps for the TPU-native MPCC engine.

Mirrors the compile-time configuration of the reference implementation
(`cpp/include/config.h:29-77`): a Franka Panda 7-DOF manipulator tracking a
6-D arc-length-parameterized path. State is ``x = [q1..q7, s, vs]`` (joint
angles, path parameter, path-parameter velocity); input is
``u = [dq1..dq7, dVs]``.

Everything here is a Python/static constant: all shapes in the engine are
fixed at trace time, which is what XLA wants (no dynamic shapes anywhere in
the hot path).
"""

from __future__ import annotations

PANDA_DOF = 7          # number of revolute joints
PANDA_NUM_LINKS = 9    # link0..link7 + hand(_tcp) frames tracked for env collision

NX = 9                 # state dim:  [q(7), s, vs]
NU = 8                 # input dim:  [dq(7), dVs]
NPC = 2 + PANDA_NUM_LINKS  # polytopic rows/knot: self-collision, singularity, 9x env-collision

N = 10                 # horizon length (knots 0..N)
N_SPLINE = 100         # arc-length spline resampling points
INF = 1e30             # "infinity" used in constraint bounds (matches reference)

# Decision vector layout (identical to `osqp_interface.h:113-117`):
#   z = [x_0 .. x_N, u_0 .. u_{N-1}]  with  N_var = NX*(N+1) + NU*N = 179
N_VAR = NX * (N + 1) + NU * N
# Equality rows: x_0 pinned + N dynamics defects
N_EQ = NX * (N + 1)
# Bound rows: state boxes + input boxes + ddq (rate) rows (NU-strided, 7 used per knot)
N_INEQB = NX * (N + 1) + NU * N + NU * N
# Polytopic rows
N_INEQP = NPC * (N + 1)
N_CONSTR = N_EQ + N_INEQB + N_INEQP  # = 479

assert N_VAR == 179 and N_CONSTR == 479


class StateIndex:
    """Index of each state component inside an ``(NX,)`` vector."""
    q1, q2, q3, q4, q5, q6, q7 = range(PANDA_DOF)
    s = 7
    vs = 8


class InputIndex:
    """Index of each input component inside an ``(NU,)`` vector."""
    dq1, dq2, dq3, dq4, dq5, dq6, dq7 = range(PANDA_DOF)
    dVs = 7


class ConstraintIndex:
    """Row index of each polytopic constraint inside an ``(NPC,)`` block."""
    con_selcol = 0
    con_sing = 1
    con_envcol1 = 2   # env collision rows 2..10 (link0..link7, hand)


def state_offset(k: int) -> int:
    """Offset of state ``x_k`` inside the stacked decision vector."""
    return NX * k


def input_offset(k: int) -> int:
    """Offset of input ``u_k`` inside the stacked decision vector."""
    return NX * (N + 1) + NU * k
