"""Parameter system: JSON files + runtime override maps -> JAX pytrees.

Capability parity with the reference param classes (`cpp/src/Params/params.cpp`,
`cpp/include/Params/params.h:32-247`): each parameter group loads from a JSON
file, and every key can be overridden at runtime through a ``{key: value}``
map (the reference's ``ParamValue`` semantics, `params.cpp:53-82`).

TPU-first design difference: instead of C++ classes with scalar members, each
group becomes a registered JAX pytree of device scalars/vectors
(``flax.struct.dataclass``).  Because they are *traced* arguments of the
jitted solve, ``set_param`` updates never trigger recompilation — the
reference pays an object-rebuild per ``setParam`` (`osqp_interface.cpp:95-100`);
we pay nothing.

Solver options that control trace-time structure (iteration caps, feature
toggles) live in :class:`SQPConfig`, a hashable static dataclass.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np
from flax import struct

from .system import PANDA, System

# --------------------------------------------------------------------------
# Asset resolution
# --------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PARAM_DIR = os.path.join(_REPO_ROOT, "assets", "params")


def param_path(name: str, param_dir: str | None = None) -> str:
    """Resolve a parameter JSON file name inside the asset directory."""
    return os.path.join(param_dir or DEFAULT_PARAM_DIR, name)


def _load_json(file: str) -> dict:
    with open(file, "r") as f:
        return json.load(f)


def _get(js: Mapping[str, Any], overrides: Mapping[str, float] | None, key: str):
    """Reference override-merge semantics: override map wins over JSON value."""
    if overrides is not None and key in overrides:
        return overrides[key]
    return js[key]


# --------------------------------------------------------------------------
# Model / tolerance parameters  (reference `Param`, model.json)
# --------------------------------------------------------------------------


@struct.dataclass
class ModelParams:
    """Projection / progress / constraint-tolerance parameters (model.json)."""

    max_dist_proj: jnp.ndarray      # projection jump threshold [m]
    desired_ee_velocity: jnp.ndarray  # reference path speed [m/s]
    s_trust_region: jnp.ndarray     # trust region on s per solve [m]
    deacc_ratio: jnp.ndarray        # fraction of track length where v_des tapers
    tol_sing: jnp.ndarray           # manipulability buffer
    tol_selcol: jnp.ndarray         # self-collision buffer [cm]
    tol_envcol: jnp.ndarray         # env-collision buffer [cm]


def load_model_params(file: str, overrides: Mapping[str, float] | None = None,
                      dtype=jnp.float64) -> ModelParams:
    js = _load_json(file)
    g = lambda k: jnp.asarray(_get(js, overrides, k), dtype=dtype)
    return ModelParams(
        max_dist_proj=g("max_dist_proj"),
        desired_ee_velocity=g("desired_ee_velocity"),
        s_trust_region=g("s_trust_region"),
        deacc_ratio=g("deaccelerate_ratio"),
        tol_sing=g("tol_sing"),
        tol_selcol=g("tol_selcol"),
        tol_envcol=g("tol_envcol"),
    )


# --------------------------------------------------------------------------
# Cost parameters  (reference `CostParam`, cost.json)
# --------------------------------------------------------------------------


@struct.dataclass
class CostParams:
    """MPCC cost weights (cost.json)."""

    q_c: jnp.ndarray          # contouring error weight
    q_c_N_mult: jnp.ndarray   # terminal contouring multiplier
    q_l: jnp.ndarray          # lag error weight
    q_vs: jnp.ndarray         # progress-velocity tracking weight
    q_ori: jnp.ndarray        # SO(3) heading error weight
    q_sing: jnp.ndarray       # singularity (manipulability) reward weight
    r_dq: jnp.ndarray         # joint velocity regularization
    r_ddq: jnp.ndarray        # cross-knot joint acceleration regularization
    r_dVs: jnp.ndarray        # dVs regularization
    q_c_red_ratio: jnp.ndarray    # proximity-triggered contouring reduction
    q_l_inc_ratio: jnp.ndarray    # proximity-triggered lag increase
    q_ori_red_ratio: jnp.ndarray  # proximity-triggered heading reduction


def load_cost_params(file: str, overrides: Mapping[str, float] | None = None,
                     dtype=jnp.float64) -> CostParams:
    js = _load_json(file)
    g = lambda k: jnp.asarray(_get(js, overrides, k), dtype=dtype)
    return CostParams(
        q_c=g("qC"), q_c_N_mult=g("qCNmult"), q_l=g("qL"), q_vs=g("qVs"),
        q_ori=g("qOri"), q_sing=g("qSing"),
        r_dq=g("rdq"), r_ddq=g("rddq"), r_dVs=g("rdVs"),
        q_c_red_ratio=g("qC_reduction_ratio"),
        q_l_inc_ratio=g("qL_increase_ratio"),
        q_ori_red_ratio=g("qOri_reduction_ratio"),
    )


# --------------------------------------------------------------------------
# Bounds parameters  (reference `BoundsParam`, bounds.json)
# --------------------------------------------------------------------------


@struct.dataclass
class BoundsParams:
    """Box bounds on state, input, and joint acceleration (bounds.json)."""

    x_l: jnp.ndarray   # (NX,)
    x_u: jnp.ndarray   # (NX,)
    u_l: jnp.ndarray   # (NU,)
    u_u: jnp.ndarray   # (NU,)
    ddq_l: jnp.ndarray  # (PANDA_DOF,)
    ddq_u: jnp.ndarray  # (PANDA_DOF,)


_X_KEYS = ["q1", "q2", "q3", "q4", "q5", "q6", "q7", "s", "vs"]
_U_KEYS = ["dq1", "dq2", "dq3", "dq4", "dq5", "dq6", "dq7", "dVs"]
_DDQ_KEYS = ["ddq1", "ddq2", "ddq3", "ddq4", "ddq5", "ddq6", "ddq7"]

# Mobile-base (Husky+Panda) extension keys, prepended for system.base_dof=3;
# values come from assets/params/mobile.json merged over the panda files.
_XB_KEYS = ["xb", "yb", "thb"]
_UB_KEYS = ["dxb", "dyb", "dthb"]
_DDB_KEYS = ["ddxb", "ddyb", "ddthb"]


def _sys_keys(system: System):
    if system.base_dof == 0:
        return _X_KEYS, _U_KEYS, _DDQ_KEYS
    return _XB_KEYS + _X_KEYS, _UB_KEYS + _U_KEYS, _DDB_KEYS + _DDQ_KEYS


def _merge_mobile(js: dict, file: str, system: System) -> dict:
    if system.base_dof == 0:
        return js
    mob = _load_json(os.path.join(os.path.dirname(file), "mobile.json"))
    return {**mob, **js}


def load_bounds_params(file: str, overrides: Mapping[str, float] | None = None,
                       dtype=jnp.float64, system: System = PANDA) -> BoundsParams:
    js = _merge_mobile(_load_json(file), file, system)
    xk, uk, ddk = _sys_keys(system)
    g = lambda k: float(_get(js, overrides, k))
    return BoundsParams(
        x_l=jnp.asarray([g(k + "l") for k in xk], dtype=dtype),
        x_u=jnp.asarray([g(k + "u") for k in xk], dtype=dtype),
        u_l=jnp.asarray([g(k + "l") for k in uk], dtype=dtype),
        u_u=jnp.asarray([g(k + "u") for k in uk], dtype=dtype),
        ddq_l=jnp.asarray([g(k + "l") for k in ddk], dtype=dtype),
        ddq_u=jnp.asarray([g(k + "u") for k in ddk], dtype=dtype),
    )


# --------------------------------------------------------------------------
# Normalization parameters  (reference `NormalizationParam`, normalization.json)
# --------------------------------------------------------------------------


@struct.dataclass
class NormalizationParams:
    """Diagonal state/input scalings T_x, T_u (normalization.json).

    Stored as diagonal vectors; the engine multiplies gradients / Hessians /
    Jacobian blocks elementwise (cheaper than the reference's dense diag
    matmuls, same math: `osqp_interface.cpp:157-164, 243-245`).
    """

    t_x: jnp.ndarray      # (NX,)
    t_u: jnp.ndarray      # (NU,)

    @property
    def t_x_inv(self) -> jnp.ndarray:
        return 1.0 / self.t_x

    @property
    def t_u_inv(self) -> jnp.ndarray:
        return 1.0 / self.t_u


def load_normalization_params(file: str, overrides: Mapping[str, float] | None = None,
                              dtype=jnp.float64,
                              system: System = PANDA) -> NormalizationParams:
    js = _merge_mobile(_load_json(file), file, system)
    xk, uk, _ = _sys_keys(system)
    g = lambda k: float(_get(js, overrides, k))
    return NormalizationParams(
        t_x=jnp.asarray([g(k) for k in xk], dtype=dtype),
        t_u=jnp.asarray([g(k) for k in uk], dtype=dtype),
    )


# --------------------------------------------------------------------------
# SQP parameters  (reference `SQPParam`, sqp.json)
# --------------------------------------------------------------------------


@struct.dataclass
class SQPParams:
    """Runtime-tunable SQP scalars (sqp.json)."""

    eps_prim: jnp.ndarray
    eps_dual: jnp.ndarray
    line_search_tau: jnp.ndarray
    line_search_eta: jnp.ndarray
    line_search_rho: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SQPConfig:
    """Static (trace-time) SQP structure: loop bounds and feature toggles.

    Mirrors reference sqp.json keys `max_iter`, `line_search_max_iter`,
    `do_SOC`, `use_BFGS`.  Also carries the QP (ADMM) iteration budget, the
    TPU-native analog of OSQP's `time_limit = Ts/5` cutoff
    (`osqp_interface.cpp:625`): the reference accepts time-limited, inexact
    QP solutions, so a fixed iteration cap reproduces that contract.
    """

    max_iter: int = 100
    line_search_max_iter: int = 5
    # Real-time iteration (RTI) mode: every completed SQP iteration counts
    # as SOLVED (the single Newton-type iteration IS the solve; Diehl-style
    # closed-loop dynamic SQP — use with max_iter=1 and warm starts).  The
    # guard failures (NaN / non-PD Hessian) still fail hard.  Off by
    # default: the reference iterates to eps_prim; RTI is a documented
    # higher-throughput operating point (measured trade-off in
    # docs/ARCHITECTURE.md).
    rti: bool = False
    do_SOC: bool = False
    use_BFGS: bool = False
    qp_max_iter: int = 400
    qp_check_every: int = 25
    # Warm-start each SQP iteration's ADMM from the previous iteration's
    # primal/dual solution.  Speed-only deviation from the reference's
    # cold-per-QP OSQP usage; set False for strict cold-start semantics.
    qp_warm_start: bool = True
    # QP iteration backend: "xla" (lax.while_loop; CPU/f64), "pallas"
    # (fused VMEM-resident TPU kernel), "pallas_interpret" (kernel under the
    # interpreter, for CPU testing).
    qp_backend: str = "xla"
    # Line-search strategy: "filter" (reference default,
    # `osqp_interface.cpp:543`) or "merit" (the reference's unused l1-merit
    # Armijo variant, `osqp_interface.cpp:717-757`).
    line_search: str = "filter"
    # QP solver: "admm" (dense OSQP-style splitting, reference-faithful);
    # "riccati" (structured primal-dual IPM with Riccati inner solves on the
    # packed StageQP rows — ~12 Newton steps vs hundreds of ADMM iterations;
    # the fastest plain-XLA path; supports do_SOC and both line searches,
    # but use_BFGS raises — a dense Lagrangian-Hessian carry has no slot in
    # the stage elimination);
    # "riccati_struct" (same IPM on the structure-exploiting StageQPS —
    # numerically identical steps, the algorithm reference for the kernel);
    # "riccati_pallas" (StageQPS solved by the fused VMEM-resident TPU
    # kernel — the production TPU path).
    qp_solver: str = "admm"
    ipm_max_iter: int = 25
    # Fleet mode: replace the data-dependent SQP/IPM while_loops with
    # FIXED-trip-count fori_loops + per-lane convergence masking (identical
    # update math; converged lanes freeze).  Rationale: under a sharded
    # batch the while conditions become batch-GLOBAL convergence votes —
    # one cross-chip all-reduce per iteration, and the loop runs to the
    # slowest lane anyway, so early exit saves nothing at fleet scale
    # while the votes are pure communication overhead (measured: ~50
    # all-reduces/tick; they dominate cross-process step time on a gloo
    # cluster).  With fixed trips the compiled sharded program contains
    # ZERO cross-partition collectives (asserted in tests/test_multihost.py
    # and tests/test_weak_scaling.py).
    fleet_mode: bool = False
    # Collision-NN GEMMs in bfloat16 with f32 accumulation (MXU mixed
    # precision).  OFF by default: the measured win is small next to the
    # conformance risk (A/B numbers in docs/ARCHITECTURE.md; drift bounds
    # pinned in tests/test_nn_bf16.py).
    nn_bf16: bool = False
    # IPM centering scheme: "adaptive" (one Riccati solve/iteration, sigma
    # from achieved step length) or "mehrotra" (predictor-corrector; the
    # corrector reuses the iteration's Riccati factorization).
    ipm_scheme: str = "adaptive"
    # Warm-start the interior-point slacks/duals from the previous QP's
    # solution — across SQP iterations within a tick AND across ticks (the
    # warm state rides MPCCarry; reset to cold on guess invalidation).
    # Classic MPC warm starting: the active set barely changes tick-to-tick,
    # so the IPM starts near the central path and converges in fewer Newton
    # steps.  Values are clipped to [ipm_warm_clip_lo, ipm_warm_clip_hi]
    # (safely off the boundary) before seeding.  Speed-only extension —
    # cold start (False) reproduces the historical/reference-aligned
    # behavior; riccati-family solvers only.
    # Clip bounds (0.1, 100): measured to dominate cold start in both mean
    # AND max Newton iterations (2.45/5 vs cold 5.1/6 on the closed loop) —
    # the max matters because a batched tile runs to its slowest lane;
    # looser bounds (1e-2, 1e3) give a better mean (2.08) but a worse tail
    # (max 9), which LOSES throughput at batch scale.
    ipm_warm_start: bool = False
    ipm_warm_clip_lo: float = 0.1
    ipm_warm_clip_hi: float = 100.0
    # Manipulability gradient: "fd" (central difference, delta=1e-4 —
    # reference-exact, 15 FK sweeps), "ad" (exact autodiff, ~3x cheaper;
    # differs from fd by O(delta^2) ~ 1e-8), or "analytic" (closed-form
    # dJ/dq cross-product tensor + one 6x6 Cholesky solve, sharing
    # RobotData's FK pass — equals "ad" to roundoff at a fraction of the
    # cost; the production default in bench.py).
    mani_grad: str = "fd"
    # Pallas kernel execution mode for the riccati_pallas path: None =
    # auto-detect (compiled on TPU backends, interpreter elsewhere — see
    # qp_ipm_pallas.solve_qp_ipm_pallas); True forces the interpreter.
    # Needed explicitly when the process default backend is a TPU but the
    # computation targets a CPU mesh (dryrun_multichip on a box with the
    # tunneled-TPU plugin registered).
    ipm_interpret: bool | None = None
    # Stage-QP assembly backend (riccati_pallas only): "xla" (vmapped
    # build_qp_stages_k) or "pallas" (ops/pallas_assembly.py — the whole
    # per-SQP-iteration assembly fused into one batch-in-lanes kernel;
    # spline gathers become MXU contractions, everything else stays in
    # VMEM.  Step-exact to f32 vs the XLA path, tested both systems).
    qp_assembly: str = "xla"
    # RobotData kinematics backend: "xla" or "pallas"
    # (ops/pallas_kinematics.py — FK + point Jacobian + analytic
    # manipulability gradient as one lane-batch kernel; the collision-NN
    # matmuls stay XLA/MXU either way).  The pallas backend requires
    # mani_grad="analytic" on the fixed-base system.
    kin_backend: str = "xla"


def load_sqp_params(file: str, overrides: Mapping[str, float] | None = None,
                    dtype=jnp.float64) -> tuple[SQPParams, SQPConfig]:
    js = _load_json(file)
    g = lambda k: jnp.asarray(_get(js, overrides, k), dtype=dtype)
    gi = lambda k: int(_get(js, overrides, k))
    gb = lambda k: bool(_get(js, overrides, k))
    sqp = SQPParams(
        eps_prim=g("eps_prim"), eps_dual=g("eps_dual"),
        line_search_tau=g("line_search_tau"),
        line_search_eta=g("line_search_eta"),
        line_search_rho=g("line_search_rho"),
    )
    cfg = SQPConfig(
        max_iter=gi("max_iter"),
        line_search_max_iter=gi("line_search_max_iter"),
        do_SOC=gb("do_SOC"),
        use_BFGS=gb("use_BFGS"),
    )
    return sqp, cfg


# --------------------------------------------------------------------------
# Aggregate
# --------------------------------------------------------------------------


@struct.dataclass
class MPCCParams:
    """All runtime-tunable parameters of one MPCC instance, as one pytree.

    This is the traced-argument analog of the reference's per-object param
    members; `with_overrides` reproduces `MPC::setParam` (`mpc.cpp:204-209`).
    """

    model: ModelParams
    cost: CostParams
    bounds: BoundsParams
    normalization: NormalizationParams
    sqp: SQPParams


def load_params(param_dir: str | None = None,
                overrides: Mapping[str, Mapping[str, float]] | None = None,
                dtype=None, system: System = PANDA) -> tuple[MPCCParams, SQPConfig]:
    """Load the full parameter set.

    ``overrides`` is the reference's ``ParamValue``: a dict of groups
    (``param``, ``cost``, ``bounds``, ``normalization``, ``sqp``), each a
    ``{key: value}`` map merged over the JSON defaults.  For the mobile
    system the bounds/normalization vectors gain the base-joint entries
    (keys from ``mobile.json``).
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
    ov = overrides or {}
    sqp, cfg = load_sqp_params(param_path("sqp.json", param_dir), ov.get("sqp"), dtype)
    params = MPCCParams(
        model=load_model_params(param_path("model.json", param_dir), ov.get("param"), dtype),
        cost=load_cost_params(param_path("cost.json", param_dir), ov.get("cost"), dtype),
        bounds=load_bounds_params(param_path("bounds.json", param_dir),
                                  ov.get("bounds"), dtype, system),
        normalization=load_normalization_params(
            param_path("normalization.json", param_dir), ov.get("normalization"),
            dtype, system),
        sqp=sqp,
    )
    return params, cfg
