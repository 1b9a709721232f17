"""Independent f64 NumPy conformance oracle.

A standalone reimplementation of the reference MPCC pipeline
(`/root/reference/cpp/src/Interfaces/osqp_interface.cpp:398-656` and the L2-L6
layers feeding it) written directly from the reference C++ equations,
deliberately sharing **no code** with `mpcc_manipulator_tpu.ocp` /
`mpcc_manipulator_tpu.models` / `mpcc_manipulator_tpu.solver`:

* `panda`      — FK / 6x7 Jacobian / manipulability (+FD gradient) from the
                 hard-coded RBDL chain data (`robot_model.cpp:68-319`)
* `nets`       — collision MLPs: NeRF encoding, forward, analytic Jacobian
* `track_eval` — numpy evaluation + Newton projection over the *fitted*
                 spline coefficients (the fit itself is shared: it is
                 validated separately against analytic ground truth by
                 tests/test_splines.py, and coefficients are data)
* `nlp`        — cost / constraints / bounds / dynamics + the dense
                 normalized QP assembly in the reference's exact row layout
* `solver`     — a dense Mehrotra IPM QP solver (numpy, near-exact),
                 the SQP loop with the reference's filter line search
                 (including its acceptance latch), and the MPC tick
                 (projection, warm start, status machine)

Intended use: tests/test_conformance_oracle.py compares (a) the assembled QP
data elementwise at ~1e-9 and (b) 100+ closed-loop ticks on the real track
against `mpcc_manipulator_tpu.mpc.mpc_step`.  A shared assembly bug in the
production stack cannot hide from (a) because nothing here imports it.

Two deliberate, documented deviations from the reference are reproduced on
BOTH sides (they are the framework's intended semantics):
  1. the signed lag-error derivative (`ocp/cost.py` module docstring;
     reference `cost.cpp:110` uses the unsigned norm),
  2. input-box Jacobians on the input columns (`ocp/qp_data.py`; reference
     `osqp_interface.cpp:273` misindexes them into the state columns),
and additionally the true z second derivative is used for the track normal
(reference `cost.cpp:65` copies the y component — `ddz_ref = ddpos_ref(1)`).
"""
