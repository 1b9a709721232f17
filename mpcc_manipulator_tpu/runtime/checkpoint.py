"""Checkpoint/resume for long closed-loop and fleet runs.

The reference has no checkpointing at all — its closest analogs are the
tick-to-tick warm-start state (`mpc.h:121`) and offline text logs
(SURVEY.md §5).  For batch-scale fleet runs (thousands of scenarios x 1e4
ticks) on preemptible accelerators, resumability is a real operational
requirement, so this framework makes the *entire* loop state an explicit
pytree — ``(MPCCarry, x, u, tick)`` per scenario — and checkpoints it.

Format: a single ``.npz`` with keypath-encoded array names plus a step
counter — no pickling, no framework lock-in, readable by plain numpy.
Restore takes a template pytree (the standard JAX pattern) so structure and
dtypes are validated against the running program rather than trusted from
disk.  Writes are atomic (tmp file + rename) so a preemption mid-write
never corrupts the previous checkpoint.
"""

from __future__ import annotations

import os
import re
import tempfile

import jax
import numpy as np

_STEP_KEY = "__step__"


def _flatten_with_names(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        # npz member names must be unique and filesystem-safe
        name = re.sub(r"[^A-Za-z0-9_.\[\]']+", "_", name)
        out.append((name, leaf))
    return out


def save_state(path: str, state, step: int) -> None:
    """Atomically write ``state`` (any pytree of arrays) + step counter."""
    named = _flatten_with_names(state)
    arrays = {name: np.asarray(leaf) for name, leaf in named}
    if len(arrays) != len(named):
        raise ValueError("duplicate keypath names in checkpoint tree")
    arrays[_STEP_KEY] = np.asarray(step, dtype=np.int64)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())   # durable before the rename is visible
        os.replace(tmp, path)
        # fsync the directory so the rename itself survives a crash
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_state(path: str, template):
    """Load a checkpoint into the structure of ``template``.

    Returns ``(state, step)``.  Every leaf is validated against the
    template's shape and dtype; missing or extra arrays are errors, and so
    is a dtype mismatch unless it is an exact-value-preserving widening
    (e.g. a float32 checkpoint into a float64 template).  A checkpoint from
    a different program shape/precision fails loudly, never half-loads or
    silently truncates (advisor finding, round 2).
    """
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    step = int(stored.pop(_STEP_KEY))
    named = _flatten_with_names(template)
    missing = [n for n, _ in named if n not in stored]
    extra = set(stored) - {n for n, _ in named}
    if missing or extra:
        raise ValueError(f"checkpoint/template mismatch: missing={missing} "
                         f"extra={sorted(extra)}")
    leaves = []
    for name, tleaf in named:
        arr = stored[name]
        tshape = np.shape(tleaf)
        if tuple(arr.shape) != tuple(tshape):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != "
                             f"template shape {tshape}")
        tdtype = np.asarray(tleaf).dtype
        if arr.dtype != tdtype and not np.can_cast(arr.dtype, tdtype,
                                                   casting="safe"):
            raise ValueError(
                f"{name}: checkpoint dtype {arr.dtype} does not safely cast "
                f"to template dtype {tdtype} (lossy restore refused)")
        leaves.append(np.asarray(arr, dtype=tdtype))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def latest_checkpoint(directory: str, prefix: str = "ckpt_"):
    """Path of the highest-step ``{prefix}{step}.npz`` in ``directory``,
    or None."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    pat = re.compile(re.escape(prefix) + r"(\d+)\.npz$")
    for fn in os.listdir(directory):
        m = pat.match(fn)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(directory, fn)
    return best
