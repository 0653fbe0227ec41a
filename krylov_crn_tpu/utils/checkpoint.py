"""Solver-state checkpoint / resume.

The reference only pickles traces and resumes per-seed (opt_trace.py:102-120,
optimizer.py:70-71) — optimizer state (x, reg_coef, r0) is lost across
restarts (SURVEY.md §5). Here the full solver-state pytree (iterate or Gram
rep, margins cache, reg_coef, warm-started secular root, PRNG key) plus the
run counters and trace arrays round-trip through a single .npz file, so a
run continues exactly where it stopped.
"""

from __future__ import annotations

import io
import json
from pathlib import Path

import jax
import numpy as np

__all__ = ["save_state", "load_state", "save_run", "load_run"]


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path, state, extra: dict | None = None) -> None:
    """Write a pytree of arrays (+ JSON-serializable extras) to .npz."""
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__extra__"] = np.frombuffer(
        json.dumps(extra or {}).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with io.BytesIO() as buf:
        np.savez(buf, **arrays)
        path.write_bytes(buf.getvalue())


def load_state(path, like_state):
    """Read back into the same pytree structure as ``like_state``.

    Returns (state, extra_dict).
    """
    with np.load(Path(path), allow_pickle=False) as z:
        extra = json.loads(bytes(z["__extra__"].tobytes()).decode())
        leaves, treedef = _flatten(like_state)
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            new_leaves.append(
                jax.numpy.asarray(arr, getattr(leaf, "dtype", None))
            )
    return jax.tree_util.tree_unflatten(treedef, new_leaves), extra


def save_run(path, optimizer) -> None:
    """Checkpoint an Optimizer mid-run: state + counters + trace."""
    trace = optimizer.trace
    extra = {
        "it": optimizer.it,
        "t": optimizer.t,
        "its": [int(i) for i in trace.its],
        "ts": [float(t) for t in trace.ts],
        "loss_vals": [float(v) for v in np.asarray(trace.loss_vals).ravel()]
        if len(trace.loss_vals) else [],
        "solver_its": ([int(s) for s in trace.solver_its]
                       if trace.solver_its else None),
        "max_progress": optimizer.max_progress,
        "label": optimizer.label,
    }
    save_state(path, optimizer.state, extra)


def load_run(path, optimizer) -> None:
    """Restore a checkpoint written by save_run into an initialized
    Optimizer (call after init_run with the same x0/config)."""
    state, extra = load_state(path, optimizer.state)
    optimizer.state = state
    optimizer.it = extra["it"]
    optimizer.t = extra["t"]
    optimizer.max_progress = extra.get("max_progress", 0)
    optimizer.trace.its = list(extra["its"])
    optimizer.trace.ts = list(extra["ts"])
    if extra["loss_vals"]:
        optimizer.trace.loss_vals = list(extra["loss_vals"])
    if extra["solver_its"] is not None:
        optimizer.trace.solver_its = list(extra["solver_its"])
