"""Elementwise math for the logistic oracle.

The reference's numba-jitted piecewise ``logsig`` and scipy ``expit``
(/root/reference/optimizer/loss.py:161-176, 225) become jax.nn primitives,
which use the same numerically-stable formulations and fuse into the
surrounding XLA graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["logsig", "sigmoid", "kahan_sum", "accum_sum", "accum_dot"]


def logsig(x):
    """log(sigmoid(x)) = -softplus(-x), numerically stable across the line."""
    return jax.nn.log_sigmoid(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def kahan_sum(x):
    """Compensated (Kahan) summation of a 1-D array in its own dtype.

    Vectorized: the array is folded into (steps, lanes) and a short scan runs
    Kahan across `steps` with whole-lane vector ops, then the per-lane sums
    (now error-compensated) are reduced with a final pairwise sum. Used for
    fp32 loss reductions when fp64 is unavailable (SURVEY.md hard part (c)).
    """
    lanes = 4096
    n = x.shape[0]
    steps = -(-n // lanes)
    pad = steps * lanes - n
    xf = jnp.pad(x, (0, pad)).reshape(steps, lanes)

    def body(carry, row):
        s, c = carry
        y = row - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    init = (jnp.zeros((lanes,), x.dtype), jnp.zeros((lanes,), x.dtype))
    (s, c), _ = jax.lax.scan(body, init, xf)
    return jnp.sum(s - c)


def accum_sum(x, accum_dtype):
    """Sum with upcast accumulation; falls back to Kahan when the accum
    dtype equals the storage dtype (i.e. x64 disabled)."""
    if jnp.dtype(accum_dtype) == x.dtype:
        return kahan_sum(x)
    return jnp.sum(x.astype(accum_dtype))


def accum_dot(x, y, accum_dtype):
    """<x, y> with upcast (or compensated) accumulation."""
    if jnp.dtype(accum_dtype) == x.dtype:
        return kahan_sum(x * y)
    return jnp.dot(x.astype(accum_dtype), y.astype(accum_dtype))
