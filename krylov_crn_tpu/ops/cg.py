"""Conjugate gradient, jit-native.

Replaces the reference's ``scipy.sparse.linalg.cg`` over a LinearOperator of
HVP closures (/root/reference/optimizer/cubic.py:157-179). Implemented as a
``lax.while_loop`` so it lives inside the jitted solver step — the reference
pays a host round-trip per HVP; here the whole Newton x CG x SpMV nest is
one XLA program.

Termination matches scipy's legacy semantics: ||r|| <= max(rtol*||b||, atol)
with atol=0, plus an iteration cap.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["cg_solve"]


def cg_solve(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    rtol: float = 1e-5,
    atol: float = 0.0,
    maxiter: int | None = None,
    accum_dtype=jnp.float32,
):
    """Solve ``matvec(x) = b`` for symmetric positive-definite matvec.

    Returns (x, iterations).
    """
    adt = jnp.dtype(accum_dtype)
    cdt = b.dtype
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    if x0 is None:
        x0 = jnp.zeros_like(b)

    def dot(u, v):
        return jnp.dot(u.astype(adt), v.astype(adt))

    bnorm = jnp.sqrt(dot(b, b))
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    r0 = b - matvec(x0)
    gamma0 = dot(r0, r0)
    init = (x0, r0, r0, gamma0, jnp.asarray(0, jnp.int32))

    def cond(state):
        _, _, _, gamma, it = state
        return jnp.logical_and(gamma > tol2, it < maxiter)

    def body(state):
        x, r, p, gamma, it = state
        Ap = matvec(p)
        alpha = (gamma / dot(p, Ap)).astype(cdt)
        x = x + alpha * p
        r = r - alpha * Ap
        gamma_new = dot(r, r)
        beta = (gamma_new / gamma).astype(cdt)
        p = r + beta * p
        return (x, r, p, gamma_new, it + 1)

    x, _, _, _, it = jax.lax.while_loop(cond, body, init)
    return x, it
