"""Full-space CRN (CG backend) in Gram space.

The reference's large-d CRN variant (cubic.py:152-182) is the hottest nest
in its codebase: secular Newton x CG x SpMV. Here the same nest runs with
rep-space vectors (ops/gram.py): each CG matvec is one dense K-matvec, all
inner products are closed form — no sparse op anywhere in the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from krylov_crn_tpu.ops.gram import GramData, Rep, rep_axpy, rep_dot
from krylov_crn_tpu.ops.math import ls_accept, pair_diff, reg_clamp
from krylov_crn_tpu.solvers.base import Optimizer
from krylov_crn_tpu.solvers.krylov_crn import _accum_dtype
from krylov_crn_tpu.solvers.krylov_gram import (
    GramCheckpoint,
    GramKrylov,
    GramKrylovState,
    _gram_value,
    _x_sqnorm,
)

__all__ = ["GramCRN", "gram_crn_step"]


def _rep_zero(npad, cdt):
    return Rep(jnp.zeros((), cdt), jnp.zeros(npad, cdt),
               jnp.zeros(npad, cdt))


def cg_rep(gd: GramData, matvec, b: Rep, rtol, maxiter, adt):
    """CG over rep-space vectors; mirrors ops/cg.py semantics."""
    cdt = b.w.dtype

    def dot(u, v):
        return rep_dot(gd, u, v, adt)

    bnorm2 = dot(b, b)
    tol2 = (rtol * rtol) * bnorm2
    x0 = _rep_zero(b.w.shape[0], cdt)
    r0 = b
    gamma0 = bnorm2
    init = (x0, r0, r0, gamma0, jnp.asarray(0, jnp.int32))

    def cond(st):
        _, _, _, gamma, it = st
        return jnp.logical_and(gamma > tol2, it < maxiter)

    def body(st):
        x, r, p, gamma, it = st
        Ap = matvec(p)
        alpha = (gamma / dot(p, Ap)).astype(cdt)
        x = rep_axpy(x, alpha, p)
        r = rep_axpy(r, -alpha, Ap)
        gamma_new = dot(r, r)
        beta = (gamma_new / gamma).astype(cdt)
        p = Rep(r.beta + beta * p.beta, r.w + beta * p.w,
                r.u + beta * p.u)
        return (x, r, p, gamma_new, it + 1)

    x, _, _, _, it = jax.lax.while_loop(cond, body, init)
    return x, it


@functools.partial(
    jax.jit,
    static_argnames=("l2", "beta", "solver_eps", "solver_it_max",
                     "tolerance", "ls_max", "cg_maxiter", "accum_dtype"),
)
def gram_crn_step(
    gd: GramData,
    state: GramKrylovState,
    l2: float = 0.0,
    beta: float = 0.5,
    solver_eps: float = 1e-8,
    solver_it_max: int = 100,
    tolerance: float = 0.0,
    ls_max: int = 200,
    cg_maxiter: int = 500,
    accum_dtype=jnp.float32,
) -> GramKrylovState:
    cdt = state.zeta.dtype
    adt = jnp.dtype(accum_dtype)
    n = gd.n

    gamma, zeta, Ax, value = state.gamma, state.zeta, state.Ax, state.value

    sig = jax.nn.sigmoid(Ax)
    residual = (sig - gd.b) * gd.mask
    w_g = residual / n + (l2 * zeta if l2 else 0.0)
    beta_g = jnp.asarray(l2, cdt) * gamma
    u_g = beta_g * gd.Ax0 + gd.K @ w_g
    g = Rep(beta_g, w_g, u_g)
    g_norm = jnp.sqrt(jnp.maximum(rep_dot(gd, g, g, adt), 0.0))

    D = sig * (1.0 - sig) * gd.mask / n

    def hop(v: Rep) -> Rep:
        q = D * v.u
        w_H = q + (l2 * v.w if l2 else 0.0)
        u_H = gd.K @ q + (l2 * v.u if l2 else 0.0)
        return Rep(jnp.asarray(l2, cdt) * v.beta, w_H, u_H)

    neg_g = Rep(-g.beta, -g.w, -g.u)

    def early(_):
        return state._replace(diff_norm=jnp.zeros((), cdt),
                              grad_norm=g_norm.astype(cdt))

    def work(_):
        def solve_shifted(lam):
            mv = lambda v: rep_axpy(hop(v), lam.astype(cdt), v)
            s, _ = cg_rep(gd, mv, neg_g, solver_eps, cg_maxiter, adt)
            return s

        def newton(reg):
            M = reg

            def cond(st):
                lam, step, it = st
                return jnp.logical_and(jnp.abs(step) >= solver_eps,
                                       it < solver_it_max)

            def body(st):
                lam, _, it = st
                s = solve_shifted(lam)
                s2 = rep_dot(gd, s, s, adt)
                p = lam * lam - M * M * s2
                mv = lambda v: rep_axpy(hop(v), lam.astype(cdt), v)
                hinv_s, _ = cg_rep(gd, mv, s, solver_eps, cg_maxiter, adt)
                dphi = 2.0 * lam + 2.0 * M * M * rep_dot(gd, s, hinv_s, adt)
                step = p / dphi
                lam_new = jnp.maximum(lam - step, jnp.asarray(0.0, adt))
                return (lam_new, lam_new - lam, it + 1)

            big = jnp.asarray(jnp.inf, adt)
            lam, _, it = jax.lax.while_loop(
                cond, body,
                (state.r0.astype(adt), big, jnp.asarray(0, jnp.int32)))
            return lam, it

        def trial(reg):
            lam, it = newton(reg)
            s = solve_shifted(lam)
            norm_s = jnp.sqrt(jnp.maximum(rep_dot(gd, s, s, adt), 0.0))
            model_dec = (lam / 2.0 * norm_s**2 - reg / 3.0 * norm_s**3
                         - rep_dot(gd, g, s, adt) / 2.0)
            gamma_new = gamma + s.beta
            zeta_new = zeta + s.w
            Ax_new = Ax + s.u
            xsq = _x_sqnorm(gd, gamma_new, zeta_new, Ax_new, adt)
            vhi, vlo = _gram_value(gd, Ax_new, xsq, l2, adt)
            return (lam, it, model_dec, gamma_new, zeta_new, Ax_new,
                    vhi, vlo, s)

        reg0 = state.reg_coef.astype(adt) * beta
        carry0 = (reg0,) + trial(reg0) + (jnp.asarray(0, jnp.int32),)

        def ls_cond(carry):
            model_dec, vhi, vlo, trials = (carry[3], carry[7], carry[8],
                                           carry[-1])
            bad = jnp.logical_not(
                ls_accept(vhi, vlo, value, state.value_lo, model_dec))
            return jnp.logical_and(bad, trials < ls_max)

        def ls_body(carry):
            reg = carry[0] / beta
            return (reg,) + trial(reg) + (carry[-1] + 1,)

        (reg, lam, it, _, gamma_new, zeta_new, Ax_new, value_new,
         value_new_lo, s, _) = \
            jax.lax.while_loop(ls_cond, ls_body, carry0)

        if cdt == jnp.float32:
            # cap fp32 margin drift: stateless re-derivation through K
            # (see gram_krylov_step)
            Ax_new = gamma_new * gd.Ax0 + gd.K @ zeta_new
            xsq = _x_sqnorm(gd, gamma_new, zeta_new, Ax_new, adt)
            value_new, value_new_lo = _gram_value(gd, Ax_new, xsq, l2, adt)

        diff_norm = jnp.sqrt(jnp.maximum(rep_dot(gd, s, s, adt), 0.0))
        better = pair_diff(value_new, value_new_lo,
                           state.f_best, state.f_best_lo) < 0
        return GramKrylovState(
            gamma=gamma_new, zeta=zeta_new, Ax=Ax_new, value=value_new,
            value_lo=value_new_lo,
            reg_coef=reg_clamp(reg, cdt).astype(cdt), r0=lam.astype(cdt),
            solver_it=state.solver_it + it,
            diff_norm=diff_norm.astype(cdt),
            grad_norm=g_norm.astype(cdt),
            f_best=jnp.where(better, value_new, state.f_best),
            f_best_lo=jnp.where(better, value_new_lo, state.f_best_lo),
        )

    return jax.lax.cond(g_norm < tolerance, early, work, None)


class GramCRN(GramKrylov):
    """Reference ``Cubic_LS`` with cubic_solver="CG", Gram-space."""

    def __init__(self, reg_coef=None, solver_it_max=100, solver_eps=1e-8,
                 beta=0.5, cg_maxiter=500, ls_max=200, *args, **kwargs):
        super().__init__(reg_coef=reg_coef, solver_eps=solver_eps,
                         beta=beta, solver_it_max=solver_it_max,
                         ls_max=ls_max, *args, **kwargs)
        self.cg_maxiter = int(cg_maxiter)

    def step(self):
        self.state = gram_crn_step(
            self.gd, self.state,
            l2=self.loss.l2, beta=self.beta, solver_eps=self.solver_eps,
            solver_it_max=self.solver_it_max,
            tolerance=float(self.tolerance), ls_max=self.ls_max,
            cg_maxiter=self.cg_maxiter,
            accum_dtype=_accum_dtype(self.state.zeta.dtype),
        )

    def check_convergence(self):
        if (self.tolerance > 0 and self.it > 0
                and float(self.state.grad_norm) < self.tolerance):
            return True
        return Optimizer.check_convergence(self)
