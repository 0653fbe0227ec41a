"""Krylov CRN in Gram space — the MXU-native flagship solver.

Same algorithm as solvers/krylov_crn.py (reference cubic.py:238-319), but
every iteration runs on dense n x n K-matvecs instead of sparse gathers
(see ops/gram.py for why: measured v5e gather ~0.14 G/s vs ~700 GB/s dense
streaming). The iterate never materializes: the state carries
(gamma, zeta, margins) with x = gamma*x0 + A^T zeta.

Per iteration: (m + 2) K-matvecs + O(m n) vector work + the O(m) secular
line search. Checkpoints store (gamma, zeta, margins) — loss re-evaluation
is O(n) per checkpoint with no SpMV at all; materializing an explicit x
costs one transpose SpMV, paid only on demand.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from krylov_crn_tpu.ops.gram import (
    GramData,
    Rep,
    build_gram,
    gram_lanczos,
    rep_dot,
)
from krylov_crn_tpu.ops.math import (
    accum_sum_pair,
    logsig,
    ls_accept,
    pair_diff,
    reg_clamp,
    two_sum,
)
from krylov_crn_tpu.ops.subproblem import secular_newton, tridiag_eigh
from krylov_crn_tpu.solvers.base import Optimizer
from krylov_crn_tpu.solvers.krylov_crn import _accum_dtype

__all__ = ["GramKrylov", "GramKrylovState", "gram_krylov_step"]


class GramKrylovState(NamedTuple):
    gamma: jax.Array  # coefficient of x0 in x = gamma*x0 + A^T zeta
    zeta: jax.Array  # (n_pad,)
    Ax: jax.Array  # margins (n_pad,), invariant: gamma*Ax0 + K zeta
    value: jax.Array  # f(x) two-float hi part (lo below; lo = 0 under x64)
    value_lo: jax.Array
    reg_coef: jax.Array
    r0: jax.Array
    solver_it: jax.Array
    diff_norm: jax.Array
    grad_norm: jax.Array
    f_best: jax.Array  # running-min f as a two-float pair
    f_best_lo: jax.Array


class GramCheckpoint(NamedTuple):
    """Stored per trace checkpoint; x materializes as gamma*x0 + A^T zeta."""

    gamma: jax.Array
    zeta: jax.Array
    Ax: jax.Array
    x_sqnorm: jax.Array


def _gram_value(gd: GramData, Ax, x_sqnorm, l2, adt):
    """f from margins as a two-float (hi, lo) pair.

    Under x64 (CPU verification) lo = 0 and hi is the plain fp64 value; in
    fp32-on-TPU runs the pair carries ~2x fp32 precision so line-search
    accept tests and suboptimality gaps resolve below fp32 eps (the
    reference is fp64 end-to-end and needs none of this). Terms are scaled
    by 1/n *before* the reduction: each term's rounding error then enters
    at eps*|term|/n and the compensated sum keeps the total near eps^2."""
    terms = ((1.0 - gd.b) * Ax - logsig(Ax)) * (gd.mask / gd.n)
    hi, lo = accum_sum_pair(terms.astype(adt), adt)
    if l2:
        t = jnp.asarray(l2 / 2.0, adt) * x_sqnorm.astype(adt)
        hi, e = two_sum(hi, t)
        lo = lo + e
    return hi, lo


def _x_sqnorm(gd: GramData, gamma, zeta, Ax, adt):
    """|x|^2 = g^2|x0|^2 + 2g Ax0.zeta + zeta.K zeta, with
    K zeta = Ax - g Ax0 (margins invariant)."""
    z = zeta.astype(adt)
    g = gamma.astype(adt)
    return (g * g * gd.x0_sqnorm.astype(adt)
            + g * jnp.dot(gd.Ax0.astype(adt), z)
            + jnp.dot(z, Ax.astype(adt)))


def _lr_matvec(K_lr, q, cdt):
    """Low-precision K-matvec with fp32 accumulation."""
    return jax.lax.dot_general(
        K_lr, q.astype(K_lr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)


@functools.partial(
    jax.jit,
    static_argnames=("m", "l2", "beta", "solver_eps", "solver_it_max",
                     "ls_max", "reorth_passes", "accum_dtype", "rederive"),
)
def gram_krylov_step(
    gd: GramData,
    state: GramKrylovState,
    m: int = 10,
    l2: float = 0.0,
    beta: float = 0.5,
    solver_eps: float = 1e-8,
    solver_it_max: int = 100,
    ls_max: int = 20,
    reorth_passes: int = 1,
    accum_dtype=jnp.float32,
    rederive: bool = True,
) -> GramKrylovState:
    """One Krylov-CRN iteration, TPU-shaped:

    * Lanczos matvecs optionally use the bf16 copy of K (half the HBM
      traffic); the committed margins are re-derived through the fp32 K so
      loss values never degrade;
    * the backtracking line search is *batched*: all ls_max+1 candidate
      regularizations are solved at once (vmapped secular Newton, one
      (L,m)x(m,n) matmul for all candidate margins) and the first
      acceptable candidate is selected — no sequential while_loop, exact
      same accept decision as the reference's loop (cubic.py:294-303).
    """
    cdt = state.zeta.dtype
    adt = jnp.dtype(accum_dtype)
    n = gd.n
    L = ls_max + 1

    gamma, zeta, Ax, value = state.gamma, state.zeta, state.Ax, state.value

    # gradient rep: g = l2*gamma * x0 + A^T (residual/n + l2*zeta)
    sig = jax.nn.sigmoid(Ax)
    residual = (sig - gd.b) * gd.mask
    w_g = residual / n + (l2 * zeta if l2 else 0.0)
    beta_g = jnp.asarray(l2, cdt) * gamma
    u_g = beta_g * gd.Ax0 + gd.K @ w_g  # fp32 K: gradient image is exact
    g = Rep(beta_g, w_g, u_g)

    D = sig * (1.0 - sig) * gd.mask / n
    K_lz = gd.K_lanczos

    def hop(v: Rep) -> Rep:
        q = D * v.u
        w_H = q + (l2 * v.w if l2 else 0.0)
        if K_lz.dtype == gd.K.dtype:
            Kq = K_lz @ q
        else:
            Kq = _lr_matvec(K_lz, q, cdt)
        u_H = Kq + (l2 * v.u if l2 else 0.0)
        return Rep(jnp.asarray(l2, cdt) * v.beta, w_H, u_H)

    lz = gram_lanczos(gd, hop, g, m, reorth_passes=reorth_passes,
                      accum_dtype=adt)
    if K_lz.dtype != gd.K.dtype:
        # bf16 K constructs the *subspace* (half the HBM traffic per
        # Lanczos matvec — directions tolerate low precision), but the
        # basis IMAGES feed the line-search trial margins and the
        # committed state, where bf16's ~2e-3 relative error produces
        # accepted steps that *increase* the true f by up to ~1e-4
        # (fp64-verified). Refresh all m images through the fp32 K in
        # one symmetric GEMM: u_j = beta_j*Ax0 + K w_j, so
        # Vu = Vb x Ax0 + Vw @ K (K = K^T) — K streams once, costing
        # about one matvec's bandwidth for all m columns.
        Vu32 = lz.Vb[:, None] * gd.Ax0[None, :] + lz.Vw @ gd.K
        lz = lz._replace(Vu=Vu32)

    theta, Q = tridiag_eigh(lz.alphas.astype(adt), lz.betas.astype(adt))
    g_norm = jnp.sqrt(jnp.maximum(rep_dot(gd, g, g, adt), 0.0))
    c = g_norm * Q[0, :]

    # ---- batched line search over all candidate regularizations ----
    ks = jnp.arange(L, dtype=adt)
    regs = state.reg_coef.astype(adt) * beta * (1.0 / beta) ** ks
    lams, its = jax.vmap(
        lambda M: secular_newton(theta, c, M, state.r0.astype(adt),
                                 xtol=solver_eps, it_max=solver_it_max)
    )(regs)
    U = -c[None, :] / (theta[None, :] + lams[:, None])  # (L, m)
    S = U @ Q.T  # (L, m) steps in Lanczos coordinates
    norm_s = jnp.sqrt(jnp.sum(U * U, axis=1))
    model_decs = (lams / 2.0 * norm_s**2 - regs / 3.0 * norm_s**3
                  - g_norm * S[:, 0] / 2.0)
    S_c = S.astype(cdt)
    gammas = gamma + S_c @ lz.Vb  # (L,)
    zetas = zeta[None, :] + S_c @ lz.Vw  # (L, n_pad)
    Axs = Ax[None, :] + S_c @ lz.Vu  # (L, n_pad)
    xsqs = jax.vmap(lambda gm, zt, ax: _x_sqnorm(gd, gm, zt, ax, adt))(
        gammas, zetas, Axs)
    vhis, vlos = jax.vmap(lambda ax, xq: _gram_value(gd, ax, xq, l2, adt))(
        Axs, xsqs)

    # accept test on the two-float gap: NaN-safe (NaN -> not ok)
    ok = ls_accept(vhis, vlos, value, state.value_lo, model_decs)
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), L - 1)

    gamma_new = gammas[idx]
    zeta_new = zetas[idx]
    value_new, value_new_lo = vhis[idx], vlos[idx]
    s_c = S_c[idx]

    if rederive and (K_lz.dtype != gd.K.dtype or cdt == jnp.float32):
        # Re-derive the committed margins through the full-precision K and
        # refresh the value: on the bf16-Lanczos path the search margins
        # flowed through bf16 Vu, so the committed state must not keep
        # them. The cost of re-derivation is a *fresh* ~5.5e-7-relative
        # matvec rounding in the committed value every iteration — the
        # line search then compares accurate trial differences against a
        # wobbling base, which floors the reachable gap at ~1e-5
        # (measured, fp64-verified). Once the run enters the fp32 tail
        # (K_lr dropped), run_fused therefore switches to rederive=False:
        # incremental margins keep trial/committed errors correlated
        # (differences accurate to ~1e-10) and the accumulated drift is
        # cancelled by the exact fp64 host correction at chunk
        # boundaries. The fp64 verification path also keeps the
        # incremental form.
        Ax_new = gamma_new * gd.Ax0 + gd.K @ zeta_new
        xsq_new = _x_sqnorm(gd, gamma_new, zeta_new, Ax_new, adt)
        value_new, value_new_lo = _gram_value(gd, Ax_new, xsq_new, l2, adt)
    else:
        Ax_new = Axs[idx]

    # ||x_new - x|| = ||V s|| in d-space, closed via the rep of the delta
    delta = Rep(jnp.dot(s_c, lz.Vb), s_c @ lz.Vw, s_c @ lz.Vu)
    diff_norm = jnp.sqrt(jnp.maximum(rep_dot(gd, delta, delta, adt), 0.0))

    better = pair_diff(value_new, value_new_lo,
                       state.f_best, state.f_best_lo) < 0
    return GramKrylovState(
        gamma=gamma_new, zeta=zeta_new, Ax=Ax_new,
        value=value_new, value_lo=value_new_lo,
        reg_coef=reg_clamp(regs[idx], cdt).astype(cdt),
        r0=lams[idx].astype(cdt),
        solver_it=state.solver_it + its[idx],
        diff_norm=diff_norm.astype(cdt),
        grad_norm=g_norm.astype(cdt),
        f_best=jnp.where(better, value_new, state.f_best),
        f_best_lo=jnp.where(better, value_new_lo, state.f_best_lo),
    )


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "m", "l2", "beta", "solver_eps",
                     "solver_it_max", "ls_max", "reorth_passes",
                     "accum_dtype", "rederive"),
)
def gram_krylov_multistep(gd: GramData, state: GramKrylovState,
                          chunk: int = 16, **kw):
    """`chunk` iterations in one device program (no host round-trips);
    returns the final state plus per-iteration (value, grad_norm,
    diff_norm, solver_it) stacks for full-resolution tracing."""

    def body(st, _):
        st2 = gram_krylov_step(gd, st, **kw)
        return st2, ((st2.value, st2.value_lo), st2.grad_norm,
                     st2.diff_norm, st2.solver_it)

    return jax.lax.scan(body, state, None, length=chunk)


class RepMaterializer:
    """Picklable rep -> x converter: x = gamma * x0 + A^T zeta.

    Travels inside pickled traces (Trace.save nulls the loss handle and
    Trace.from_pickle re-attaches it), so distance plots and loss
    re-evaluation work on reloaded Gram traces whose checkpoints are
    compact (gamma, zeta, Ax) reps rather than explicit d-vectors."""

    def __init__(self, x0, loss=None):
        self.x0 = np.asarray(x0, np.float64)
        self.loss = loss

    def __call__(self, ck):
        from krylov_crn_tpu.ops.spmv import rmatvec

        if self.loss is None:
            raise ValueError(
                "RepMaterializer has no loss attached; load the trace via "
                "Trace.from_pickle(path, loss=...) to materialize iterates")
        data = self.loss.data
        z = jnp.asarray(ck.zeta)[: data.n]
        at = rmatvec(data, z.astype(self.loss.b.dtype))
        return jnp.asarray(ck.gamma, at.dtype) * jnp.asarray(
            self.x0, at.dtype) + at


class GramKrylov(Optimizer):
    """Krylov CRN over the Gram-space representation.

    Drop-in for CubicKrylov on problems with n small enough for a dense
    n x n K (<~45k rows at fp32 / 8 GB). Requires the oracle to retain its
    host scipy matrix (LogisticRegression does) for the one-time K build.
    """

    def __init__(self, reg_coef=None, subspace_dim=100, solver_eps=1e-8,
                 beta=0.5, solver_it_max=100, ls_max=20, reorth_passes=1,
                 cache_dir=None, mesh=None, fp32_tail_rtol=1e-3,
                 gram_data=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # a pre-built GramData skips the one-time K build (must have been
        # built with the same A and the same x0 — checked in init_state)
        self._gd_preset = gram_data
        self.subspace_dim = int(subspace_dim)
        self.solver_eps = float(solver_eps)
        self.solver_it_max = int(solver_it_max)
        self.beta = float(beta)
        self.ls_max = int(ls_max)
        self.reorth_passes = int(reorth_passes)
        self.cache_dir = cache_dir
        self.mesh = mesh
        # bf16-Lanczos runs switch to the full-precision K once the
        # gradient norm has dropped by this factor: bf16 subspace noise
        # stalls the final gap at ~1e-7 (measured), fp32 reaches ~1e-9
        self.fp32_tail_rtol = float(fp32_tail_rtol)
        self._gn_first = None
        self.reg_coef = (self.loss.hessian_lipschitz if reg_coef is None
                         else float(reg_coef))
        self.gd: GramData | None = None
        self._x0_host = None

    def _maybe_enter_fp32_tail(self, grad_norm):
        """Drop the low-precision Lanczos K once the tail begins."""
        import dataclasses as _dc

        if self.gd is None or self.gd.K_lr is None:
            return
        if not np.isfinite(grad_norm):
            return
        if self._gn_first is None:
            self._gn_first = grad_norm
            return
        if grad_norm < self.fp32_tail_rtol * self._gn_first:
            self.gd = _dc.replace(self.gd, K_lr=None)

    def init_state(self, x0, seed):
        loss = self.loss
        A = getattr(loss, "A_host", None)
        if A is None:
            raise ValueError(
                "GramKrylov needs the oracle's host scipy matrix "
                "(construct LogisticRegression from a scipy matrix)")
        x0h = np.asarray(x0, np.float64)
        self._x0_host = x0h
        self._gn_first = None
        dtype = np.dtype(loss.b.dtype)
        if self._gd_preset is not None:
            gd = self._gd_preset
            if not np.isclose(float(gd.x0_sqnorm), float(x0h @ x0h),
                              rtol=1e-5):
                raise ValueError(
                    "gram_data was built for a different x0 "
                    f"(|x0|^2={float(gd.x0_sqnorm):.6g} vs "
                    f"{float(x0h @ x0h):.6g})")
            self.gd = gd
        else:
            self.gd = build_gram(A, np.asarray(loss.b)[: A.shape[0]], x0h,
                                 dtype=dtype, cache_dir=self.cache_dir,
                                 mesh=self.mesh)
        cdt = jnp.dtype(dtype)
        npad = self.gd.n_padded
        adt = _accum_dtype(cdt)
        zeta = jnp.zeros(npad, cdt)
        gamma = jnp.asarray(1.0, cdt)
        Ax = self.gd.Ax0
        xsq = _x_sqnorm(self.gd, gamma, zeta, Ax, adt)
        value, value_lo = _gram_value(self.gd, Ax, xsq, loss.l2, adt)
        self.loss.reset()
        self.trace.solver_its = [0]
        return GramKrylovState(
            gamma=gamma, zeta=zeta, Ax=Ax, value=value, value_lo=value_lo,
            reg_coef=jnp.asarray(self.reg_coef, cdt),
            r0=jnp.asarray(0.1, cdt),
            solver_it=jnp.asarray(0, jnp.int32),
            diff_norm=jnp.asarray(jnp.inf, cdt),
            grad_norm=jnp.asarray(jnp.inf, cdt),
            f_best=value, f_best_lo=value_lo,
        )

    def step(self):
        self.state = gram_krylov_step(
            self.gd, self.state,
            m=self.subspace_dim, l2=self.loss.l2, beta=self.beta,
            solver_eps=self.solver_eps, solver_it_max=self.solver_it_max,
            ls_max=self.ls_max, reorth_passes=self.reorth_passes,
            accum_dtype=_accum_dtype(self.state.zeta.dtype),
        )
        self._maybe_enter_fp32_tail(float(self.state.grad_norm))

    # ---- trace integration (checkpoints are reps, not iterates) ----
    def update_trace(self):
        st = self.state
        adt = _accum_dtype(st.zeta.dtype)
        ck = GramCheckpoint(
            gamma=st.gamma, zeta=st.zeta, Ax=st.Ax,
            x_sqnorm=_x_sqnorm(self.gd, st.gamma, st.zeta, st.Ax, adt),
        )
        self.trace.xs.append(ck)
        self.trace.ts.append(self.t)
        self.trace.its.append(self.it)
        self.trace.solver_its.append(int(st.solver_it))

    def init_run(self, x0, seed):
        super().init_run(x0, seed)
        # replace the base class's raw-x0 first checkpoint with a rep
        st = self.state
        adt = _accum_dtype(st.zeta.dtype)
        self.trace.xs = [GramCheckpoint(
            gamma=st.gamma, zeta=st.zeta, Ax=st.Ax,
            x_sqnorm=_x_sqnorm(self.gd, st.gamma, st.zeta, st.Ax, adt),
        )]
        # checkpoints are reps; plotting/analysis that needs explicit
        # iterates converts through this (one transpose SpMV each); the
        # converter is picklable and survives Trace.save/from_pickle
        self.trace.materializer = RepMaterializer(self._x0_host, self.loss)

    def _exact_correct(self):
        """Exact fp64 margins/value on host, reinjected into device state.

        The incremental fp32 margin updates drift by one rounding per
        iteration; this recomputes the committed margins exactly through
        the *sparse* A on the host (two scipy SpMVs per chunk boundary —
        milliseconds; the rep x = gamma*x0 + A^T zeta makes the exact
        margins A x = gamma*Ax0 + A(A^T zeta) available without K) and
        reinjects them, so drift never spans more than one chunk. The
        returned value is the exact fp64 f at the current iterate — the
        trace records it, making boundary gap readings ground truth
        rather than fp32 readouts. The running-best f (state pair + the
        oracle's f_opt protocol) is likewise pinned to exact boundary
        values only: within-chunk device values carry ~1e-6 noise and
        must not define the empirical f*."""
        st = self.state
        A = self.loss.A_host
        n = A.shape[0]
        gamma = float(st.gamma)
        zeta = np.asarray(st.zeta, np.float64)[:n]
        t = A.T.dot(zeta)  # = A^T zeta, the rep's d-vector (exact fp64)
        margins = gamma * self._Ax0_64 + A.dot(t)
        ls = np.where(margins < 0, margins - np.log1p(np.exp(margins)),
                      -np.log1p(np.exp(-margins)))
        value64 = float(np.mean((1.0 - self._b01_64) * margins - ls))
        if self.loss.l2:
            x = gamma * np.asarray(self._x0_host, np.float64) + t
            value64 += 0.5 * self.loss.l2 * float(x @ x)
        cdt = np.dtype(st.Ax.dtype)
        m_dev = np.zeros(st.Ax.shape[0], cdt)
        m_dev[:n] = margins.astype(cdt)
        vhi = cdt.type(value64)
        vlo = cdt.type(value64 - float(vhi))
        self._f_best_exact = min(self._f_best_exact, value64)
        bhi = cdt.type(self._f_best_exact)
        blo = cdt.type(self._f_best_exact - float(bhi))
        self.state = st._replace(
            Ax=jnp.asarray(m_dev), value=jnp.asarray(vhi),
            value_lo=jnp.asarray(vlo), f_best=jnp.asarray(bhi),
            f_best_lo=jnp.asarray(blo))
        return value64

    def run_fused(self, x0, it_max, t_max=np.inf, chunk=16, seed=42,
                  exact_correction=True):
        """Device-fused run: `chunk` iterations per dispatch (lax.scan),
        host sync only at chunk boundaries. Produces a *full-resolution*
        loss-vs-iteration trace (the reference can only subsample,
        optimizer.py:136-145); wall-times are interpolated within chunks.

        ``exact_correction`` (fp32 runs with a host scipy matrix): at
        every chunk boundary the margins and f are recomputed exactly in
        fp64 on the host and reinjected (see _exact_correct). Boundary
        entries of the loss trace are then exact; the full-resolution
        entries in between are device fp32 readings (~1e-6 noise) —
        consumers chasing 1e-8 gaps should use metrics["exact_its"] /
        metrics["exact_fs"]."""
        import time as _time

        self.t_max = t_max
        self.it_max = it_max
        if not self.initialized:
            self.init_run(jnp.asarray(x0), seed)
            self.initialized = True
        cdt = self.state.zeta.dtype
        exact = (exact_correction and cdt == jnp.float32
                 and getattr(self.loss, "A_host", None) is not None)
        if exact:
            A = self.loss.A_host
            n = A.shape[0]
            self._Ax0_64 = A.dot(np.asarray(self._x0_host, np.float64))
            self._b01_64 = np.asarray(self.loss.b, np.float64)[:n]
            self._f_best_exact = float(self.state.value) \
                + float(self.state.value_lo)
        kw = dict(
            m=self.subspace_dim, l2=self.loss.l2, beta=self.beta,
            solver_eps=self.solver_eps, solver_it_max=self.solver_it_max,
            ls_max=self.ls_max, reorth_passes=self.reorth_passes,
            accum_dtype=_accum_dtype(cdt),
        )
        self.trace.loss_vals = [float(self.state.value)
                                + float(self.state.value_lo)]
        metrics = self.trace.metrics
        metrics.setdefault("grad_norm", [])
        metrics.setdefault("diff_norm", [])
        if exact:
            metrics.setdefault("exact_its", [])
            metrics.setdefault("exact_fs", [])
        t_start = _time.perf_counter()
        t_prev = 0.0
        while self.it < it_max:
            k = int(min(chunk, it_max - self.it))
            # with exact boundary correction, incremental margins are the
            # accurate choice at every phase: the fp32-refreshed Vu keeps
            # trial/committed errors correlated (differences exact to
            # ~1e-10) and the correction kills inter-chunk drift. Without
            # correction (no A_host / non-fp32), keep re-derivation.
            rederive = not exact
            self.state, (vpairs, gns, dns, sits) = gram_krylov_multistep(
                self.gd, self.state, chunk=k, rederive=rederive, **kw)
            now = _time.perf_counter() - t_start
            vals = (np.asarray(vpairs[0], np.float64)
                    + np.asarray(vpairs[1], np.float64))
            dns = np.asarray(dns, np.float64)
            # device-side metric buffers, host-synced once per chunk
            gns = np.asarray(gns, np.float64)
            metrics["grad_norm"].extend(gns[:k])
            metrics["diff_norm"].extend(dns[:k])
            self._maybe_enter_fp32_tail(float(gns[k - 1]))
            for j in range(k):
                self.it += 1
                self.trace.its.append(self.it)
                self.trace.ts.append(t_prev + (now - t_prev) * (j + 1) / k)
                self.trace.loss_vals.append(float(vals[j]))
                self.trace.solver_its.append(int(sits[j]))
            if exact:
                value64 = self._exact_correct()
                self.trace.loss_vals[-1] = value64
                metrics["exact_its"].append(self.it)
                metrics["exact_fs"].append(value64)
            t_prev = now
            self.t = now
            # checkpoint the rep at chunk boundaries (for materialization)
            self.update_trace_checkpoint_only()
            if self.tolerance > 0 and dns[-1] < self.tolerance:
                break
            if now >= t_max:
                break
        self.trace.loss_vals = np.asarray(self.trace.loss_vals)
        if exact:
            f_best = self._f_best_exact
        else:
            f_best = float(self.state.f_best) + float(self.state.f_best_lo)
        if f_best < self.loss.f_opt:
            self.loss.f_opt = f_best
        self.initialized = False
        self.finished_seeds.append(seed)
        return self.trace

    def update_trace_checkpoint_only(self):
        st = self.state
        adt = _accum_dtype(st.zeta.dtype)
        self.trace.xs.append(GramCheckpoint(
            gamma=st.gamma, zeta=st.zeta, Ax=st.Ax,
            x_sqnorm=_x_sqnorm(self.gd, st.gamma, st.zeta, st.Ax, adt),
        ))

    def materialize(self, ck: GramCheckpoint):
        """x = gamma * x0 + A^T zeta (one transpose SpMV, on demand)."""
        return RepMaterializer(self._x0_host, self.loss)(ck)

    def compute_loss_of_iterates(self):
        """O(n) per checkpoint from stored margins — no SpMV re-eval pass
        (the reference pays one full SpMV per stored iterate,
        opt_trace.py:39-43)."""
        if len(self.trace.loss_vals):
            return
        adt = jnp.float64 if jax.config.read("jax_enable_x64") else \
            jnp.float32
        vals = []
        for ck in self.trace.xs:
            hi, lo = _gram_value(self.gd, ck.Ax, ck.x_sqnorm,
                                 self.loss.l2, adt)
            v = float(hi) + float(lo)
            if v < self.loss.f_opt:
                self.loss.f_opt = v
            vals.append(v)
        self.trace.loss_vals = np.asarray(vals)
