"""Benchmark: end-to-end Krylov-CRN iteration throughput, news20-shaped.

Measures the flagship Gram-space Krylov-CRN solver (m=10) on a synthetic
news20-shaped logistic problem (19996 x 1355191, ~5.4M nnz — the largest
dataset in the reference's Figure-2 grid) on the attached accelerator,
against the *actual reference implementation* running in-process on this
host's CPU (numba stubbed; /root/reference), same problem, same
hyperparameters.

Timing protocol per PERF.md: the solver state is fetched (scalar) after
the timed block, iterations are chained through the state (data-dependent),
and compilation is excluded by a warm-up chunk of identical shape. The
reference is timed over fewer iterations (its per-iteration cost is ~3 s
and stable); both sides exclude problem setup.

Prints ONE JSON line:
  {"metric": "krylov_crn_iter_per_s", "value": ..., "unit": "iter/s",
   "vs_baseline": <ours / reference-on-host-CPU>}
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np

N_TIMED = 32
N_TIMED_REF = 12
M = 10


def _problem():
    from krylov_crn_tpu.data.synthetic import synthetic_logreg

    A, b = synthetic_logreg("news20-like", seed=0)
    x0 = np.ones(A.shape[1]) * 0.5
    return A, b, x0


def bench_ours(A, b, x0):
    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.solvers.krylov_crn import _accum_dtype
    from krylov_crn_tpu.solvers.krylov_gram import (
        GramKrylov,
        gram_krylov_multistep,
    )

    dtype = np.float32
    loss = LogisticRegression(A, b, dtype=dtype, want_dense=False)
    alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=M, tolerance=0,
                     tqdm=False, label="gram")
    t0 = time.perf_counter()
    alg.init_run(jnp.asarray(x0, dtype), 42)
    alg.initialized = True
    build_s = time.perf_counter() - t0

    kw = dict(m=M, l2=0.0, beta=0.5, solver_eps=1e-8, solver_it_max=100,
              ls_max=20, reorth_passes=1,
              accum_dtype=_accum_dtype(jnp.dtype(dtype)))
    # warm-up with the same chunk shape (compile), then time
    st, _ = gram_krylov_multistep(alg.gd, alg.state, chunk=N_TIMED, **kw)
    float(st.value)
    t0 = time.perf_counter()
    st, _ = gram_krylov_multistep(alg.gd, st, chunk=N_TIMED, **kw)
    float(st.value)  # forces completion through the transport
    dt = time.perf_counter() - t0
    return N_TIMED / dt, build_s, float(st.value)


def bench_reference(A, b, x0):
    """The reference implementation, in-process, on the host CPU."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda f=None, **kw: (f if callable(f)
                                           else (lambda g: g))
        sys.modules["numba"] = numba
    sys.path.insert(0, "/root/reference")
    try:
        from optimizer.cubic import Cubic_Krylov_LS
        from optimizer.loss import LogisticRegression as RefLogReg
    except ImportError:
        sys.path.remove("/root/reference")
        return None
    # warm-up instance (numpy/scipy internal caches)
    warm = Cubic_Krylov_LS(
        loss=RefLogReg(A, b, l1=0, l2=0, store_mat_vec_prod=True),
        reg_coef=1e-3, subspace_dim=M, tolerance=0, label="warm",
        tqdm=False)
    warm.run(x0=x0, it_max=2, t_max=1e9)
    # timed fresh instance (a finished seed makes .run() a no-op,
    # optimizer.py:70-71, so the timed run must be a new optimizer)
    alg = Cubic_Krylov_LS(
        loss=RefLogReg(A, b, l1=0, l2=0, store_mat_vec_prod=True),
        reg_coef=1e-3, subspace_dim=M, tolerance=0, label="ref",
        tqdm=False)
    t0 = time.perf_counter()
    alg.run(x0=x0, it_max=N_TIMED_REF, t_max=1e9)
    dt = time.perf_counter() - t0
    sys.path.remove("/root/reference")
    assert alg.it >= N_TIMED_REF
    return N_TIMED_REF / dt


def main():
    A, b, x0 = _problem()
    ours_ips, build_s, val = bench_ours(A, b, x0)
    ref_ips = bench_reference(A, b, x0)
    vs = (ours_ips / ref_ips) if ref_ips else None
    print(json.dumps({
        "metric": "krylov_crn_iter_per_s",
        "value": round(ours_ips, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
