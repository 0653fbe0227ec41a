"""Benchmark: fused logistic HVP throughput on an rcv1-shaped sparse matrix.

The headline kernel metric from BASELINE.md — nnz/s of the Hessian-vector
product A^T(w*(Av))/n (two SpMV traversals per HVP) on one chip, compared
against the same computation done the reference's way (scipy.sparse CSR on
the host CPU, /root/reference/optimizer/loss.py:289-302).

Prints ONE JSON line:
    {"metric": "hvp_nnz_per_s", "value": ..., "unit": "nnz/s",
     "vs_baseline": <tpu / scipy-cpu speedup>}
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_tpu(A, iters=50):
    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.data.formats import build_dual
    from krylov_crn_tpu.models.logistic import logreg_hvp

    data = build_dual(A, dtype=np.float32, want_dense=False)
    rng = np.random.default_rng(0)
    Ax = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(A.shape[1]).astype(np.float32))

    out = logreg_hvp(data, Ax, v, l2=0.0)
    out.block_until_ready()  # compile
    # warm-up timing loop then measure
    t0 = time.perf_counter()
    for _ in range(iters):
        out = logreg_hvp(data, Ax, v, l2=0.0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt


def _bench_scipy(A, iters=10):
    """Reference-style host CSR HVP: Av, weight, A.T @ (w*Av)."""
    rng = np.random.default_rng(0)
    n, d = A.shape
    Ax = rng.standard_normal(n)
    sig = 1.0 / (1.0 + np.exp(-Ax))
    w = sig * (1 - sig)
    v = rng.standard_normal(d)
    At = A.T.tocsr()
    # warm-up
    _ = At @ (w * (A @ v)) / n
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = At @ (w * (A @ v)) / n
    return (time.perf_counter() - t0) / iters


def main():
    from krylov_crn_tpu.data.synthetic import DATASET_SHAPES, powerlaw_sparse

    n, d, nnz = DATASET_SHAPES["rcv1-like"]
    A = powerlaw_sparse(n, d, nnz, seed=0, dtype=np.float64).astype(
        np.float64
    )
    true_nnz = A.nnz
    # per fused HVP: one forward + one transpose traversal
    work = 2 * true_nnz

    dt_tpu = _bench_tpu(A)
    dt_cpu = _bench_scipy(A)

    value = work / dt_tpu
    vs_baseline = dt_cpu / dt_tpu
    print(json.dumps({
        "metric": "hvp_nnz_per_s",
        "value": round(value, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
