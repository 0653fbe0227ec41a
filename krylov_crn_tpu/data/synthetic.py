"""Synthetic sparse dataset generators.

With no network egress, benchmarks and tests use synthetic matrices shaped
like the reference's LIBSVM grid (w8a ~ 49.7K x 300, rcv1 ~ 20.2K x 47.2K,
news20 ~ 20K x 1.355M; /root/reference/cubic_newton.py:43-52) plus the
power-law stress configs from BASELINE.json.
"""

from __future__ import annotations

import numpy as np

__all__ = ["random_sparse", "powerlaw_sparse", "synthetic_logreg", "DATASET_SHAPES"]

# (n, d, nnz) mimicking the reference's LIBSVM datasets, plus the
# BASELINE.json power-law stress configs (BASELINE.md:31). The 10M/1B
# config needs ~12 GB of device COO (+ transpose) — it is a multi-chip
# (row-sharded) target; "stress-1m" fits one chip and is the measured
# large-n point (see tools/measure_large_n.py / PERF.md).
DATASET_SHAPES = {
    "w8a-like": (49749, 300, 579586),
    "rcv1-like": (20242, 47236, 1498952),
    "news20-like": (19996, 1355191, 9097916),
    "stress-1m": (1_000_000, 1_000_000, 100_000_000),
    "stress-10m": (10_000_000, 10_000_000, 1_000_000_000),
}


def random_sparse(n, d, nnz, seed=0, dtype=np.float32):
    """Uniform random COO (duplicates merged; returned as scipy CSR)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, d, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, d))
    A.sum_duplicates()
    return A.tocsr()


def powerlaw_sparse(n, d, nnz, alpha=1.1, seed=0, dtype=np.float32):
    """COO with Zipf-like column popularity — models text datasets like
    rcv1/news20 where a few features are dense and most are rare (the load-
    imbalance stress case from SURVEY.md hard part (d))."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    # Zipf column weights
    w = 1.0 / np.arange(1, d + 1, dtype=np.float64) ** alpha
    w /= w.sum()
    cols = rng.choice(d, size=nnz, p=w)
    rows = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, d))
    A.sum_duplicates()
    return A.tocsr()


def synthetic_logreg(name_or_shape, seed=0, dtype=np.float32, powerlaw=True,
                     conflict_frac=0.02):
    """(A_csr, b) binary logistic problem; labels in {-1, +1} like LIBSVM.

    ``conflict_frac``: fraction of rows copied onto another row with the
    *opposite* label. With d >> n (rcv1/news20 shapes) a planted-model
    problem is almost surely linearly separable, so the l2=0 logistic
    optimum is an infimum at f* -> 0 with ||x|| -> inf — high-budget runs
    then blow up the margins (observed: the 5x-budget f* run NaN'd).
    Conflicting duplicates bound the loss away from 0 (each pair
    contributes >= (2/n) log 2 at best) and make the optimum attained,
    matching the qualitative behavior of the real LIBSVM datasets."""
    if isinstance(name_or_shape, str):
        n, d, nnz = DATASET_SHAPES[name_or_shape]
    else:
        n, d, nnz = name_or_shape
    gen = powerlaw_sparse if powerlaw else random_sparse
    A = gen(n, d, nnz, seed=seed, dtype=dtype)
    rng = np.random.default_rng(seed + 1)
    # labels from a planted linear model so the problem is realistic
    x_star = rng.standard_normal(d).astype(np.float64) / np.sqrt(max(d, 1))
    logits = A @ x_star + 0.5 * rng.standard_normal(n)
    b = np.where(logits > 0, 1.0, -1.0)
    k = int(conflict_frac * n / 2)
    if k > 0:
        import scipy.sparse as sp

        idx = rng.choice(n, size=2 * k, replace=False)
        src, dst = idx[:k], idx[k:]
        coo = A.tocoo()
        keep = ~np.isin(coo.row, dst)
        starts = A.indptr[src]
        ends = A.indptr[src + 1]
        new_rows = np.repeat(dst, ends - starts)
        take = np.concatenate([np.arange(s, e) for s, e in
                               zip(starts, ends)]) if k else np.array([], int)
        rows = np.concatenate([coo.row[keep], new_rows])
        cols = np.concatenate([coo.col[keep], A.indices[take]])
        vals = np.concatenate([coo.data[keep], A.data[take]])
        A = sp.coo_matrix((vals, (rows, cols)), shape=(n, d)).tocsr()
        b[dst] = -b[src]
    return A, b
