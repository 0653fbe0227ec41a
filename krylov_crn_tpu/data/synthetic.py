"""Synthetic sparse dataset generators.

With no network egress, benchmarks and tests use synthetic matrices shaped
like the reference's LIBSVM grid (w8a ~ 49.7K x 300, rcv1 ~ 20.2K x 47.2K,
news20 ~ 20K x 1.355M; /root/reference/cubic_newton.py:43-52) plus the
power-law stress configs from BASELINE.json.
"""

from __future__ import annotations

import numpy as np

__all__ = ["random_sparse", "powerlaw_sparse", "synthetic_logreg", "DATASET_SHAPES"]

# (n, d, nnz) mimicking the reference's LIBSVM datasets
DATASET_SHAPES = {
    "w8a-like": (49749, 300, 579586),
    "rcv1-like": (20242, 47236, 1498952),
    "news20-like": (19996, 1355191, 9097916),
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


def synthetic_logreg(name_or_shape, seed=0, dtype=np.float32, powerlaw=True):
    """(A_csr, b) binary logistic problem; labels in {-1, +1} like LIBSVM."""
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
    return A, b
