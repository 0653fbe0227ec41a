"""Sparse format construction and round-trips."""

import numpy as np
import scipy.sparse as sp

from krylov_crn_tpu.data.formats import build_dual, from_coo, from_scipy


def _to_dense(m):
    """Reconstruct dense from a SparseMatrix (host-side)."""
    out = np.zeros((m.n, m.d))
    np.add.at(out, (np.asarray(m.rows), np.asarray(m.cols)),
              np.asarray(m.vals))
    return out


def test_from_scipy_roundtrip(rng):
    A = sp.random(50, 70, density=0.1, random_state=1, format="csr")
    m = from_scipy(A, dtype=np.float64)
    assert m.shape == (50, 70)
    assert m.nnz == A.nnz
    assert m.nnz_padded % 1024 == 0
    np.testing.assert_allclose(_to_dense(m), A.toarray())


def test_rows_sorted_and_padding(rng):
    A = sp.random(33, 11, density=0.3, random_state=2, format="csr")
    m = from_scipy(A)
    r = np.asarray(m.rows)
    assert (np.diff(r) >= 0).all()
    v = np.asarray(m.vals)
    assert (v[m.nnz:] == 0).all()


def test_from_coo_unsorted():
    rows = np.array([3, 0, 2, 0])
    cols = np.array([1, 2, 0, 1])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    m = from_coo(rows, cols, vals, (4, 3), dtype=np.float64)
    dense = np.zeros((4, 3))
    dense[3, 1], dense[0, 2], dense[2, 0], dense[0, 1] = 1, 2, 3, 4
    np.testing.assert_allclose(_to_dense(m), dense)


def test_build_dual_transpose_consistent():
    A = sp.random(40, 90, density=0.15, random_state=3, format="csr")
    dual = build_dual(A, dtype=np.float64, want_dense=False)
    np.testing.assert_allclose(_to_dense(dual.a), A.toarray())
    np.testing.assert_allclose(_to_dense(dual.at), A.toarray().T)
    # at_indptr delimits each column's entries in the transpose arrays
    ip = np.asarray(dual.at_indptr)
    At = A.T.tocsr()
    np.testing.assert_array_equal(ip, At.indptr)
    counts = np.diff(ip)
    assert dual.max_col_nnz == counts.max()


def test_build_dual_dense_copy():
    A = sp.random(30, 20, density=0.2, random_state=4, format="csr")
    dual = build_dual(A, dtype=np.float64)  # small => dense kept
    assert dual.dense is not None
    np.testing.assert_allclose(np.asarray(dual.dense), A.toarray())


def test_empty_rows_and_cols():
    # rows/cols with no entries must not break transpose bookkeeping
    dense = np.zeros((6, 5))
    dense[0, 1] = 2.0
    dense[4, 4] = -1.0
    A = sp.csr_matrix(dense)
    dual = build_dual(A, dtype=np.float64, want_dense=False)
    np.testing.assert_allclose(_to_dense(dual.a), dense)
    np.testing.assert_allclose(_to_dense(dual.at), dense.T)
