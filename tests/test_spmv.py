"""SpMV / transpose SpMV / fused HVP vs scipy ground truth (fp64)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from krylov_crn_tpu.data.formats import build_dual, from_scipy
from krylov_crn_tpu.data.synthetic import powerlaw_sparse
from krylov_crn_tpu.ops.spmv import (
    hvp_sparse,
    rmatvec,
    row_sqnorms,
    spmv,
    spmv_coo,
)


def _rand_dual(n, d, density, seed, powerlaw=False, want_dense=False):
    if powerlaw:
        A = powerlaw_sparse(n, d, int(n * d * density), seed=seed,
                            dtype=np.float64)
    else:
        A = sp.random(n, d, density=density, random_state=seed, format="csr")
    return A, build_dual(A, dtype=np.float64, want_dense=want_dense)


def test_spmv_matches_scipy():
    A, dual = _rand_dual(200, 300, 0.05, 11)
    x = np.random.default_rng(0).standard_normal(300)
    np.testing.assert_allclose(np.asarray(spmv(dual, jnp.asarray(x))),
                               A @ x, rtol=1e-12)


def test_rmatvec_matches_scipy():
    A, dual = _rand_dual(200, 300, 0.05, 12)
    z = np.random.default_rng(1).standard_normal(200)
    np.testing.assert_allclose(np.asarray(rmatvec(dual, jnp.asarray(z))),
                               A.T @ z, rtol=1e-12)


def test_spmv_powerlaw():
    A, dual = _rand_dual(500, 2000, 0.01, 13, powerlaw=True)
    x = np.random.default_rng(2).standard_normal(2000)
    np.testing.assert_allclose(np.asarray(spmv(dual, jnp.asarray(x))),
                               A @ x, rtol=1e-10, atol=1e-12)


def test_hvp_fused():
    A, dual = _rand_dual(150, 80, 0.1, 14)
    rng = np.random.default_rng(3)
    w = rng.random(150)
    v = rng.standard_normal(80)
    got = np.asarray(hvp_sparse(dual, jnp.asarray(w), jnp.asarray(v),
                                l2=0.3))
    want = A.T @ (w * (A @ v)) / 150 + 0.3 * v
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dense_path_equals_sparse_path():
    A, dual_sparse = _rand_dual(90, 40, 0.2, 15, want_dense=False)
    _, dual_dense = _rand_dual(90, 40, 0.2, 15, want_dense=True)
    x = np.random.default_rng(4).standard_normal(40)
    z = np.random.default_rng(5).standard_normal(90)
    np.testing.assert_allclose(
        np.asarray(spmv(dual_dense, jnp.asarray(x))),
        np.asarray(spmv(dual_sparse, jnp.asarray(x))), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rmatvec(dual_dense, jnp.asarray(z))),
        np.asarray(rmatvec(dual_sparse, jnp.asarray(z))), rtol=1e-12)


def test_row_sqnorms():
    A = sp.random(60, 45, density=0.2, random_state=16, format="csr")
    m = from_scipy(A, dtype=np.float64)
    want = np.asarray(A.power(2).sum(axis=1)).ravel()
    np.testing.assert_allclose(np.asarray(row_sqnorms(m)), want, rtol=1e-12)


def test_spmv_zero_matrix():
    A = sp.csr_matrix((5, 7))
    m = from_scipy(A, dtype=np.float64)
    y = np.asarray(spmv_coo(m, jnp.ones(7)))
    np.testing.assert_array_equal(y, np.zeros(5))
