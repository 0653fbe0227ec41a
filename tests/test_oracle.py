"""Logistic oracle vs independent NumPy ground truth (fp64)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from krylov_crn_tpu.data.libsvm import canonicalize_labels
from krylov_crn_tpu.models.logistic import LogisticRegression


def _np_ref(Ad, b01, l2=0.0):
    """Straightforward fp64 logistic oracle used as ground truth."""
    n = Ad.shape[0]

    def logsig(t):
        return np.where(t < 0, t - np.log1p(np.exp(t)),
                        -np.log1p(np.exp(-t)))

    def value(x):
        Ax = Ad @ x
        return (np.mean((1 - b01) * Ax - logsig(Ax))
                + l2 / 2 * np.dot(x, x))

    def grad(x):
        sig = 1 / (1 + np.exp(-(Ad @ x)))
        return Ad.T @ (sig - b01) / n + l2 * x

    def hess(x):
        sig = 1 / (1 + np.exp(-(Ad @ x)))
        w = sig * (1 - sig)
        return (Ad * w[:, None]).T @ Ad / n + l2 * np.eye(Ad.shape[1])

    return value, grad, hess


@pytest.fixture(scope="module")
def oracle_pair(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b, l2=0.01)
    value, grad, hess = _np_ref(A.toarray(), (b + 1) / 2, l2=0.01)
    return loss, value, grad, hess, x0


def test_value(oracle_pair):
    loss, value, _, _, x0 = oracle_pair
    assert abs(loss.value(x0) - value(x0)) < 1e-12


def test_gradient(oracle_pair):
    loss, _, grad, _, x0 = oracle_pair
    np.testing.assert_allclose(np.asarray(loss.gradient(x0)), grad(x0),
                               rtol=1e-10, atol=1e-14)


def test_hessian(oracle_pair):
    loss, _, _, hess, x0 = oracle_pair
    np.testing.assert_allclose(np.asarray(loss.hessian(x0)), hess(x0),
                               rtol=1e-10, atol=1e-14)


def test_hvp_matches_hessian(oracle_pair):
    loss, _, _, hess, x0 = oracle_pair
    v = np.random.default_rng(0).standard_normal(len(x0))
    np.testing.assert_allclose(np.asarray(loss.hess_vec_prod(x0, v)),
                               hess(x0) @ v, rtol=1e-10, atol=1e-14)


def test_hvp_grad_dif_fallback(oracle_pair):
    """Finite-difference HVP option (reference loss.py:289-293)."""
    loss, _, _, hess, x0 = oracle_pair
    v = np.random.default_rng(1).standard_normal(len(x0))
    eps = 1e-6
    fd = np.asarray(loss.hess_vec_prod(x0, v, grad_dif=True, eps=eps))
    np.testing.assert_allclose(fd, hess(x0) @ v, rtol=1e-4, atol=1e-6)
    with pytest.raises(ValueError):
        loss.hess_vec_prod(x0, v, grad_dif=True)


def test_partials(oracle_pair):
    loss, _, grad, hess, x0 = oracle_pair
    I = np.array([1, 5, 9, 33, 50])
    np.testing.assert_allclose(np.asarray(loss.partial_gradient(x0, I)),
                               grad(x0)[I], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(loss.partial_hessian(x0, I)),
                               hess(x0)[np.ix_(I, I)], rtol=1e-10,
                               atol=1e-14)


def test_f_opt_tracking(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    v0 = loss.value(x0)
    assert loss.f_opt == v0
    v1 = loss.value(x0 * 0.9)
    assert loss.f_opt == min(v0, v1)


def test_mat_vec_cache(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b, store_mat_vec_prod=True)
    x = jnp.asarray(x0)
    Ax1 = loss.mat_vec_product(x)
    Ax2 = loss.mat_vec_product(x)
    assert Ax1 is Ax2  # cache hit by identity
    loss.reset()
    assert loss.x_last is None


def test_update_mat_vec_product(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    Ax = np.asarray(loss.mat_vec_product(jnp.asarray(x0)))
    I = np.array([2, 4, 8])
    delta = np.array([0.1, -0.2, 0.3])
    loss.update_mat_vec_product(jnp.asarray(Ax), jnp.asarray(delta), I)
    want = Ax + A.toarray()[:, I] @ delta
    np.testing.assert_allclose(np.asarray(loss._mat_vec_prod), want,
                               rtol=1e-10, atol=1e-14)
    # reuse flag: next mat_vec_product returns the incremental cache
    got = loss.mat_vec_product(jnp.asarray(x0 * 123.0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_smoothness_constants(small_problem):
    A, b, _ = small_problem
    loss = LogisticRegression(A, b)
    n = A.shape[0]
    smax = sp.linalg.svds(A, k=1, return_singular_vectors=False)[0]
    assert abs(loss.smoothness - 0.25 * smax**2 / n) < 1e-6 * loss.smoothness
    row_sq = np.asarray(A.power(2).sum(axis=1)).ravel()
    assert abs(loss.max_smoothness - 0.25 * row_sq.max()) < 1e-10
    assert abs(loss.average_smoothness - 0.25 * row_sq.mean()) < 1e-10
    want_hl = (loss.smoothness * 4) * np.sqrt(row_sq.max()) / (6 * np.sqrt(3))
    assert abs(loss.hessian_lipschitz - want_hl) < 1e-8 * want_hl


@pytest.mark.parametrize(
    "labels,want",
    [
        (np.array([1, 2, 2, 1]), np.array([0.0, 1, 1, 0])),
        (np.array([-1, 1, 1, -1]), np.array([0.0, 1, 1, 0])),
        (np.array([0, 1, 1, 0]), np.array([0.0, 1, 1, 0])),
        (np.array([5, 9, 9, 5]), np.array([1.0, 0, 0, 1])),
    ],
)
def test_label_canonicalization(labels, want):
    np.testing.assert_array_equal(canonicalize_labels(labels), want)


def test_label_canonicalization_errors():
    with pytest.raises(ValueError):
        canonicalize_labels(np.array([0, 1, 2]))
    with pytest.warns(UserWarning):
        out = canonicalize_labels(np.array([1, 1, 1]))
    np.testing.assert_array_equal(out, [1, 1, 1])
