"""Lanczos: orthogonality, tridiagonal residual, breakdown masking, aux."""

import jax
import jax.numpy as jnp
import numpy as np

from krylov_crn_tpu.ops.lanczos import lanczos


def _sym(d, seed, rank=None):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((d, d if rank is None else rank))
    return B @ B.T / d


def _tridiag(alphas, betas):
    T = np.diag(alphas) + np.diag(betas, -1) + np.diag(betas, 1)
    return T


def test_orthogonality_and_residual():
    d, m = 120, 15
    H = _sym(d, 0)
    g = np.random.default_rng(1).standard_normal(d)
    op = lambda v: (jnp.asarray(H) @ v, None)
    res = lanczos(op, jnp.asarray(g), m, accum_dtype=jnp.float64)
    V = np.asarray(res.V)  # (m, d) rows
    assert int(res.k) == m
    # orthonormality: V V^T = I
    np.testing.assert_allclose(V @ V.T, np.eye(m), atol=1e-10)
    # three-term recurrence: H V^T ~= V^T T + beta_last * v_next e_m^T
    T = _tridiag(np.asarray(res.alphas), np.asarray(res.betas))
    R = H @ V.T - V.T @ T
    # residual lives only in the last column (= beta_m * v_m direction)
    np.testing.assert_allclose(R[:, :-1], 0, atol=1e-8)
    # the returned beta_last is the last computed off-diagonal (the
    # reference's `beta` return value, cubic.py:111)
    assert abs(float(res.beta_last) - np.asarray(res.betas)[-1]) < 1e-12


def test_first_vector_is_normalized_gradient():
    d, m = 50, 5
    H = _sym(d, 2)
    g = np.random.default_rng(3).standard_normal(d)
    op = lambda v: (jnp.asarray(H) @ v, None)
    res = lanczos(op, jnp.asarray(g), m, accum_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res.V)[0], g / np.linalg.norm(g),
                               rtol=1e-12)


def test_breakdown_low_rank():
    """On a rank-r operator the Krylov space saturates at ~r+1 vectors."""
    d, r, m = 80, 4, 12
    H = _sym(d, 4, rank=r)
    g = np.random.default_rng(5).standard_normal(d)
    op = lambda v: (jnp.asarray(H) @ v, None)
    res = lanczos(op, jnp.asarray(g), m, accum_dtype=jnp.float64)
    k = int(res.k)
    assert k <= r + 1
    # masked tail must be exactly zero
    V = np.asarray(res.V)
    np.testing.assert_array_equal(V[k:], 0)
    alphas = np.asarray(res.alphas)
    betas = np.asarray(res.betas)
    np.testing.assert_array_equal(alphas[k:], 0)
    np.testing.assert_array_equal(betas[k - 1:], 0)
    # valid block still satisfies the recurrence
    T = _tridiag(alphas[:k], betas[:k - 1])
    np.testing.assert_allclose(V[:k] @ H @ V[:k].T, T, atol=1e-8)


def test_eigenvalue_convergence():
    """Ritz values approximate extreme eigenvalues."""
    d, m = 200, 30
    H = _sym(d, 6)
    g = np.random.default_rng(7).standard_normal(d)
    op = lambda v: (jnp.asarray(H) @ v, None)
    res = lanczos(op, jnp.asarray(g), m, accum_dtype=jnp.float64)
    T = _tridiag(np.asarray(res.alphas), np.asarray(res.betas))
    ritz = np.linalg.eigvalsh(T)
    eigs = np.linalg.eigvalsh(H)
    assert abs(ritz[-1] - eigs[-1]) < 1e-6 * abs(eigs[-1])


def test_aux_collection():
    """aux rows must be A v_j for every valid basis row."""
    d, m = 60, 8
    H = _sym(d, 8)
    A = np.random.default_rng(9).standard_normal((37, d))
    g = np.random.default_rng(10).standard_normal(d)

    def op(v):
        return jnp.asarray(H) @ v, jnp.asarray(A) @ v

    res = lanczos(op, jnp.asarray(g), m, accum_dtype=jnp.float64)
    V = np.asarray(res.V)
    AV = np.asarray(res.aux)
    assert AV.shape == (m, 37)
    np.testing.assert_allclose(AV, V @ A.T, atol=1e-10)


def test_reorth_improves_fp32_orthogonality():
    d, m = 300, 25
    H = _sym(d, 11).astype(np.float32)
    # ill-conditioned spectrum to stress orthogonality
    w, U = np.linalg.eigh(H.astype(np.float64))
    w = np.logspace(-6, 0, d)
    H = (U * w) @ U.T
    g = np.random.default_rng(12).standard_normal(d)
    Hj = jnp.asarray(H, jnp.float32)
    op = lambda v: (Hj @ v, None)
    g32 = jnp.asarray(g, jnp.float32)
    res_plain = lanczos(op, g32, m, reorth_passes=0, accum_dtype=jnp.float32)
    res_reorth = lanczos(op, g32, m, reorth_passes=1, accum_dtype=jnp.float32)

    def orth_err(res):
        V = np.asarray(res.V)[: int(res.k)]
        return np.abs(V @ V.T - np.eye(len(V))).max()

    assert orth_err(res_reorth) < 1e-5
    assert orth_err(res_reorth) <= orth_err(res_plain)
