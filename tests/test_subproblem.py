"""Cubic subproblem: optimality conditions, solver variants, CG."""

import jax.numpy as jnp
import numpy as np

from krylov_crn_tpu.ops.cg import cg_solve
from krylov_crn_tpu.ops.subproblem import (
    cubic_solve_cg,
    cubic_solve_eigh,
    cubic_subproblem_eigh,
    secular_newton,
    tridiag_eigh,
)


def _rand_spd(d, seed):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((d, d))
    return B @ B.T / d + 0.1 * np.eye(d)


def _check_optimality(s, lam, g, H, M, tol=1e-7):
    """First-order conditions: (H + lam I)s = -g and lam = M ||s||."""
    resid = (H + lam * np.eye(len(g))) @ s + g
    assert np.linalg.norm(resid) < tol * max(1.0, np.linalg.norm(g))
    assert abs(lam - M * np.linalg.norm(s)) < tol * max(1.0, lam)


def test_eigh_solution_optimality():
    d, M = 12, 0.5
    H = _rand_spd(d, 0)
    g = np.random.default_rng(1).standard_normal(d)
    sol = cubic_subproblem_eigh(jnp.asarray(g), jnp.asarray(H), M, r0=0.1,
                                xtol=1e-12)
    _check_optimality(np.asarray(sol.s), float(sol.r), g, H, M, tol=1e-8)
    # model decrease formula: r/2||s||^2 - M/3||s||^3 - <g,s>/2
    s = np.asarray(sol.s)
    want = (float(sol.r) / 2 * np.dot(s, s)
            - M / 3 * np.linalg.norm(s) ** 3 - np.dot(g, s) / 2)
    assert abs(float(sol.model_decrease) - want) < 1e-10


def test_secular_newton_vs_bruteforce():
    d, M = 8, 2.0
    H = _rand_spd(d, 2)
    g = np.random.default_rng(3).standard_normal(d)
    theta, Q = np.linalg.eigh(H)
    c = Q.T @ g
    lam, it = secular_newton(jnp.asarray(theta), jnp.asarray(c), M, 0.1,
                             xtol=1e-14, it_max=200)
    lam = float(lam)
    # brute-force the root of phi(l) = l^2 - M^2 ||(H+lI)^{-1} g||^2
    from scipy.optimize import brentq

    def phi(l):
        s = np.linalg.solve(H + l * np.eye(d), g)
        return l * l - M * M * np.dot(s, s)

    want = brentq(phi, 1e-12, 100.0, xtol=1e-14)
    assert abs(lam - want) < 1e-10
    assert int(it) < 50


def test_indefinite_hessian_safeguard():
    """With an indefinite H the solver must stay above -theta_min."""
    d, M = 6, 1.0
    rng = np.random.default_rng(4)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    theta = np.array([-0.5, -0.1, 0.2, 0.5, 1.0, 2.0])
    H = (Q * theta) @ Q.T
    g = rng.standard_normal(d)
    sol = cubic_subproblem_eigh(jnp.asarray(g), jnp.asarray(H), M, r0=0.1,
                                xtol=1e-12, it_max=500)
    lam = float(sol.r)
    assert lam > 0.5  # must exceed -theta_min for PD shift
    _check_optimality(np.asarray(sol.s), lam, g, H, M, tol=1e-6)


def test_tridiag_path_equals_dense():
    m, M = 10, 0.3
    rng = np.random.default_rng(5)
    alphas = rng.random(m) + 1.0
    betas = rng.random(m - 1) * 0.5
    T = np.diag(alphas) + np.diag(betas, -1) + np.diag(betas, 1)
    gnorm = 2.7
    g_sub = np.zeros(m)
    g_sub[0] = gnorm
    theta, Q = tridiag_eigh(jnp.asarray(alphas), jnp.asarray(betas))
    sol_t = cubic_solve_eigh(theta, Q, jnp.asarray(g_sub), M, 0.1,
                             xtol=1e-13)
    sol_d = cubic_subproblem_eigh(jnp.asarray(g_sub), jnp.asarray(T), M,
                                  r0=0.1, xtol=1e-13)
    np.testing.assert_allclose(np.asarray(sol_t.s), np.asarray(sol_d.s),
                               atol=1e-10)


def test_masked_zero_block_harmless():
    """Zero alpha/beta tail (Lanczos breakdown) must not affect the step."""
    M = 0.7
    alphas_full = np.array([2.0, 1.5, 1.0])
    betas_full = np.array([0.3, 0.2])
    # same system embedded in a larger masked one
    alphas_mask = np.array([2.0, 1.5, 1.0, 0.0, 0.0])
    betas_mask = np.array([0.3, 0.2, 0.0, 0.0])
    g3 = np.zeros(3)
    g3[0] = 1.1
    g5 = np.zeros(5)
    g5[0] = 1.1
    t3, q3 = tridiag_eigh(jnp.asarray(alphas_full), jnp.asarray(betas_full))
    t5, q5 = tridiag_eigh(jnp.asarray(alphas_mask), jnp.asarray(betas_mask))
    s3 = np.asarray(cubic_solve_eigh(t3, q3, jnp.asarray(g3), M, 0.1,
                                     xtol=1e-13).s)
    s5 = np.asarray(cubic_solve_eigh(t5, q5, jnp.asarray(g5), M, 0.1,
                                     xtol=1e-13).s)
    np.testing.assert_allclose(s5[:3], s3, atol=1e-10)
    np.testing.assert_allclose(s5[3:], 0, atol=1e-12)


def test_cg_solver_matches_eigh():
    d, M = 20, 0.4
    H = _rand_spd(d, 6)
    g = np.random.default_rng(7).standard_normal(d)
    hvp = lambda v: jnp.asarray(H) @ v
    sol_cg = cubic_solve_cg(hvp, jnp.asarray(g), M, 0.1, epsilon=1e-10,
                            accum_dtype=jnp.float64)
    sol_ei = cubic_subproblem_eigh(jnp.asarray(g), jnp.asarray(H), M,
                                   r0=0.1, xtol=1e-10)
    np.testing.assert_allclose(np.asarray(sol_cg.s), np.asarray(sol_ei.s),
                               atol=1e-6)
    assert abs(float(sol_cg.r) - float(sol_ei.r)) < 1e-6


def test_cg_solve_linear_system():
    d = 30
    H = _rand_spd(d, 8)
    b = np.random.default_rng(9).standard_normal(d)
    x, it = cg_solve(lambda v: jnp.asarray(H) @ v, jnp.asarray(b),
                     rtol=1e-12, accum_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, b),
                               atol=1e-8)
    assert int(it) <= d + 5
