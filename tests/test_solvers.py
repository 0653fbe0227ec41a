"""End-to-end solver tests: convergence to an independently computed
optimum, variant parity, trace semantics."""

import numpy as np
import pytest

from krylov_crn_tpu import SSCN, CubicKrylov, CubicNewton, LogisticRegression


def _independent_fstar(A, b):
    """f* via scipy L-BFGS on an independently written fp64 objective."""
    from scipy.optimize import minimize

    Ad = A.toarray()
    b01 = (np.asarray(b) + 1) / 2 if set(np.unique(b)) == {-1.0, 1.0} \
        else np.asarray(b)
    n = Ad.shape[0]

    def f(x):
        Ax = Ad @ x
        logsig = np.where(Ax < 0, Ax - np.log1p(np.exp(Ax)),
                          -np.log1p(np.exp(-Ax)))
        return np.mean((1 - b01) * Ax - logsig)

    def grad(x):
        sig = 1 / (1 + np.exp(-(Ad @ x)))
        return Ad.T @ (sig - b01) / n

    res = minimize(f, np.zeros(Ad.shape[1]), jac=grad, method="L-BFGS-B",
                   options=dict(maxiter=5000, ftol=1e-16, gtol=1e-12))
    return res.fun


@pytest.fixture(scope="module")
def fstar(small_problem):
    A, b, _ = small_problem
    return _independent_fstar(A, b)


def test_krylov_crn_converges(small_problem, fstar):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=10,
                      tolerance=1e-9, tqdm=False, label="krylov")
    trace = alg.run(x0=x0, it_max=60)
    alg.compute_loss_of_iterates()
    vals = np.asarray(trace.loss_vals)
    assert (np.diff(vals) <= 1e-12).all(), "loss must be non-increasing"
    assert vals[-1] - fstar < 1e-9
    assert trace.solver_its is not None
    assert len(trace.solver_its) == len(trace.its)


def test_crn_full_converges(small_problem, fstar):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicNewton(loss=loss, reg_coef=1e-3, cubic_solver="full",
                      tolerance=1e-8, tqdm=False, label="crn")
    trace = alg.run(x0=x0, it_max=40)
    alg.compute_loss_of_iterates()
    assert np.asarray(trace.loss_vals)[-1] - fstar < 1e-9


def test_crn_cg_matches_full(small_problem):
    A, b, x0 = small_problem
    loss1 = LogisticRegression(A, b)
    loss2 = LogisticRegression(A, b)
    full = CubicNewton(loss=loss1, reg_coef=1e-3, cubic_solver="full",
                       tqdm=False, label="full")
    cg = CubicNewton(loss=loss2, reg_coef=1e-3, cubic_solver="CG",
                     tqdm=False, label="cg")
    t1 = full.run(x0=x0, it_max=8)
    t2 = cg.run(x0=x0, it_max=8)
    x_full = np.asarray(t1.xs[-1])
    x_cg = np.asarray(t2.xs[-1])
    np.testing.assert_allclose(x_full, x_cg, atol=1e-4)


def test_sscn_converges(small_problem, fstar):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = SSCN(loss=loss, reg_coef=1e-3, subspace_dim=20, tqdm=False,
               label="sscn")
    trace = alg.run(x0=x0, it_max=400)
    alg.compute_loss_of_iterates()
    vals = np.asarray(trace.loss_vals)
    assert (np.diff(vals) <= 1e-12).all()
    assert vals[-1] - fstar < 1e-4  # stochastic method: looser target


def test_krylov_on_sparse_problem(sparse_problem):
    A, b, x0 = sparse_problem
    # planted-label problems can be separable; l2 makes the optimum finite
    loss = LogisticRegression(A, b, l2=1e-3)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=10,
                      tolerance=1e-9, tqdm=False, label="krylov")
    trace = alg.run(x0=x0, it_max=30)
    alg.compute_loss_of_iterates()
    vals = np.asarray(trace.loss_vals)
    assert vals[-1] < vals[0]
    assert (np.diff(vals) <= 1e-12).all()
    # gradient norm should have dropped by orders of magnitude
    assert float(alg.state.grad_norm) < 1e-5


def test_trace_subsampling(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=5,
                      tqdm=False, trace_len=12, save_first_iterations=3,
                      label="k")
    trace = alg.run(x0=x0, it_max=30)
    # first save_first_iterations+1 checkpoints always kept (its 0..3)
    assert trace.its[:4] == [0, 1, 2, 3]
    # subsampling keeps the trace around trace_len
    assert len(trace.its) <= 12 + 4


def test_f_opt_flows_to_loss(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=10,
                      tqdm=False, label="k")
    alg.run(x0=x0, it_max=25)
    assert loss.f_opt < 0.32  # near f* ~ 0.3056, far below f(x0)
    assert loss.f_opt == float(alg.state.f_best)


def test_seed_restart_resumes(small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=5,
                      tqdm=False, seeds=[1, 2], label="k")
    trace = alg.run(x0=x0, it_max=5)
    assert alg.finished_seeds == [1, 2]
    # re-run is a no-op (both seeds finished)
    t2 = alg.run(x0=x0, it_max=5)
    assert t2 is trace
