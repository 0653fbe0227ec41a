"""Head-to-head convergence parity against the actual reference
implementation (/root/reference), executed in-process.

The reference is imported (not copied) with a numba stub (numba isn't
installed; its @njit logsig is pure NumPy and runs fine uncompiled). Both
stacks run the same problem with identical hyperparameters; we then check
iteration-for-iteration that loss trajectories match to fp64 tolerances.

Skipped automatically if /root/reference is not present.
"""

import os
import sys
import types

import numpy as np
import pytest
import scipy.sparse as sp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference optimizer package with a numba stub."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda f=None, **kw: (f if callable(f)
                                           else (lambda g: g))
        sys.modules["numba"] = numba
    sys.path.insert(0, REF)
    try:
        from optimizer.cubic import SSCN as RefSSCN  # noqa: F401
        from optimizer.cubic import Cubic_Krylov_LS, Cubic_LS
        from optimizer.loss import LogisticRegression as RefLogReg

        yield types.SimpleNamespace(
            Cubic_Krylov_LS=Cubic_Krylov_LS, Cubic_LS=Cubic_LS,
            RefLogReg=RefLogReg, RefSSCN=RefSSCN,
        )
    finally:
        sys.path.remove(REF)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    n, d = 500, 80
    Ad = rng.standard_normal((n, d)) * (rng.random((n, d)) < 0.25)
    A = sp.csr_matrix(Ad)
    x_star = rng.standard_normal(d) / np.sqrt(d)
    b = np.where(Ad @ x_star + 0.5 * rng.standard_normal(n) > 0, 1.0, -1.0)
    x0 = np.ones(d) * 0.5
    return A, b, x0


def _run_ref(alg, x0, it_max):
    alg.run(x0=x0, it_max=it_max, t_max=1e9)
    alg.compute_loss_of_iterates()
    return np.asarray(alg.trace.loss_vals), list(alg.trace.its)


def _run_ours(alg, x0, it_max):
    alg.run(x0=x0, it_max=it_max)
    alg.compute_loss_of_iterates()
    return np.asarray(alg.trace.loss_vals), list(alg.trace.its)


def test_oracle_parity(ref_modules, problem):
    A, b, x0 = problem
    from krylov_crn_tpu.models.logistic import LogisticRegression

    ref = ref_modules.RefLogReg(A, b, l1=0, l2=0,
                                store_mat_vec_prod=True)
    ours = LogisticRegression(A, b)
    assert abs(ref.value(x0) - ours.value(x0)) < 1e-12
    np.testing.assert_allclose(np.asarray(ours.gradient(x0)),
                               ref.gradient(x0), rtol=1e-10, atol=1e-14)
    v = np.random.default_rng(1).standard_normal(len(x0))
    np.testing.assert_allclose(np.asarray(ours.hess_vec_prod(x0, v)),
                               ref.hess_vec_prod(x0, v), rtol=1e-10,
                               atol=1e-14)
    # smoothness constants drive default reg_coef — must agree
    assert abs(ref.smoothness - ours.smoothness) < 1e-6 * ref.smoothness
    assert abs(ref.hessian_lipschitz - ours.hessian_lipschitz) < \
        1e-6 * ref.hessian_lipschitz


def test_krylov_trajectory_parity(ref_modules, problem):
    """Same per-iteration losses as the reference Krylov CRN (m=10)."""
    A, b, x0 = problem
    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.solvers import CubicKrylov

    it_max = 15
    ref_loss = ref_modules.RefLogReg(A, b, l1=0, l2=0,
                                     store_mat_vec_prod=True)
    ref_alg = ref_modules.Cubic_Krylov_LS(
        loss=ref_loss, reg_coef=1e-3, subspace_dim=10, tolerance=1e-9,
        label="ref", tqdm=False)
    ref_vals, ref_its = _run_ref(ref_alg, x0, it_max)

    # reorth off for exact three-term-recurrence parity with the reference
    our_loss = LogisticRegression(A, b)
    our_alg = CubicKrylov(loss=our_loss, reg_coef=1e-3, subspace_dim=10,
                          tolerance=1e-9, label="ours", tqdm=False,
                          reorth_passes=0)
    our_vals, our_its = _run_ours(our_alg, x0, it_max)

    assert ref_its == our_its
    np.testing.assert_allclose(our_vals, ref_vals, rtol=1e-6, atol=1e-10)
    # the trajectory end should agree to near-machine precision in f
    assert abs(our_vals[-1] - ref_vals[-1]) < 1e-9


def test_crn_trajectory_parity(ref_modules, problem):
    A, b, x0 = problem
    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.solvers import CubicNewton

    it_max = 10
    ref_loss = ref_modules.RefLogReg(A, b, l1=0, l2=0,
                                     store_mat_vec_prod=True)
    ref_alg = ref_modules.Cubic_LS(loss=ref_loss, reg_coef=1e-3,
                                   cubic_solver="full", tolerance=1e-8,
                                   label="ref", tqdm=False)
    ref_vals, ref_its = _run_ref(ref_alg, x0, it_max)

    our_loss = LogisticRegression(A, b)
    our_alg = CubicNewton(loss=our_loss, reg_coef=1e-3,
                          cubic_solver="full", tolerance=1e-8,
                          label="ours", tqdm=False)
    our_vals, our_its = _run_ours(our_alg, x0, it_max)

    assert ref_its == our_its
    np.testing.assert_allclose(our_vals, ref_vals, rtol=1e-6, atol=1e-10)


def test_sscn_statistical_parity(ref_modules, problem):
    """SSCN draws different random coordinates (numpy vs jax PRNG), so
    trajectories differ; final suboptimality must match statistically."""
    A, b, x0 = problem
    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.solvers import SSCN

    it_max = 150
    ref_loss = ref_modules.RefLogReg(A.tocsc(), b, l1=0, l2=0,
                                     store_mat_vec_prod=True)
    ref_alg = ref_modules.RefSSCN(loss=ref_loss, reg_coef=1e-3,
                                  subspace_dim=20, tolerance=1e-9,
                                  label="ref", tqdm=False)
    ref_vals, _ = _run_ref(ref_alg, x0, it_max)

    our_loss = LogisticRegression(A, b)
    our_alg = SSCN(loss=our_loss, reg_coef=1e-3, subspace_dim=20,
                   tolerance=1e-9, label="ours", tqdm=False)
    our_vals, _ = _run_ours(our_alg, x0, it_max)

    f0 = ref_vals[0]
    fstar_proxy = min(ref_vals.min(), our_vals.min())
    ref_gap = ref_vals[-1] - fstar_proxy
    our_gap = our_vals[-1] - fstar_proxy
    # same order of magnitude of progress
    assert our_vals[-1] < f0
    assert our_gap < 10 * max(ref_gap, 1e-12) + 1e-6
