"""Checkpoint/resume of solver runs and trace pickling."""

import numpy as np

from krylov_crn_tpu import CubicKrylov, LogisticRegression, Trace
from krylov_crn_tpu.utils.checkpoint import load_run, save_run


def test_save_load_run_resumes_exactly(tmp_path, small_problem):
    A, b, x0 = small_problem

    # run 12 iterations straight
    loss_a = LogisticRegression(A, b)
    alg_a = CubicKrylov(loss=loss_a, reg_coef=1e-3, subspace_dim=6,
                        tqdm=False, label="straight")
    alg_a.run(x0=x0, it_max=12)

    # run 6, checkpoint, restore into a fresh optimizer, run 6 more
    loss_b = LogisticRegression(A, b)
    alg_b = CubicKrylov(loss=loss_b, reg_coef=1e-3, subspace_dim=6,
                        tqdm=False, label="resumed")
    alg_b.run(x0=x0, it_max=6)
    ck = tmp_path / "run.npz"
    save_run(ck, alg_b)

    loss_c = LogisticRegression(A, b)
    alg_c = CubicKrylov(loss=loss_c, reg_coef=1e-3, subspace_dim=6,
                        tqdm=False, label="resumed")
    alg_c.init_run(np.asarray(x0), 42)
    alg_c.initialized = True
    load_run(ck, alg_c)
    assert alg_c.it == 6
    alg_c.run(x0=x0, it_max=12)

    np.testing.assert_allclose(np.asarray(alg_c.state.x),
                               np.asarray(alg_a.state.x),
                               rtol=1e-10, atol=1e-12)
    assert abs(float(alg_c.state.value) - float(alg_a.state.value)) < 1e-12


def test_trace_pickle_roundtrip(tmp_path, small_problem):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=6,
                      tqdm=False, label="t")
    trace = alg.run(x0=x0, it_max=8)
    alg.compute_loss_of_iterates()
    trace.save("trace.pkl", path=str(tmp_path))
    assert trace.loss is loss  # handle restored after save

    loss2 = LogisticRegression(A, b)
    restored = Trace.from_pickle(tmp_path / "trace.pkl", loss=loss2)
    assert restored.label == "t"
    np.testing.assert_allclose(np.asarray(restored.loss_vals),
                               np.asarray(trace.loss_vals))
    # from_pickle merges the best stored loss into f_opt
    assert loss2.f_opt <= float(np.min(trace.loss_vals))
