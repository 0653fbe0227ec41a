"""Trace plotting and the CLI figure pipeline (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from krylov_crn_tpu import CubicKrylov, LogisticRegression


def test_plot_losses_and_distances(small_problem, tmp_path):
    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=6,
                      tqdm=False, label="k")
    trace = alg.run(x0=x0, it_max=10)
    alg.compute_loss_of_iterates()

    plt.figure()
    trace.plot_losses(marker="v", markersize=5, f_opt=loss.f_opt)
    trace.plot_losses(time=True, label="k-time")
    plt.yscale("log")
    plt.legend()
    out = tmp_path / "losses.pdf"
    plt.savefig(out)
    assert out.stat().st_size > 0
    plt.close("all")

    plt.figure()
    trace.plot_distances()
    plt.savefig(tmp_path / "dists.pdf")
    plt.close("all")


def test_cli_end_to_end(tmp_path, monkeypatch):
    """Tiny synthetic CLI run producing a figure."""
    from krylov_crn_tpu import cli

    rc = cli.main([
        "--dataset", "w8a", "--synthetic", "--it_max", "3",
        "--time_max", "600", "--no-bench-run", "--SSCN_dim", "4",
        "--krylov_dim", "4", "--out-dir", str(tmp_path),
        "--solver", "coo",
    ])
    assert rc == 0
    assert (tmp_path / "iteration_w8a.pdf").stat().st_size > 0


def test_cli_local_libsvm_file(tmp_path):
    """The real-data user workflow: --dataset <local LIBSVM path> (the
    reference downloads from the LIBSVM site, cubic_newton.py:43-52;
    this env is zero-egress so the CLI takes a local file instead —
    BASELINE.md's real-data row is undemonstrable without data, but the
    ingestion path a user would drop w8a/rcv1/news20 into is this one)."""
    from krylov_crn_tpu import cli
    from krylov_crn_tpu.data.synthetic import synthetic_logreg

    A, b = synthetic_logreg((120, 90, 900), seed=3)
    data = tmp_path / "mini.libsvm"
    with open(data, "w") as fh:
        for i in range(A.shape[0]):
            row = A.getrow(i).tocoo()
            toks = " ".join(f"{j + 1}:{v:.17g}"
                            for j, v in zip(row.col, row.data))
            fh.write(f"{int(b[i])} {toks}\n")

    rc = cli.main([
        "--dataset", str(data), "--it_max", "3", "--time_max", "600",
        "--no-bench-run", "--SSCN_dim", "4", "--krylov_dim", "4",
        "--out-dir", str(tmp_path), "--solver", "coo",
    ])
    assert rc == 0
    assert (tmp_path / f"iteration_{data.name}.pdf").stat().st_size > 0


def test_gram_trace_distances_save_roundtrip(small_problem, tmp_path):
    """Gram checkpoints are (gamma, zeta, Ax) reps: plot_distances must
    materialize them, and save/from_pickle must survive the pytree
    checkpoints + the solver-bound materializer."""
    from krylov_crn_tpu.solvers.krylov_gram import GramKrylov
    from krylov_crn_tpu.utils.trace import Trace

    A, b, x0 = small_problem
    loss = LogisticRegression(A, b)
    alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=6,
                     tqdm=False, label="gram")
    trace = alg.run(x0=x0, it_max=8)
    alg.compute_loss_of_iterates()

    plt.figure()
    trace.plot_distances()
    plt.savefig(tmp_path / "gram_dists.pdf")
    plt.close("all")

    trace.save("gram.pkl", path=str(tmp_path))
    assert trace.materializer is not None  # restored after pickling
    loaded = Trace.from_pickle(str(tmp_path / "gram.pkl"), loss=loss)
    assert len(loaded.xs) == len(trace.xs)
    # loaded checkpoints are host-numpy pytrees with the values intact
    np.testing.assert_allclose(
        np.asarray(loaded.xs[-1].Ax), np.asarray(trace.xs[-1].Ax),
        rtol=1e-12)
    assert np.isclose(loaded.best_loss_value, trace.best_loss_value)
    # the reloaded trace can still materialize reps (picklable
    # RepMaterializer re-attached to the loss by from_pickle)
    plt.figure()
    loaded.plot_distances()
    plt.close("all")
    x_last = np.asarray(loaded.materializer(loaded.xs[-1]))
    np.testing.assert_allclose(
        x_last, np.asarray(alg.materialize(trace.xs[-1])), rtol=1e-10)
