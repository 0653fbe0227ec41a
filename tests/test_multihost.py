"""Multi-host data loading on the 8-virtual-device CPU mesh.

``load_sharded_libsvm`` follows the real multi-host code path (byte-range
reads, cross-process size agreement, make_array_from_process_local_data);
single-process runs exercise everything except the physical DCN transport
(SURVEY.md §4: the standard fake-mesh idiom).
"""

import numpy as np
import pytest

from krylov_crn_tpu.parallel.mesh import make_mesh
from krylov_crn_tpu.parallel.multihost import (
    init_distributed,
    load_libsvm_rows,
    load_sharded_libsvm,
    split_bytes_by_rows,
)


@pytest.fixture(scope="module")
def libsvm_file(tmp_path_factory):
    """A small LIBSVM text file + its scipy ground truth."""
    import scipy.sparse as sp

    from krylov_crn_tpu.data.synthetic import synthetic_logreg

    A, b = synthetic_logreg((240, 180, 2400), seed=11)
    path = tmp_path_factory.mktemp("libsvm") / "tiny.libsvm"
    with open(path, "w") as fh:
        for i in range(A.shape[0]):
            row = A.getrow(i).tocoo()
            toks = " ".join(f"{j + 1}:{v:.17g}"  # 1-based, exact fp64
                            for j, v in zip(row.col, row.data))
            fh.write(f"{int(b[i])} {toks}\n")
    return str(path), A, b


def test_init_distributed_single_process_noop():
    assert init_distributed() == 0


def test_byte_splits_cover_file_and_snap_lines(libsvm_file):
    path, A, b = libsvm_file
    import os

    size = os.path.getsize(path)
    parts = [split_bytes_by_rows(path, 4, k) for k in range(4)]
    assert parts[0][0] == 0 and parts[-1][1] == size
    for (s0, e0), (s1, e1) in zip(parts, parts[1:]):
        assert e0 == s1  # contiguous
    # parsing the parts reproduces the whole file
    total_rows = 0
    total_nnz = 0
    for rng in parts:
        labels, rows, cols, vals = load_libsvm_rows(path, rng)
        total_rows += labels.shape[0]
        total_nnz += vals.shape[0]
    assert total_rows == A.shape[0]
    assert total_nnz == A.nnz


def test_load_sharded_libsvm_matches_scipy(libsvm_file):
    import jax.numpy as jnp

    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.parallel.sharded import (
        sharded_rmatvec,
        sharded_spmv,
    )

    path, A, b = libsvm_file
    mesh = make_mesh(8)
    sd, b_pad = load_sharded_libsvm(path, mesh, dtype=np.float64,
                                    pad_to=64)
    assert sd.shape == A.shape
    assert sd.nnz == A.nnz

    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[1])
    y = np.asarray(sharded_spmv(sd, jnp.asarray(x)))
    # device layout is padded/permuted; compare sorted nonzero margins via
    # the mask-compacted rows
    mask = np.asarray(sd.mask) > 0
    got = np.sort(y[mask])
    want = np.sort(np.asarray(A @ x).ravel())
    np.testing.assert_allclose(got, want, rtol=1e-9)

    z = rng.standard_normal(int(sd.n_padded))
    z = z * np.asarray(sd.mask)
    zt = np.asarray(sharded_rmatvec(sd, jnp.asarray(z)))
    # scatter z back to original row order is nontrivial (nnz-balanced
    # contiguous blocks, in file order) -> reconstruct the permutation
    counts = np.asarray(sd.mask).reshape(8, -1).sum(1).astype(int)
    z_orig = np.concatenate([
        z.reshape(8, -1)[i, : counts[i]] for i in range(8)])
    np.testing.assert_allclose(zt, A.T @ z_orig, rtol=1e-9)

    # end-to-end: oracle value from prepadded labels == host value
    loss = LogisticRegression(sd, b_pad)
    x0 = np.ones(A.shape[1]) * 0.5
    m = A @ x0
    b01 = (np.asarray(b) > 0).astype(np.float64)
    want_val = np.mean((1.0 - b01) * m + np.logaddexp(0.0, -m))
    assert abs(loss.value(x0) - want_val) < 1e-12


def test_sharded_krylov_from_libsvm_runs(libsvm_file):
    import jax.numpy as jnp

    from krylov_crn_tpu.models.logistic import LogisticRegression
    from krylov_crn_tpu.solvers.krylov_crn import CubicKrylov

    path, A, b = libsvm_file
    mesh = make_mesh(8)
    sd, b_pad = load_sharded_libsvm(path, mesh, dtype=np.float64,
                                    pad_to=64)
    loss = LogisticRegression(sd, b_pad)
    alg = CubicKrylov(loss=loss, reg_coef=1e-3, subspace_dim=6,
                      tqdm=False, label="mh")
    x0 = jnp.ones(A.shape[1], jnp.float64) * 0.5
    alg.run(x0=x0, it_max=5)
    vals = [float(v) for v in
            (alg.trace.loss_vals if len(alg.trace.loss_vals) else [])]
    # value must strictly decrease over the 5 sharded iterations
    v0 = float(loss.value(np.asarray(x0)))
    v5 = float(alg.state.value) + float(alg.state.value_lo)
    assert v5 < v0 - 1e-3


def test_global_label_coding_agrees_across_hosts():
    """Labels {3,7} split so hosts see different first labels must not
    invert classes (round-2 advisor finding: per-host first-seen coding
    is order-dependent)."""
    from krylov_crn_tpu.parallel.multihost import global_label_coding

    host0 = np.array([3.0, 7.0, 3.0, 3.0])
    host1 = np.array([7.0, 3.0, 7.0])  # starts with the other class

    # gather both hosts' metas first (as jax's process_allgather would)
    rows = []
    for lab in (host0, host1):
        lu = np.unique(lab)
        pad = np.full(3, np.nan)
        pad[: min(len(lu), 3)] = lu[:3]
        rows.append(np.array([*pad, float(lab[0])]))
    gathered = np.stack(rows)

    b0 = global_label_coding(host0, allgather=lambda x: gathered)
    b1 = global_label_coding(host1, allgather=lambda x: gathered)
    # one consistent global coding: label 3 -> same bit on both hosts
    assert set(np.unique(np.concatenate([b0, b1]))) == {0.0, 1.0}
    assert b0[0] == b0[2] == b0[3] == b1[1]  # all the 3s agree
    assert b1[0] == b1[2] == b0[1]  # all the 7s agree
    assert b0[0] != b1[0]

    # standard pairs keep the reference maps
    g = lambda lab: global_label_coding(lab, allgather=lambda x: x[None])
    np.testing.assert_array_equal(g(np.array([-1.0, 1.0])), [0.0, 1.0])
    np.testing.assert_array_equal(g(np.array([1.0, 2.0])), [0.0, 1.0])
    np.testing.assert_array_equal(g(np.array([0.0, 1.0])), [0.0, 1.0])
