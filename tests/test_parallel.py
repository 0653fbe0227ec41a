"""Distribution layer on the 8-device CPU fake mesh: sharded SpMV/HVP
parity with single-device, full sharded Krylov-CRN run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from krylov_crn_tpu import CubicKrylov, LogisticRegression
from krylov_crn_tpu.data.formats import build_dual
from krylov_crn_tpu.data.synthetic import powerlaw_sparse
from krylov_crn_tpu.parallel.mesh import make_mesh
from krylov_crn_tpu.parallel.sharded import (
    build_sharded_dual,
    partition_rows,
    sharded_rmatvec,
    sharded_spmv,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _unpad(y_sharded, sd):
    """Gather the real rows out of a (D*n_l,) padded sharded vector."""
    y = np.asarray(y_sharded).reshape(sd.n_shards, sd.n_local)
    mask = np.asarray(sd.mask).reshape(sd.n_shards, sd.n_local).astype(bool)
    return np.concatenate([y[i][mask[i]] for i in range(sd.n_shards)])


def test_partition_rows_nnz_balanced():
    A = powerlaw_sparse(1000, 500, 20000, seed=1, dtype=np.float64)
    ranges = partition_rows(A.indptr, 8)
    assert ranges[0][0] == 0 and ranges[-1][1] == 1000
    for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
        assert e0 == s1
    nnzs = [A.indptr[e] - A.indptr[s] for s, e in ranges]
    assert max(nnzs) <= 1.5 * (sum(nnzs) / len(nnzs)) + A.indptr[-1] * 0.02


def test_sharded_spmv_matches(mesh):
    A = sp.random(977, 450, density=0.02, random_state=5, format="csr")
    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    x = np.random.default_rng(0).standard_normal(450)
    y = _unpad(sharded_spmv(sd, jnp.asarray(x)), sd)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_sharded_rmatvec_matches(mesh):
    A = sp.random(977, 450, density=0.02, random_state=6, format="csr")
    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    z = np.random.default_rng(1).standard_normal(977)
    from krylov_crn_tpu.parallel.sharded import pad_rowvec

    z_sh = pad_rowvec(z, sd, dtype=np.float64)
    got = np.asarray(sharded_rmatvec(sd, z_sh))
    np.testing.assert_allclose(got, A.T @ z, rtol=1e-11, atol=1e-12)


def test_sharded_oracle_matches_single(mesh):
    A = sp.random(500, 300, density=0.05, random_state=7, format="csr")
    rng = np.random.default_rng(2)
    b = np.where(rng.standard_normal(500) > 0, 1.0, -1.0)
    x = rng.standard_normal(300)
    v = rng.standard_normal(300)

    single = LogisticRegression(A, b, l2=0.01)
    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    multi = LogisticRegression(sd, b, l2=0.01)

    assert abs(single.value(x) - multi.value(x)) < 1e-12
    np.testing.assert_allclose(np.asarray(multi.gradient(x)),
                               np.asarray(single.gradient(x)),
                               rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(np.asarray(multi.hess_vec_prod(x, v)),
                               np.asarray(single.hess_vec_prod(x, v)),
                               rtol=1e-11, atol=1e-14)


def test_sharded_krylov_run_matches_single(mesh):
    """Full sharded Krylov-CRN training run == single-device run."""
    A = sp.random(640, 200, density=0.05, random_state=8, format="csr")
    rng = np.random.default_rng(3)
    b = np.where(rng.standard_normal(640) > 0, 1.0, -1.0)
    x0 = np.ones(200) * 0.5

    loss_1 = LogisticRegression(A, b, l2=1e-3,
                                want_dense=False)
    alg_1 = CubicKrylov(loss=loss_1, reg_coef=1e-3, subspace_dim=8,
                        tqdm=False, label="single")
    t1 = alg_1.run(x0=x0, it_max=12)

    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    loss_8 = LogisticRegression(sd, b, l2=1e-3)
    alg_8 = CubicKrylov(loss=loss_8, reg_coef=1e-3, subspace_dim=8,
                        tqdm=False, label="sharded")
    t8 = alg_8.run(x0=x0, it_max=12)

    np.testing.assert_allclose(np.asarray(t8.xs[-1]), np.asarray(t1.xs[-1]),
                               rtol=1e-8, atol=1e-10)
    assert abs(float(alg_8.state.value) - float(alg_1.state.value)) < 1e-12


def test_gram_sharded_K_matches_single(mesh):
    """Row-sharded K (GSPMD) Gram solver == single-device Gram solver."""
    from krylov_crn_tpu.solvers.krylov_gram import GramKrylov

    A = sp.random(520, 700, density=0.05, random_state=9, format="csr")
    rng = np.random.default_rng(4)
    b = np.where(rng.standard_normal(520) > 0, 1.0, -1.0)
    x0 = np.ones(700) * 0.5

    loss1 = LogisticRegression(A, b)
    g1 = GramKrylov(loss=loss1, reg_coef=1e-3, subspace_dim=8,
                    tqdm=False, label="single")
    g1.run(x0=x0, it_max=10)

    loss8 = LogisticRegression(A, b)
    g8 = GramKrylov(loss=loss8, reg_coef=1e-3, subspace_dim=8,
                    tqdm=False, label="sharded", mesh=mesh)
    g8.run(x0=x0, it_max=10)

    assert abs(float(g8.state.value) - float(g1.state.value)) < 1e-10
    np.testing.assert_allclose(np.asarray(g8.state.zeta),
                               np.asarray(g1.state.zeta),
                               rtol=1e-8, atol=1e-11)


def test_gram_run_fused_sharded_matches_single(mesh):
    """The FULL fused race path — run_fused with multistep scan, packed
    exact fp64 corrections, certify stacks and the trust-but-verify
    machinery — executed under a row-sharded-K mesh, against the same
    run on a single device (round-4 verdict: only isolated steps were
    mesh-tested; the _dev_like/_apply_correction sharding reinjection
    had never executed sharded).

    Numerics note: row-sharded K matvecs reduce each output element over
    the full row locally (w replicated), so the fp32 rounding stream
    matches the single-device lowering closely; boundary values are
    exact fp64 host corrections of the committed (gamma, zeta) either
    way."""
    from krylov_crn_tpu.solvers.krylov_gram import GramKrylov

    A = sp.random(520, 700, density=0.05, random_state=9, format="csr")
    rng = np.random.default_rng(4)
    b = np.where(rng.standard_normal(520) > 0, 1.0, -1.0)
    x0 = np.ones(700) * 0.5

    def run(mesh_arg):
        loss = LogisticRegression(A, b, dtype=np.float32)
        alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=8,
                         tolerance=0, tqdm=False, label="fused",
                         mesh=mesh_arg)
        tr = alg.run_fused(x0, it_max=12, chunk=4, certify=True,
                           exact_correction=True)
        return tr, alg

    t1, a1 = run(None)
    t8, a8 = run(mesh)

    # certify gives per-iteration exact fp64 values on both
    assert list(t8.metrics["exact_its"]) == list(t1.metrics["exact_its"])
    f1 = np.asarray(t1.metrics["exact_fs"])
    f8 = np.asarray(t8.metrics["exact_fs"])
    # exact values of fp32-committed iterates: reductions are ordered
    # identically (see docstring) but XLA tiling may differ at ~1 ulp
    # per step
    np.testing.assert_allclose(f8, f1, rtol=1e-5, atol=1e-9)
    # trust-but-verify boundary values are monotone by construction
    bf = [t8.loss_vals[0]] + list(f8)
    assert all(b2 <= b1 + 1e-12 for b1, b2 in zip(bf, bf[1:]))
    # the sharded run's state kept its sharding through the packed
    # correction reinjection (_apply_correction must not silently drop
    # it): the state must still be placed on the 8-device mesh, not
    # collapsed to a single device
    sh = a8.state.Ax.sharding
    assert getattr(sh, "mesh", None) is not None, (
        f"state lost its mesh placement: {sh!r}")
    assert len(a8.state.Ax.devices()) == len(mesh.devices.flat)


def test_sharded_gather_columns_matches_dense(mesh):
    """The sharded column panel equals the scipy column slice (padding
    rows zero)."""
    from krylov_crn_tpu.parallel.sharded import sharded_gather_columns

    A = sp.random(96, 140, density=0.08, random_state=3, format="csr")
    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    I = np.array([5, 139, 0, 77, 23, 64, 8, 101], np.int32)
    B = np.asarray(sharded_gather_columns(sd, jnp.asarray(I)))
    want = A[:, I].toarray()
    got_cols = [_unpad(B[:, j], sd) for j in range(len(I))]
    np.testing.assert_allclose(np.stack(got_cols, axis=1), want,
                               rtol=1e-14, atol=0)


def test_sscn_sharded_matches_single(mesh):
    """Sharded SSCN (round-4 verdict item 6, reference cubic.py:321-408)
    tracks the single-device run: same sampled coordinates (same PRNG
    key), panel gathers shard-local, H_I reductions psum'd under GSPMD,
    scatter update on the replicated iterate."""
    from krylov_crn_tpu.solvers.sscn import SSCN

    A = sp.random(640, 200, density=0.05, random_state=8, format="csr")
    rng = np.random.default_rng(3)
    b = np.where(rng.standard_normal(640) > 0, 1.0, -1.0)
    x0 = np.ones(200) * 0.5

    def run(loss):
        alg = SSCN(loss=loss, reg_coef=1e-3, subspace_dim=12, tqdm=False,
                   label="sscn")
        alg.run(x0=x0, it_max=10)
        return alg

    a1 = run(LogisticRegression(A, b, l2=1e-3, want_dense=False))
    sd = build_sharded_dual(A, mesh, dtype=np.float64, pad_to=64)
    a8 = run(LogisticRegression(sd, b, l2=1e-3))

    assert abs(float(a8.state.value) - float(a1.state.value)) < 1e-12
    np.testing.assert_allclose(np.asarray(a8.state.x),
                               np.asarray(a1.state.x),
                               rtol=1e-9, atol=1e-12)


def test_one_psum_per_hvp(sparse_problem, mesh):
    """Design invariant (SURVEY.md §2.2): a sharded fused HVP compiles to
    exactly ONE all-reduce — the psum of the d-vector after the local
    transpose-SpMV. Regression guard for the collective-traffic story in
    artifacts/scaling/collectives.json."""
    import re

    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.ops.spmv import hvp_sparse
    from krylov_crn_tpu.parallel.sharded import build_sharded_dual, pad_rowvec

    A, b, x0 = sparse_problem
    sd = build_sharded_dual(A, mesh)
    w = pad_rowvec(np.abs(np.random.default_rng(0).standard_normal(A.shape[0])), sd)
    v = jnp.ones((sd.d,), jnp.float32)
    hlo = jax.jit(lambda w, v: hvp_sparse(sd, w, v)).lower(w, v).compile().as_text()
    assert len(re.findall(r" all-reduce\(", hlo)) == 1


def test_gram_step_collective_budget(mesh):
    """Collective budget of the row-sharded-K Gram step AT THIS TOY SHAPE
    (n_pad=2048): every K-matvec costs exactly one all-gather of its
    n/D-local output — (m+2) matvecs plus the Lanczos stacked-dot
    combines and one line-search combine bound the all-gather count at
    m+7 (measured: 17 at m=10). All-reduces must all be scalar/small
    combines (compensated-reduction pair merges, the largest a
    f32[ls_max+1]): an all-reduce of an n-sized vector would mean a
    lost-sharding regression that re-reduces bulk data.

    Scope note (advisor round-4): the collective COUNT is NOT
    shape-independent — GSPMD partitions the bench shape (n_pad=20480)
    differently and emits 31 all-gathers there
    (artifacts/scaling/collectives.json). The bench-shape accounting
    lives in tools/scaling_evidence.py, which lowers abstractly at the
    real shape; this unit test guards the toy-shape lowering only (a
    bench-shape compile on the CPU fake mesh is too slow for the suite).
    The bulk-vector all-reduce assertion below IS shape-independent in
    intent: lost-sharding regressions re-reduce n-sized data at any n."""
    import re

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from krylov_crn_tpu.ops.gram import GramData
    from krylov_crn_tpu.solvers.krylov_crn import _accum_dtype
    from krylov_crn_tpu.solvers.krylov_gram import (
        GramKrylovState,
        gram_krylov_step,
    )

    m = 10
    n_pad = 2048
    row = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    f32 = jnp.float32

    def S(shape, dtype=f32, sh=repl):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    gd = GramData(K=S((n_pad, n_pad), sh=row), Ax0=S((n_pad,)),
                  b=S((n_pad,)), mask=S((n_pad,)), x0_sqnorm=S(()),
                  K_lr=None, n=n_pad - 100, d=2 * n_pad, nnz=16 * n_pad)
    vec = S((n_pad,))
    st = GramKrylovState(
        gamma=S(()), zeta=vec, Ax=vec, Ax_lo=vec, w_g=vec, uK=vec,
        value=S(()), value_lo=S(()), reg_coef=S(()), r0=S(()),
        solver_it=S((), jnp.int32), diff_norm=S(()), grad_norm=S(()),
        f_best=S(()), f_best_lo=S(()))
    hlo = gram_krylov_step.lower(
        gd, st, m=m, l2=0.0, beta=0.5, solver_eps=1e-8, solver_it_max=100,
        ls_max=20, reorth_passes=1, accum_dtype=_accum_dtype(f32),
        rederive=False, use_lr=False).compile().as_text()
    n_ag = len(re.findall(r" all-gather\(", hlo))
    assert n_ag <= m + 7, f"all-gather count regressed: {n_ag} > {m + 7}"
    # every all-reduce payload dimension must be small (scalar combines)
    big = [dims for dims in re.findall(r"= \w+\[([0-9,]+)\][^ ]* all-reduce\(", hlo)
           if max(int(d) for d in dims.split(",")) >= 1024]
    assert not big, f"bulk-vector all-reduces appeared: {big}"
