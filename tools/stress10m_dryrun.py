"""Structural exercise of the stress-10m config (BASELINE.md:31).

stress-10m (10M x 10M rows/cols, 1B nnz) needs ~24 GB of COO + transpose
— an 8-chip row-sharded target this box cannot hold on one device. What
CAN be exercised without the pod is the full row-sharded code path at the
REAL row/column dimensions with reduced nnz: build the nnz-balanced
8-shard ShardedDual at 10M x 10M (1e8 nnz), run one fused sharded HVP on
the 8-virtual-device CPU mesh, verify it against scipy, and record the
collective count (exactly one all-reduce) plus the per-device memory
layout the 1B-nnz version would scale to.

Round-3 verdict item 8: the projection in PERF.md was previously the only
stress-10m evidence; this makes the sharded build + execute structurally
real at the target shape.

Run:  python tools/stress10m_dryrun.py   (CPU-only; ~5-10 min host work)
Writes artifacts/stress/stress10m_dryrun.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

N = D_DIM = 10_000_000
NNZ = 100_000_000  # 1/10 of the 1B target; same shape, same code path
FULL_NNZ = 1_000_000_000


def main():
    import scipy.sparse as sp

    from jax.sharding import Mesh

    from krylov_crn_tpu.ops.spmv import hvp_sparse
    from krylov_crn_tpu.parallel.mesh import DATA_AXIS
    from krylov_crn_tpu.parallel.sharded import (
        build_sharded_dual,
        pad_rowvec,
    )

    out = {"config": f"{N}x{D_DIM}, {NNZ} nnz (structural dry-run of the "
                     f"{FULL_NNZ}-nnz stress-10m on an 8-device fake mesh)"}

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    # power-law column popularity via inverse-CDF on a Zipf(1.1) weight
    # (rng.choice with an explicit 1e7-entry p is ~10x slower)
    w = 1.0 / np.arange(1, D_DIM + 1, dtype=np.float64) ** 1.1
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    cols = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
    rows = rng.integers(0, N, NNZ)
    vals = np.abs(rng.standard_normal(NNZ)).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, D_DIM)).tocsr()
    del rows, cols, vals
    out["host_gen_s"] = round(time.perf_counter() - t0, 1)
    out["nnz_actual"] = int(A.nnz)

    t0 = time.perf_counter()
    mesh = Mesh(np.array(jax.devices()[:8]), (DATA_AXIS,))
    sd = build_sharded_dual(A, mesh)
    out["shard_build_s"] = round(time.perf_counter() - t0, 1)
    out["n_local_rows"] = int(sd.n_local)
    out["nnz_local_padded"] = int(sd.a_vals.shape[0] // 8)
    # per-device bytes at THIS nnz and scaled to the 1B-nnz target:
    # rows+cols int32 + vals f32 for A and A^T = 24 B/nnz (+ masks)
    per_dev = 2 * 3 * 4 * out["nnz_local_padded"]
    out["bytes_per_device"] = per_dev
    out["bytes_per_device_at_1B_nnz"] = per_dev * (FULL_NNZ // NNZ)
    out["fits_16GB_HBM_at_1B_nnz"] = \
        out["bytes_per_device_at_1B_nnz"] < 16e9

    # one fused HVP through the sharded path; exactly one all-reduce
    w_h = np.abs(np.random.default_rng(1).standard_normal(N)) \
        .astype(np.float32)
    wp = pad_rowvec(w_h, sd)
    v = np.zeros(D_DIM, np.float32)
    hot = np.random.default_rng(2).integers(0, D_DIM, 1000)
    v[hot] = 1.0
    vd = jnp.asarray(v)

    fn = jax.jit(lambda w, v: hvp_sparse(sd, w, v))
    hlo = fn.lower(wp, vd).compile().as_text()
    n_ar = hlo.count(" all-reduce(")
    out["all_reduces_per_hvp"] = n_ar

    t0 = time.perf_counter()
    got = np.asarray(fn(wp, vd))
    out["hvp_exec_s"] = round(time.perf_counter() - t0, 1)

    # verify vs scipy on the host (fp64); hvp_sparse = A^T(w*(Av))/n
    t0 = time.perf_counter()
    Av = A @ v.astype(np.float64)
    want = (A.T @ (w_h.astype(np.float64) * Av)) / N
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    out["rel_err_vs_scipy"] = float(err)
    out["verify_s"] = round(time.perf_counter() - t0, 1)
    out["ok"] = bool(err < 1e-4 and n_ar == 1
                     and out["fits_16GB_HBM_at_1B_nnz"])

    os.makedirs("artifacts/stress", exist_ok=True)
    with open("artifacts/stress/stress10m_dryrun.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
