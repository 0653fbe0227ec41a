"""A/B: split-K 4-pass bf16 Gram build vs XLA HIGHEST (6-pass).

Measures, on the attached accelerator (value-fetch protocol, PERF.md):
  * K accuracy vs the fp64 host Gram: elementwise max rel err and
    K-matvec rel err (the quantity the solver depends on);
  * panel-GEMM throughput for both variants (chained, compile excluded);
  * end-to-end _build_K_device wall time on the bench datasets.

Usage:  python tools/measure_splitk.py [--dataset rcv1-like]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="rcv1-like")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from krylov_crn_tpu.data.synthetic import synthetic_logreg
    from krylov_crn_tpu.ops.gram import _build_K_device, _round_up, _syrk_split

    float(jnp.zeros(8)[0])
    out = {"dataset": args.dataset}

    A, b = synthetic_logreg(args.dataset, seed=0)
    n = int(A.shape[0])
    n_pad = _round_up(n, 256)

    # ---- accuracy: both builds vs fp64 host Gram, on a subsample of
    # rows (full fp64 Gram of 20k rows = 3.2 GB host; use 4096 rows) ----
    ns = 4096
    As = A[:ns]
    K64 = (As @ As.T).toarray()
    w = np.random.default_rng(0).standard_normal(ns)
    ref_mv = K64 @ w

    npad_s = _round_up(ns, 256)
    res = {}
    for tag, prec in (("split4", jax.lax.Precision.HIGHEST),
                      ("highest6", "direct")):
        if tag == "split4":
            Kd = _build_K_device(As, npad_s, np.float32)
        else:
            # bypass _panel_gemm's split by building through fp64->fp32?
            # direct: one dense GEMM at HIGHEST on the densified matrix
            Bs = jnp.asarray(As.toarray().astype(np.float32))
            Kd = jnp.matmul(Bs, Bs.T,
                            precision=jax.lax.Precision.HIGHEST)
            Kd = jnp.pad(Kd, ((0, npad_s - ns), (0, npad_s - ns)))
        Kh = np.asarray(Kd, np.float64)[:ns, :ns]
        elem = np.abs(Kh - K64)
        scale = np.sqrt(np.outer(np.diag(K64), np.diag(K64))) + 1e-30
        mv = Kh @ w
        res[tag] = {
            "elem_max_rel": float((elem / scale).max()),
            "matvec_rel": float(np.linalg.norm(mv - ref_mv)
                                / np.linalg.norm(ref_mv)),
        }
    out["accuracy"] = res

    # ---- panel-GEMM throughput (n_pad x 2048), chained ----
    from krylov_crn_tpu.utils.profiling import device_time_per_call

    cb = 2048
    key = jax.random.PRNGKey(0)
    B0 = jax.random.normal(key, (n_pad, cb), jnp.float32)

    # dependence structure mirrors the real build: carry (K, B), K += G,
    # and B depends on a slice of K. Anything weaker gets outsmarted:
    # `G[0,0]*0.0` constant-folds (GEMM fully DCE'd, "3309 Tflop/s");
    # `Bc + G[:, :1]` lets XLA narrow the GEMM to its first column.
    def _mk(gemm_fn):
        def make(k):
            @jax.jit
            def f(K, B):
                def body(carry, _):
                    K, B = carry
                    K = K + gemm_fn(B)
                    B = B + K[:, :cb] * 1e-30
                    return (K, B), ()
                (K, B), _ = jax.lax.scan(body, (K, B), None, length=k)
                return K[0, 0]
            return f
        return make

    make_split = _mk(_syrk_split)
    make_highest = _mk(lambda B: jax.lax.dot_general(
        B, B, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST))
    K0 = jnp.zeros((n_pad, n_pad), jnp.float32)

    flops = 2.0 * n_pad * n_pad * cb
    gemm = {}
    for tag, mk in (("split4", make_split), ("highest6", make_highest)):
        sec = device_time_per_call(mk, (K0, B0), k1=1, k2=5)
        gemm[tag] = {"ms": round(sec * 1e3, 2),
                     "tflops": round(flops / sec / 1e12, 1)}
    out["panel_gemm"] = gemm

    # ---- end-to-end build (warm compile via cache) ----
    t0 = time.perf_counter()
    Kd = _build_K_device(A, n_pad, np.float32)
    float(Kd[0, 0])
    out["build_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
