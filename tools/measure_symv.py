"""A/B: symmetric-triangle Pallas matvec (ops/symv.py) vs XLA full
matvec, on the real chip at the bench shape.

The op is HBM-bound; the SYMV kernel streams n(n+1)/2 elements instead
of n^2, so the speed-of-light ratio is ~2x. Protocol per PERF.md:
chained data-dependent iterations + scalar fetch, per-op time from the
difference of two chain lengths.

Usage: python tools/measure_symv.py [--n 20480] [--reps 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.config import enable_compilation_cache
    from krylov_crn_tpu.ops.symv import symv, symv_supported
    from krylov_crn_tpu.utils.profiling import device_time_per_call

    enable_compilation_cache()
    n = args.n
    out = {"n": n, "supported": symv_supported(n, jnp.float32)}
    key = jax.random.PRNGKey(0)
    B = jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)
    K = B @ B.T  # exactly symmetric (commutative fp add)
    del B
    w = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

    # correctness vs the XLA matvec (same fp32 class, different
    # summation order)
    y_ref = np.asarray(jnp.matmul(K, w, precision=jax.lax.Precision.HIGHEST),
                       np.float64)
    y_sym = np.asarray(symv(K, w), np.float64)
    rel = float(np.linalg.norm(y_sym - y_ref) / np.linalg.norm(y_ref))
    out["rel_err_vs_xla"] = rel

    def chained_xla(k):
        @jax.jit
        def f(K, w):
            def body(v, _):
                v = K @ v
                return v / jnp.linalg.norm(v), ()
            v, _ = jax.lax.scan(body, w, None, length=k)
            return v[0]
        return f

    def chained_symv(k):
        @jax.jit
        def f(K, w):
            def body(v, _):
                v = symv(K, v)
                return v / jnp.linalg.norm(v), ()
            v, _ = jax.lax.scan(body, w, None, length=k)
            return v[0]
        return f

    for name, mk in (("xla", chained_xla), ("symv", chained_symv)):
        ts = []
        for _ in range(args.reps):
            sec = device_time_per_call(mk, (K, w), k1=2, k2=18)
            ts.append(sec)
        med = float(np.median(ts))
        out[f"{name}_ms_median"] = round(med * 1e3, 3)
        out[f"{name}_ms_min"] = round(min(ts) * 1e3, 3)
        out[f"{name}_gbps_full_matrix"] = round(n * n * 4 / med / 1e9, 1)
    out["speedup"] = round(out["xla_ms_median"] / out["symv_ms_median"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
