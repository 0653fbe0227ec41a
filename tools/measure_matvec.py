"""Measure K-matvec implementations on the real chip (VERDICT item 6).

Verdict recorded in PERF.md: on v5e the dense matvec is purely HBM-bound
and XLA's lowering already sits at the roofline — a hand-written Pallas
tile pipeline (kept below as the measurement subject) ties XLA within
run-to-run noise (interleaved A/B: XLA median 1.156 ms, Pallas 1.106 ms,
mins 0.864 vs 1.041 ms at n=20480 bf16; ±15% drift through the relayed
transport). The production solvers therefore use plain `K @ w` /
`dot_general`, and no Pallas kernel ships in the package.

Chained-difference timing per PERF.md methodology (data-dependent
iterations, scalar fetch). K is generated on device — the host link is
~10-70 MB/s and a 1.6 GB transfer would dominate wall clock.

Usage:  python tools/measure_matvec.py [n ...]
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from krylov_crn_tpu.config import enable_compilation_cache
from krylov_crn_tpu.utils.profiling import (
    device_time_per_call,
    roofline_fraction,
)

enable_compilation_cache()


def _matvec_kernel(k_ref, w_ref, o_ref):
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)  # grid: (row blocks, col blocks)

    @pl.when(jj == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    tile = k_ref[:].astype(jnp.float32)
    wv = w_ref[:].astype(jnp.float32)
    o_ref[:] = o_ref[:] + jnp.sum(tile * wv, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bm", "bk"))
def matvec_pallas(K, w, bm: int = 512, bk: int = 2048):
    """y = K @ w, fp32 accumulation, (bm x bk) VMEM tile pipeline."""
    import jax.experimental.pallas as pl

    n, m = K.shape
    assert n % bm == 0 and m % bk == 0, (n, m, bm, bk)
    out = pl.pallas_call(
        _matvec_kernel,
        grid=(n // bm, m // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j)),
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    )(K, w.reshape(1, m))
    return out.reshape(n).astype(w.dtype)


def chained(matvec, k):
    @jax.jit
    def run(K, w):
        def body(c, _):
            y = matvec(K, c.astype(w.dtype))
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

        out, _ = jax.lax.scan(body, w, None, length=k)
        return jnp.sum(out)

    return run


def xla_fp32(K, w):
    return K @ w


def xla_bf16(K, w):
    return jax.lax.dot_general(
        K, w.astype(K.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.float32)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [20480]
    for n in ns:
        key = jax.random.PRNGKey(0)
        K32 = jax.random.normal(key, (n, n), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
        K16 = K32.astype(jnp.bfloat16)

        rows = []
        for name, mv, K, bpe in [
            ("xla_fp32", xla_fp32, K32, 4),
            ("xla_bf16", xla_bf16, K16, 2),
            ("pallas_fp32", lambda K, w: matvec_pallas(K, w), K32, 4),
            ("pallas_bf16", lambda K, w: matvec_pallas(K, w), K16, 2),
        ]:
            try:
                dt = device_time_per_call(
                    lambda k, mv=mv: chained(mv, k), (K, w), k1=2, k2=18)
            except Exception as e:  # pallas may be unsupported
                print(f"n={n} {name}: FAILED {type(e).__name__}: {e}")
                continue
            gbs = n * n * bpe / dt / 1e9
            rf = roofline_fraction(n * n * bpe, dt)
            rows.append((name, dt, gbs, rf))
            print(f"n={n} {name:12s} {dt*1e3:8.3f} ms  {gbs:7.1f} GB/s "
                  f" roofline {rf:5.1%}")
        del K32, K16


if __name__ == "__main__":
    main()
