"""Pallas TPU kernels for the hot dense ops.

The Gram path's cost is ~(m+2) dense K-matvecs per iteration; XLA's
matvec reaches ~86% of HBM roofline on v5e. This kernel streams K through
VMEM in (BM x BK) tiles with the standard Pallas grid pipeline (double
buffering is automatic from the BlockSpec index maps) and accumulates the
row-block partials on the VPU — the matvec is bandwidth-bound, so the MXU
is irrelevant and an elementwise-multiply + row-reduce is the cheapest
compute per byte.

Falls back to `K @ w` anywhere Pallas is unavailable; `gram_matvec`
auto-selects. Correctness is tested in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["matvec_pallas", "gram_matvec"]


def _matvec_kernel(k_ref, w_ref, o_ref):
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)  # grid: (row blocks, col blocks)

    @pl.when(jj == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # (BM, BK) * (1, BK) -> row-sum on the VPU, accumulated across j
    tile = k_ref[:].astype(jnp.float32)
    wv = w_ref[:].astype(jnp.float32)
    o_ref[:] = o_ref[:] + jnp.sum(
        tile * wv, axis=1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("bm", "bk", "interpret"))
def matvec_pallas(K: jax.Array, w: jax.Array, bm: int = 512,
                  bk: int = 2048, interpret: bool = False) -> jax.Array:
    """y = K @ w with fp32 accumulation; K may be fp32 or bf16."""
    import jax.experimental.pallas as pl

    n, m = K.shape
    assert n % bm == 0 and m % bk == 0, (n, m, bm, bk)
    w2 = w.reshape(1, m)
    out = pl.pallas_call(
        _matvec_kernel,
        grid=(n // bm, m // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j)),
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(K, w2)
    return out.reshape(n).astype(w.dtype)


def gram_matvec(K: jax.Array, w: jax.Array, use_pallas: bool = False):
    """K-matvec dispatcher; `use_pallas` is opt-in (enable only where the
    kernel measures faster than XLA's lowering)."""
    if use_pallas:
        try:
            return matvec_pallas(K, w)
        except Exception:
            pass
    if K.dtype != w.dtype:
        return jax.lax.dot_general(
            K, w.astype(K.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(w.dtype)
    return K @ w
