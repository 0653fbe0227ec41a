"""Upper-triangle SYMV Pallas kernel (ops/symv.py) — CPU coverage via
the Pallas interpreter. The kernel's on-chip truth (1.46 ms vs 2.24 ms
XLA at n=20480, rel err 2.5e-7 vs the XLA matvec) is measured by
tools/measure_symv.py; this guards the triangular block-index logic and
the accumulate/flush structure against regressions without TPU access.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krylov_crn_tpu.ops.symv import _pick_block, _upper_blocks, symv


@pytest.mark.parametrize("nb", [1, 2, 5])
def test_symv_interpret_matches_matmul(nb):
    n = 256 * nb
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    K = np.asarray(jnp.asarray(B) @ jnp.asarray(B).T)  # exactly symmetric
    q = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(symv(jnp.asarray(K), jnp.asarray(q), block=256,
                        interpret=True), np.float64)
    want = K.astype(np.float64) @ q.astype(np.float64)
    rel = np.linalg.norm(y - want) / np.linalg.norm(want)
    assert rel < 1e-6, f"symv rel err {rel:.3g}"


def test_upper_blocks_cover_triangle():
    for nb in (1, 3, 7):
        ib, jb = _upper_blocks(nb)
        assert len(ib) == nb * (nb + 1) // 2
        assert np.all(jb >= ib)
        seen = set(zip(ib.tolist(), jb.tolist()))
        assert len(seen) == len(ib)  # no duplicate tiles
        for i in range(nb):
            for j in range(i, nb):
                assert (i, j) in seen


def test_pick_block_prefers_measured_order():
    assert _pick_block(20480) == 640
    assert _pick_block(512) == 512
    assert _pick_block(2560) == 640
    assert _pick_block(256) == 256
    assert _pick_block(100) == 0  # unsupported shape


def test_split_panel_accum_K_bitwise_symmetric():
    """The SYMV kernel's premise is that K is EXACTLY symmetric, so
    reading only the upper triangle loses nothing. The fp32 split-K
    accumulate is the one site where that could silently break:
    K + P + P.T parses as (K + P) + P.T, whose (i,j)/(j,i) sums
    associate differently and drift ~1 ulp per panel. _panel_accum must
    associate the symmetric pair first — this pins it bitwise over many
    panel accumulations (the production fp32 HIGHEST route)."""
    import jax
    import jax.numpy as jnp

    from krylov_crn_tpu.ops.gram import _panel_accum, _use_split

    rng = np.random.default_rng(7)
    n, cb = 256, 64
    K = jnp.zeros((n, n), jnp.float32)
    prec = jax.lax.Precision.HIGHEST
    assert _use_split(jnp.zeros((1, 1), jnp.float32), prec)
    for p in range(6):
        B = jnp.asarray(rng.standard_normal((n, cb)), jnp.float32)
        scale = None if p % 2 == 0 else jnp.float32(1.0)
        K = _panel_accum(K, B, prec, scale=scale)
    Kh = np.asarray(K)
    assert np.array_equal(Kh, Kh.T), "split-K accumulate broke symmetry"
