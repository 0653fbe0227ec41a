"""Pallas kernels in interpret mode (CPU) vs dense reference."""

import jax.numpy as jnp
import numpy as np

from krylov_crn_tpu.ops.pallas_kernels import matvec_pallas


def test_matvec_pallas_fp32():
    rng = np.random.default_rng(0)
    n, m = 1024, 4096
    K = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    got = np.asarray(matvec_pallas(K, w, bm=256, bk=1024, interpret=True))
    want = np.asarray(K) @ np.asarray(w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_matvec_pallas_bf16_input():
    rng = np.random.default_rng(1)
    n, m = 512, 2048
    K = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    got = np.asarray(matvec_pallas(K, w, bm=256, bk=1024, interpret=True))
    want = np.asarray(K, np.float32) @ np.asarray(w)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-1)
