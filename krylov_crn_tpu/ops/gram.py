"""Gram-space (row-kernel) formulation — the TPU-native compute path.

Measured hardware truth (TPU v5e, no SparseCore): XLA arbitrary
gather/scatter runs at ~0.14 G elem/s (scalar rate), so nnz-wise sparse
kernels cannot beat host scipy. The fast engines are the MXU and dense HBM
streaming (~700 GB/s measured). This module therefore reformulates the
entire second-order solver to run on *dense n x n* linear algebra:

For logistic regression the loss, gradients, Hessians and every Krylov
vector generated from them live in the affine subspace

    x  =  gamma * x0  +  A^T zeta ,        zeta in R^n

(gradients are A^T(residual)/n + l2*x — see loss.py:223-232 — and H maps
the subspace to itself). Tracking the *representation* (gamma, zeta)
instead of x closes every operation over the n x n Gram matrix

    K = A A^T          (dense on device; text-corpus K is ~100% dense)

with these identities (b-margins Ax = gamma*Ax0 + K zeta):

    A v            = beta * Ax0 + K w                for v = beta*x0 + A^T w
    H v            = (l2*beta,  D(Av)/n + l2 w)      one K-matvec per HVP
    <v, v'>        = bb' |x0|^2 + b(Ax0.w') + b'(Ax0.w) + w.u' - b'(w.Ax0)
                     where u = A v is carried alongside (u' = Av') — zero
                     extra matvecs for any inner product
    ||x||^2        = g^2|x0|^2 + 2g Ax0.zeta + zeta.(Ax - g Ax0)

d (the feature dimension) appears only at build time (K, Ax0) and when an
explicit iterate is materialized (one transpose SpMV per checkpoint).
Per Krylov-CRN iteration: m+2 dense K-matvecs ~= (m+2) * n^2 * 4B of HBM
traffic — 2.3 ms each at n=20k fp32 — vs ~35 ms per *single* sparse HVP on
the gather path. Applicable when n fits a dense K (n <~ 45k per 8GB);
complements the dense-A path (small d) and the COO path (fallback).
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import os
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GramData", "build_gram", "Rep", "rep_dot", "gram_lanczos"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GramData:
    """Dense Gram-space problem data (rows padded to n_pad).

    ``K_lr`` is an optional bf16 copy of K: Lanczos subspace construction
    tolerates a ~1e-3-perturbed (still symmetric PSD) operator, halving
    the HBM traffic of the m matvecs per iteration; margins and gradients
    always use the fp32 K so loss values stay exact.
    """

    K: jax.Array  # (n_pad, n_pad) Gram matrix A A^T
    Ax0: jax.Array  # (n_pad,) margins of the base point x0
    b: jax.Array  # (n_pad,) labels in {0,1}, 0 on padding
    mask: jax.Array  # (n_pad,) 1 on real rows
    x0_sqnorm: jax.Array  # scalar |x0|^2
    K_lr: jax.Array | None  # optional low-precision K for Lanczos
    n: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.K.shape[0]

    @property
    def K_lanczos(self):
        return self.K if self.K_lr is None else self.K_lr


def _cache_key(A, x0) -> str:
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(A.indptr).tobytes())
    h.update(np.ascontiguousarray(A.indices[:4096]).tobytes())
    h.update(np.ascontiguousarray(A.data[:4096]).tobytes())
    h.update(np.asarray(x0).tobytes())
    h.update(str(A.shape).encode())
    return h.hexdigest()[:16]


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("prec",))
def _scan_build_K(K, B, R, C, V, F, prec):
    """The device program of _build_K_device: scan over uniform nnz
    chunks, scattering into the panel buffer B and GEMM-flushing into K
    at each end-of-panel flag. Module-level so jax.jit's cache (and the
    persistent compilation cache) key on shapes, not closure identity.

    The flush is *masked* (GEMM every chunk, accumulate/reset scaled by
    the flag) rather than a ``lax.cond``: the cond variant of this body
    compiled in 221 s on this stack vs 4.8 s for the masked one, and
    chunk sizing keeps the surplus GEMMs near zero (most panels are a
    single chunk)."""

    def body(carry, triple):
        K, B = carry
        r, c, v, f = triple
        B = B.at[r.astype(jnp.int32), c.astype(jnp.int32)].add(v)
        fK = f.astype(K.dtype)
        K = _panel_accum(K, B, prec, scale=fK)
        B = B * (1.0 - fK)
        return (K, B), ()

    (K, B), _ = jax.lax.scan(body, (K, B), (R, C, V, F))
    return K, B


def _syrk_split_P(B):
    """Asymmetric half-Gram P with B @ B^T == P + P^T, for fp32 B, via a
    3-way bf16 split and ONE stacked bf16 MXU pass of four
    contraction blocks (vs the SIX passes of ``precision=HIGHEST``).

    B = b1 + b2 + b3, each piece a bf16 truncation of the remainder
    (non-overlapping ~8-bit mantissa slices; the sum represents B to
    ~2^-26 elementwise). Expanding B B^T over pieces and grouping by
    magnitude: (1,1) ~ 1; (1,2)+(2,1) ~ 2^-9; (2,2),(1,3)+(3,1) ~ 2^-18;
    dropped (2,3),(3,3) ~ 2^-27 — below fp32 resolution. The symmetric
    sum folds into one asymmetric product:

        P = 0.5*b1 b1^T + 0.5*b2 b2^T + b1 b2^T + b1 b3^T
          = [b1/2 | b2/2 | b1 | b1] @ [b1 | b2 | b2 | b3]^T

    (halving is exact in bf16 — exponent shift), a SINGLE dot_general
    with 4-block contraction: four passes of MXU flops, ONE fp32 output
    materialization, no intermediate G/C buffers (a 4-separate-GEMM
    variant measured *slower* than HIGHEST — 78.7 vs 64.5 ms/panel —
    because each extra n_pad^2 fp32 intermediate costs ~2.5 ms of HBM).
    The caller accumulates K += P + P^T in the same fusion as its K
    accumulate. Accuracy is fp32-accumulation-bound, same class as
    HIGHEST (measured vs fp64: K-matvec rel err 1.7e-7 split vs 2.8e-7
    HIGHEST, tools/measure_splitk.py).

    The splits use ``lax.reduce_precision`` (bf16 = 8 exponent / 7
    mantissa bits) rather than ``astype`` round-trips: XLA's
    excess-precision pass (on by default) elides f32->bf16->f32 convert
    pairs, which silently zeroes the residuals and degrades the product
    to ONE bf16 pass (measured: elem rel err 3.8e-3 == the pure b1 b1^T
    error)."""
    f32 = jnp.float32
    b1f = jax.lax.reduce_precision(B, 8, 7)
    r1 = B - b1f  # exact (Sterbenz: b1f within half a bf16 ulp of B)
    b2f = jax.lax.reduce_precision(r1, 8, 7)
    r2 = r1 - b2f  # exact
    b1 = b1f.astype(jnp.bfloat16)  # exact: values are bf16-representable
    b2 = b2f.astype(jnp.bfloat16)
    b3 = r2.astype(jnp.bfloat16)

    X = jnp.concatenate([b1 * 0.5, b2 * 0.5, b1, b1], axis=1)
    Y = jnp.concatenate([b1, b2, b2, b3], axis=1)
    return jax.lax.dot_general(X, Y, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)


def _syrk_split(B):
    """B @ B^T for fp32 B at fp32-grade accuracy via the split-K stacked
    pass (see _syrk_split_P); standalone symmetric form."""
    P = _syrk_split_P(B)
    return P + P.T


def _use_split(B, prec):
    return B.dtype == jnp.float32 and prec in (jax.lax.Precision.HIGHEST,
                                               "highest")


def _panel_accum(K, B, prec, scale=None):
    """K += [scale *] B @ B^T at the requested precision; fp32 inputs at
    HIGHEST route through the split-K stacked pass (same accuracy class,
    4 MXU passes instead of 6 — see _syrk_split_P), with the P + P^T
    symmetrization fused directly into the K accumulate."""
    if _use_split(B, prec):
        P = _syrk_split_P(B)
        if scale is None:
            return K + P + P.T
        return K + scale * P + scale * P.T
    G = jax.lax.dot_general(B, B, (((1,), (1,)), ((), ())),
                            precision=prec)
    return K + (G if scale is None else scale * G)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("prec", "cb"))
def _scan_build_K_panels(K, R, C, V, prec, cb):
    """Two-level build scan: inner scatter-only scan over each panel's
    uniform nnz chunks, then ONE GEMM per panel.

    The round-2 single-level design GEMM'd (masked) at EVERY chunk, so a
    dataset whose panels split into ~3 chunks each paid ~3x the GEMM
    flops (news20-like: 67 chunk-GEMMs for 22 panels ~= 3.7 s of pure
    surplus MXU time). Here the GEMM count equals the panel count
    regardless of chunking. Chunks are padded to a uniform per-panel
    count (zero-valued entries scatter into row 0 / local col 0)."""

    def panel(K, arrs):
        r, c, v = arrs  # (inner, chunk_nnz) each

        def scat(B, triple):
            rr, cc, vv = triple
            return B.at[rr.astype(jnp.int32),
                        cc.astype(jnp.int32)].add(vv), ()

        B0 = jnp.zeros((K.shape[0], cb), K.dtype)
        B, _ = jax.lax.scan(scat, B0, (r, c, v))
        return _panel_accum(K, B, prec), ()

    K, _ = jax.lax.scan(panel, K, (R, C, V))
    return K


def _build_K_device(A, n_pad: int, dtype, col_block: int = 2048,
                    precision=None, chunk_nnz: int | None = None):
    """K = A A^T computed on-device as ONE XLA program.

    Column panels of width ``col_block`` are densified by scatter into a
    (n_pad x cb) buffer B and MXU-GEMM'd into K (K += B @ B^T); only
    ~10 B/nnz crosses the host link. Three hardware constraints shape the
    design (all measured, see PERF.md):

    * scatter *compile* time scales with the target array's cell count
      (a 1e9-cell scatter took ~7 min to compile), so the panel buffer is
      a fixed modest (n_pad x 2048) shape;
    * XLA compiles on this stack cost seconds and per-dispatch overhead
      through the relayed PJRT transport is large relative to the ~70 ms
      of per-panel device work (a per-panel dispatch loop measured 28 s
      against 1.7 s of device time for rcv1's 24 panels) — so the whole
      build is a single ``lax.scan`` compiled once per dataset (and
      persisted via the compilation cache);
    * a scan needs uniform shapes: the nnz stream is cut into fixed-size
      chunks (padded; sized to the mean panel nnz so padding waste stays
      bounded). In the panel layout (_scan_build_K_panels) each panel's
      chunks scatter in an inner scan and ONE GEMM flushes per panel; in
      the skew fallback (_scan_build_K) an end-of-panel flag gates a
      *masked* GEMM accumulate — NOT a ``lax.cond``, which compiled 46x
      slower on this stack (see _scan_build_K's docstring).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    Acsc = A.tocsc()
    n, _ = map(int, A.shape)
    # K = A A^T is invariant to dropping all-zero columns; compact them
    # away so the panel count (and the MXU GEMM work, which is
    # n_pad^2 * d_panels) scales with the number of *active* columns.
    # Text-corpus matrices keep most of d active (real rcv1: ~47k) — the
    # win is for matrices whose vocabulary underfills the feature space.
    counts = np.diff(Acsc.indptr)
    active = np.flatnonzero(counts)
    if len(active) < Acsc.shape[1]:
        Acsc = Acsc[:, active]
    d = int(Acsc.shape[1])
    cb = min(_round_up(max(d, 1), 512), col_block)
    nblk = -(-d // cb)

    panel_nnz = np.asarray(
        [int(Acsc.indptr[min((i + 1) * cb, d)] - Acsc.indptr[i * cb])
         for i in range(nblk)], np.int64)
    max_panel = int(panel_nnz.max()) if nblk else 1

    if chunk_nnz is None:
        chunk_nnz = 8192
        while chunk_nnz * 4 < max_panel and chunk_nnz < 262144:
            chunk_nnz *= 2
    inner = max(1, -(-max_panel // chunk_nnz))

    # one-GEMM-per-panel layout needs per-panel chunk padding to the
    # uniform `inner`; under heavy column skew (one panel with most of
    # the nnz) the padding waste explodes — fall back to the exact-size
    # masked-GEMM stream there (waste factor = padded/actual nnz)
    waste = nblk * inner * chunk_nnz / max(1, int(Acsc.nnz))
    K = jnp.zeros((n_pad, n_pad), dtype)
    # row indices ride the host->device link (~46 MB/s measured): uint16
    # when rows fit halves that stream (scatter casts to int32 on device)
    ridt = np.uint16 if n_pad <= 65535 else np.int32
    if waste <= 2.0:
        R = np.zeros((nblk, inner * chunk_nnz), ridt)
        C = np.zeros((nblk, inner * chunk_nnz), np.int16)
        V = np.zeros((nblk, inner * chunk_nnz), dtype)
        for i in range(nblk):
            c0, c1 = i * cb, min((i + 1) * cb, d)
            s, e = int(Acsc.indptr[c0]), int(Acsc.indptr[c1])
            k = e - s
            R[i, :k] = Acsc.indices[s:e]
            counts = np.diff(Acsc.indptr[c0:c1 + 1])
            C[i, :k] = np.repeat(np.arange(c1 - c0, dtype=np.int16),
                                 counts)
            V[i, :k] = Acsc.data[s:e].astype(dtype)
        shape3 = (nblk, inner, chunk_nnz)
        R, C, V = (R.reshape(shape3), C.reshape(shape3), V.reshape(shape3))
        # bound device work per dispatch (~256 scatter chunks / ~15 s):
        # longer single programs crash the TPU worker through the relay
        seg_p = max(1, 256 // inner)
        for s in range(0, nblk, seg_p):
            e = min(s + seg_p, nblk)
            K = _scan_build_K_panels(
                K, jnp.asarray(R[s:e]), jnp.asarray(C[s:e]),
                jnp.asarray(V[s:e]), prec=precision, cb=cb)
        return K

    # ---- masked-GEMM fallback (exact-size chunk stream) ----
    R_parts, C_parts, V_parts, flags = [], [], [], []
    for i in range(nblk):
        c0, c1 = i * cb, min((i + 1) * cb, d)
        s, e = int(Acsc.indptr[c0]), int(Acsc.indptr[c1])
        rows = Acsc.indices[s:e].astype(ridt)
        vals = Acsc.data[s:e].astype(dtype)
        counts = np.diff(Acsc.indptr[c0:c1 + 1])
        colpos = np.repeat(np.arange(c1 - c0, dtype=np.int16), counts)
        nnzp = len(rows)
        nch = max(1, -(-nnzp // chunk_nnz))
        pad = nch * chunk_nnz - nnzp
        # padding entries carry zero values into row 0 / local col 0
        R_parts.append(np.concatenate([rows, np.zeros(pad, ridt)]))
        C_parts.append(np.concatenate([colpos, np.zeros(pad, np.int16)]))
        V_parts.append(np.concatenate([vals, np.zeros(pad, dtype)]))
        f = np.zeros(nch, bool)
        f[-1] = True  # last chunk of the panel flushes B into K
        flags.append(f)

    R = np.concatenate(R_parts).reshape(-1, chunk_nnz)
    C = np.concatenate(C_parts).reshape(-1, chunk_nnz)
    V = np.concatenate(V_parts).reshape(-1, chunk_nnz)
    F = np.concatenate(flags)

    seg = 256
    nchunks = R.shape[0]
    pad_ch = (-nchunks) % seg if nchunks > seg else 0
    if pad_ch:
        R = np.concatenate([R, np.zeros((pad_ch, chunk_nnz), ridt)])
        C = np.concatenate([C, np.zeros((pad_ch, chunk_nnz), np.int16)])
        V = np.concatenate([V, np.zeros((pad_ch, chunk_nnz), dtype)])
        F = np.concatenate([F, np.zeros(pad_ch, bool)])
        nchunks += pad_ch

    B = jnp.zeros((n_pad, cb), dtype)
    for s in range(0, nchunks, seg):
        e = min(s + seg, nchunks)
        K, B = _scan_build_K(K, B, jnp.asarray(R[s:e]), jnp.asarray(C[s:e]),
                             jnp.asarray(V[s:e]), jnp.asarray(F[s:e]),
                             prec=precision)
    return K


@jax.jit
def _to_bf16(K):
    return K.astype(jnp.bfloat16)


@jax.jit
def _unpack3(aux):
    return aux[0], aux[1], aux[2]


def build_gram(A, b, x0, dtype=np.float32, cache_dir: str | None = None,
               low_res_lanczos: bool | None = None,
               device_build: bool | None = None,
               mesh=None) -> GramData:
    """Build GramData from a scipy CSR matrix.

    K = A A^T is iterate-independent. On accelerator backends it is built
    on-device (streamed column blocks + MXU GEMM, see _build_K_device); on
    CPU it uses scipy's sparse matmul with an optional disk cache.

    ``mesh``: optional 1-D device mesh — K is laid out row-sharded over
    the "data" axis (everything else replicated); under jit GSPMD then
    executes each K-matvec as a local (n/D x n) matvec + all-gather, so
    per-device HBM traffic scales 1/D. This is the multi-chip scaling
    path for the Gram solver.
    """
    import scipy.sparse as sp

    A = A.tocsr()
    n, d = map(int, A.shape)
    n_pad = _round_up(n, 256)
    x0 = np.asarray(x0, np.float64)

    if device_build is None:
        device_build = jax.default_backend() != "cpu"

    Kd = None
    if device_build:
        # K-build programs take seconds to compile on this stack; persist
        # them so repeat runs on the same dataset shape skip the compile
        from krylov_crn_tpu.config import enable_compilation_cache

        enable_compilation_cache()
        Kd = _build_K_device(A, n_pad, np.dtype(dtype))
    else:
        K = None
        cache_file = None
        if cache_dir is not None:
            Path(cache_dir).mkdir(parents=True, exist_ok=True)
            cache_file = Path(cache_dir) / f"gram_{_cache_key(A, x0)}.npy"
            if cache_file.exists():
                K = np.load(cache_file, mmap_mode=None)
        if K is None:
            K = np.asarray((A @ A.T).todense(), dtype)
            if cache_file is not None:
                np.save(cache_file, K)
        Kp = np.zeros((n_pad, n_pad), dtype)
        Kp[:n, :n] = K

    Ax0 = np.zeros(n_pad, dtype)
    Ax0[:n] = A @ x0
    bp = np.zeros(n_pad, dtype)
    bp[:n] = np.asarray(b, dtype)
    mask = np.zeros(n_pad, dtype)
    mask[:n] = 1

    if Kd is None:
        Kd = jnp.asarray(Kp)
    if low_res_lanczos is None:
        # bf16 Lanczos only pays off when fp32 Lanczos would be the
        # bottleneck (fp64 verification runs keep everything exact)
        low_res_lanczos = np.dtype(dtype) == np.float32
    # jitted (persistently cached) rather than eager .astype: the eager
    # op compiled per-session at ~1.5 s on this stack (measured) against
    # ~4 ms of actual HBM traffic
    K_lr = _to_bf16(Kd) if low_res_lanczos else None

    # ONE packed transfer for the three aux vectors (separate device_puts
    # cost ~150 ms each through the relayed transport, measured)
    aux = jnp.asarray(np.stack([Ax0, bp, mask]))
    Ax0_d, b_d, mask_d = _unpack3(aux)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from krylov_crn_tpu.parallel.mesh import DATA_AXIS

        row_shard = NamedSharding(mesh, P(DATA_AXIS, None))
        repl = NamedSharding(mesh, P())
        Kd = jax.device_put(Kd, row_shard)
        if K_lr is not None:
            K_lr = jax.device_put(K_lr, row_shard)
        Ax0_d = jax.device_put(Ax0_d, repl)
        b_d = jax.device_put(b_d, repl)
        mask_d = jax.device_put(mask_d, repl)

    return GramData(
        K=Kd, Ax0=Ax0_d, b=b_d,
        mask=mask_d,
        x0_sqnorm=jnp.asarray(float(x0 @ x0), dtype),
        K_lr=K_lr,
        n=n, d=d, nnz=int(A.nnz),
    )


class Rep(NamedTuple):
    """v = beta * x0 + A^T w, with the image u = A v carried along."""

    beta: jax.Array  # scalar
    w: jax.Array  # (n_pad,)
    u: jax.Array  # (n_pad,) == beta * Ax0 + K w (maintained by linearity)


def rep_dot(gd: GramData, a: Rep, bv: Rep, adt):
    """<a, b> in the d-space, closed over carried images (no matvec).

    <a,b> = ba*bb*|x0|^2 + ba Ax0.wb + bb Ax0.wa + wa.K wb, and
    wa.K wb = wa.(ub - bb Ax0), so the bb-terms cancel. Reductions use
    compensated (Dekker) dots when adt == storage dtype (fp32 runs).
    """
    from krylov_crn_tpu.ops.math import accum_dot

    Ax0 = gd.Ax0.astype(adt)
    wa, wb = a.w.astype(adt), bv.w.astype(adt)
    ba, bb = a.beta.astype(adt), bv.beta.astype(adt)
    return (ba * bb * gd.x0_sqnorm.astype(adt)
            + ba * accum_dot(Ax0, wb, adt)
            + accum_dot(wa, bv.u.astype(adt), adt))


def rep_scale(a: Rep, s) -> Rep:
    return Rep(a.beta * s, a.w * s, a.u * s)


def rep_sub(a: Rep, b: Rep) -> Rep:
    return Rep(a.beta - b.beta, a.w - b.w, a.u - b.u)


def rep_axpy(y: Rep, alpha, x: Rep) -> Rep:
    return Rep(y.beta + alpha * x.beta, y.w + alpha * x.w,
               y.u + alpha * x.u)


class GramLanczosResult(NamedTuple):
    alphas: jax.Array  # (m,)
    betas: jax.Array  # (m-1,)
    Vb: jax.Array  # (m,) x0-coefficients of the basis
    Vw: jax.Array  # (m, n_pad) zeta-components
    Vu: jax.Array  # (m, n_pad) images A v_j  (the AV matrix for free)
    k: jax.Array  # valid basis count


def gram_lanczos(gd: GramData, hop, g: Rep, m: int,
                 reorth_passes: int = 1, breakdown_tol: float = 1e-6,
                 accum_dtype=jnp.float32) -> GramLanczosResult:
    """Lanczos on rep-space vectors; mirrors ops/lanczos.py (same masking
    and breakdown semantics, reference cubic.py:77-111) with all inner
    products in closed Gram form. ``hop(v: Rep) -> Rep`` applies H with
    exactly one K-matvec."""
    cdt = g.w.dtype
    adt = jnp.dtype(accum_dtype)
    npad = g.w.shape[0]

    g_norm = jnp.sqrt(jnp.maximum(rep_dot(gd, g, g, adt), 0.0)).astype(cdt)
    # numerically-zero gradient (exact convergence): produce a zero basis
    # rather than 0/0 NaNs — downstream steps then tie and freeze the state
    v0 = rep_scale(g, 1.0 / jnp.where(g_norm > 0, g_norm, 1.0))

    Vb0 = jnp.zeros((m,), cdt).at[0].set(v0.beta)
    Vw0 = jnp.zeros((m, npad), cdt).at[0].set(v0.w)
    Vu0 = jnp.zeros((m, npad), cdt).at[0].set(v0.u)

    def stacked_dots(Vb, Vw, Vu, t: Rep):
        """c_j = <V_j, t> for all j (same cancellation as rep_dot)."""
        Ax0 = gd.Ax0.astype(adt)
        tw, tb = t.w.astype(adt), t.beta.astype(adt)
        Vw_, Vb_ = Vw.astype(adt), Vb.astype(adt)
        return (Vb_ * tb * gd.x0_sqnorm.astype(adt)
                + Vb_ * jnp.dot(Ax0, tw)
                + Vw_ @ t.u.astype(adt))

    def reorth(t: Rep, Vb, Vw, Vu) -> Rep:
        for _ in range(reorth_passes):
            c = stacked_dots(Vb, Vw, Vu, t).astype(cdt)
            t = Rep(t.beta - jnp.dot(c, Vb), t.w - c @ Vw, t.u - c @ Vu)
        return t

    def body(carry, j):
        Vb, Vw, Vu, v_prev, v, beta_prev, active, k = carry
        Hv = hop(v)
        t = rep_axpy(Hv, -beta_prev, v_prev)
        alpha = rep_dot(gd, v, t, adt).astype(cdt)
        alpha_j = jnp.where(active, alpha, jnp.zeros((), cdt))
        t = rep_axpy(t, -alpha, v)
        if reorth_passes > 0:
            t = reorth(t, Vb, Vw, Vu)
        beta = jnp.sqrt(jnp.maximum(rep_dot(gd, t, t, adt), 0.0)).astype(cdt)
        ok = jnp.abs(beta) >= jnp.asarray(breakdown_tol, cdt)
        proceed = jnp.logical_and(active, ok)
        beta_j = jnp.where(proceed, beta, jnp.zeros((), cdt))
        inv = 1.0 / jnp.where(ok, beta, 1.0)
        v_next = Rep(
            jnp.where(proceed, t.beta * inv, v.beta),
            jnp.where(proceed, t.w * inv, v.w),
            jnp.where(proceed, t.u * inv, v.u),
        )
        v_prev_n = Rep(
            jnp.where(proceed, v.beta, v_prev.beta),
            jnp.where(proceed, v.w, v_prev.w),
            jnp.where(proceed, v.u, v_prev.u),
        )
        Vb = jnp.where(proceed, Vb.at[j + 1].set(v_next.beta), Vb)
        Vw = jnp.where(proceed, Vw.at[j + 1].set(v_next.w), Vw)
        Vu = jnp.where(proceed, Vu.at[j + 1].set(v_next.u), Vu)
        k = jnp.where(proceed, j + 2, k)
        return ((Vb, Vw, Vu, v_prev_n, v_next, beta_j, proceed, k),
                (alpha_j, beta_j))

    zero = Rep(jnp.zeros((), cdt), jnp.zeros(npad, cdt), jnp.zeros(npad, cdt))
    init = (Vb0, Vw0, Vu0, zero, v0, jnp.zeros((), cdt), jnp.asarray(True),
            jnp.asarray(1, jnp.int32))
    (Vb, Vw, Vu, _, v_last, _, _, k), (alphas, betas) = jax.lax.scan(
        body, init, jnp.arange(m - 1, dtype=jnp.int32))

    Hv = hop(v_last)
    alpha_last = rep_dot(gd, v_last, Hv, adt).astype(cdt)
    alphas = jnp.concatenate([alphas, jnp.zeros((1,), cdt)])
    alphas = alphas.at[k - 1].set(alpha_last)

    return GramLanczosResult(alphas=alphas, betas=betas, Vb=Vb, Vw=Vw,
                             Vu=Vu, k=k)
