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


def pad_rows(n: int) -> int:
    """Row padding of the dense K. On TPU, fp32 Gram matvecs run the
    upper-triangle SYMV Pallas kernel (ops/symv.py — ~1.5x the XLA full
    matvec, measured), whose block sizes (640/512) must divide n_pad:
    pad to 2560 = lcm. The waste is bounded by 2559 rows (~2.4% at the
    bench shapes, and K cost is ~(1 + 2 * pad/n) quadratic — still far
    below the triangle saving). CPU/verification builds keep the tight
    256 alignment."""
    gran = 2560 if jax.default_backend() == "tpu" else 256
    return _round_up(n, gran)


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
    # static: fp32 K-matvecs route through the upper-triangle SYMV
    # Pallas kernel (ops/symv.py, single-device TPU only — ~1.5x the XLA
    # full matvec; K is exactly symmetric by construction)
    symv: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))

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
        # associate the symmetric pair FIRST: (P + P.T) is bitwise
        # symmetric (fp add commutes), so K + (P + P.T) preserves exact
        # symmetry elementwise — K + P + P.T parses as (K + P) + P.T,
        # whose (i,j)/(j,i) sums associate differently and drift ~1 ulp
        # per panel, breaking the SYMV kernel's exactness premise
        # (ops/symv.py reads only the upper triangle)
        if scale is None:
            return K + (P + P.T)
        return K + (scale * P + scale * P.T)
    G = jax.lax.dot_general(B, B, (((1,), (1,)), ((), ())),
                            precision=prec)
    return K + (G if scale is None else scale * G)


def _panels_scan(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap):
    """Panel scan over the EXACT flat nnz stream with device-side
    padding: each panel dynamic-slices a ``cap``-sized window at its
    start offset, masks the tail beyond its length, scatters into the
    (n_pad x cb) buffer B and GEMM-accumulates into K.

    The round-3 layout padded every panel to a uniform capacity ON THE
    HOST, shipping the zeros over the ~46 MB/s link (rcv1-like: 21 MB
    padded vs 13 MB exact, measured +0.3 s; skewed panel sizes made it
    worse). Here only the exact nnz stream (+ the last window's tail
    padding) crosses the link; the masking costs ~cap VPU ops per panel
    on device. GEMM count equals panel count (the round-2 single-level
    design GEMM'd at every chunk — ~3x surplus MXU time on news20-like).

    ``CE`` (round 5): per-active-column END offsets into the flat
    stream, padded to nblk*cb with nnz — the within-panel column
    position of each nnz is RECONSTRUCTED on device instead of shipped
    (the int16-per-nnz column stream was 2 B/nnz ~ 18 MB for news20
    over the ~35 MB/s link): inside a window starting at s, entry p
    belongs to local column #{ends <= p}, computed as one scatter of
    the panel's cb ends + an inclusive cumsum over the window. Column
    ends of a panel's own columns are > s (every compacted column is
    non-empty), the trailing pad ends land at >= ln where ``valid``
    masks them out, so the reconstruction is exact."""
    npad = K.shape[0]
    iota = jax.lax.iota(jnp.int32, cap)

    def panel(K, sl):
        s, ln, i = sl
        r = jax.lax.dynamic_slice(Rf, (s,), (cap,)).astype(jnp.int32)
        v = jax.lax.dynamic_slice(Vf, (s,), (cap,))
        ce = jax.lax.dynamic_slice(CE, (i * cb,), (cb,))
        ind = jnp.zeros(cap + 1, jnp.int32)
        ind = ind.at[jnp.clip(ce - s, 0, cap)].add(1)
        c = jnp.cumsum(ind[:cap])  # inclusive: #ends <= p
        valid = iota < ln
        B = jnp.zeros((npad, cb), K.dtype)
        B = B.at[jnp.where(valid, r, 0), jnp.where(valid, c, 0)].add(
            jnp.where(valid, v, jnp.zeros((), K.dtype)))
        return _panel_accum(K, B, prec), ()

    K, _ = jax.lax.scan(panel, K, (starts, lens, pidx))
    return K


@functools.partial(jax.jit, static_argnames=("prec", "cb", "cap", "npad"))
def _scan_build_K_seg0(Rf, CE, Vf, starts, lens, pidx, prec, cb, cap, npad):
    """First build segment: creates K = 0 in-program (an eager
    jnp.zeros((npad, npad)) costs its own per-process executable load,
    ~0.4 s through the relay — measured) and scans its panels."""
    K = jnp.zeros((npad, npad), Vf.dtype)
    return _panels_scan(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("prec", "cb", "cap"))
def _scan_build_K_seg(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap):
    """Continuation segment of the panel scan (device work per dispatch
    is bounded — minutes-long single programs crash the TPU worker
    through the relay, see PERF.md)."""
    return _panels_scan(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap)


def _finalize_state_flat(K, aux, ibuf, vdt, lr):
    """Shared tail of the fused build programs: bf16 Lanczos copy, aux
    unpack, and the initial solver-state arrays (see
    solvers/krylov_gram._init_state_packed for the semantics — this is
    the same construction, fused into the build program so the timed
    setup dispatches ONE executable instead of three)."""
    cdt = K.dtype
    npad = K.shape[0]
    K_lr = K.astype(jnp.bfloat16) if lr else None
    Ax0, bb, mask = aux[0], aux[1], aux[2]
    x0sq = aux[3, 0]
    Ax_lo = ibuf[:npad]
    w0 = ibuf[npad:2 * npad]
    uK0 = ibuf[2 * npad:3 * npad]
    s = ibuf[3 * npad:3 * npad + 3]
    if jnp.dtype(vdt) == cdt:
        value, value_lo = s[0], s[1]
    else:
        value = s[0].astype(vdt) + s[1].astype(vdt)
        value_lo = jnp.zeros((), vdt)
    zero = jnp.zeros((), cdt)
    state_flat = (jnp.ones((), cdt), jnp.zeros(npad, cdt), Ax0, Ax_lo,
                  w0, uK0, value, value_lo, s[2],
                  jnp.asarray(0.1, cdt), jnp.zeros((), jnp.int32),
                  zero + jnp.inf, zero + jnp.inf, value, value_lo)
    return K, K_lr, Ax0, bb, mask, x0sq, state_flat


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("prec", "cb", "cap", "vdt", "lr"))
def _scan_build_K_fin(K, Rf, CE, Vf, starts, lens, pidx, aux, ibuf,
                      prec, cb, cap, vdt, lr):
    """Final build segment fused with the post-build finalize + initial
    solver state (each separate jitted program costs a ~0.4 s
    per-process executable load through the relayed transport)."""
    K = _panels_scan(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap)
    return _finalize_state_flat(K, aux, ibuf, vdt, lr)


@functools.partial(jax.jit,
                   static_argnames=("prec", "cb", "cap", "npad", "vdt",
                                    "lr"))
def _scan_build_K_full(Rf, CE, Vf, starts, lens, pidx, aux, ibuf,
                       prec, cb, cap, npad, vdt, lr):
    """Whole build + finalize + initial state as ONE device program (the
    single-segment case — rcv1-sized datasets): K creation, panel scan,
    bf16 copy, aux unpack and state construction dispatch one
    executable."""
    K = jnp.zeros((npad, npad), Vf.dtype)
    K = _panels_scan(K, Rf, CE, Vf, starts, lens, pidx, prec, cb, cap)
    return _finalize_state_flat(K, aux, ibuf, vdt, lr)


def _pack_flat_panels(A, n_pad, dtype, col_block=2048):
    """Host-side packing for the device-padded panel scan: compact empty
    columns, cut into ``col_block``-wide panels, and emit the EXACT flat
    (rows, vals) streams + per-active-column end offsets CE (the
    within-panel column positions are reconstructed on device from CE —
    see _panels_scan) plus per-panel (start, len).

    Returns None under heavy column skew (one panel holding most of the
    nnz would make every panel's cap-sized window re-stream ~nnz
    elements — quadratic device work); callers fall back to the
    masked-GEMM chunk stream."""
    Acsc = A.tocsc()
    counts = np.diff(Acsc.indptr)
    active = np.flatnonzero(counts)
    if len(active) < Acsc.shape[1]:
        Acsc = Acsc[:, active]
    d = int(Acsc.shape[1])
    cb = min(_round_up(max(d, 1), 512), col_block)
    nblk = -(-d // cb)
    starts = Acsc.indptr[np.arange(nblk) * cb].astype(np.int32)
    ends = Acsc.indptr[np.minimum(np.arange(1, nblk + 1) * cb, d)]
    lens = (ends - starts).astype(np.int32)
    cap = _round_up(int(lens.max()) if nblk else 1, 8192)
    if nblk * cap > 4 * max(1, int(Acsc.nnz)):
        return None  # heavy skew: masked fallback
    ridt = np.uint16 if n_pad <= 65535 else np.int32
    nnz = int(Acsc.nnz)
    # stream length: every cap-sized window must fit, i.e. up to
    # starts[-1] + cap — NOT nnz + cap (a full extra cap of zeros was
    # ~25% of the rcv1-like stream over the ~30 MB/s relay link)
    L = int(starts[-1]) + cap if nblk else cap
    Rf = np.zeros(L, ridt)
    Rf[:nnz] = Acsc.indices
    # per-active-column END offsets, padded to nblk*cb with nnz: the
    # within-panel column position of each nnz is reconstructed on
    # device from these (see _panels_scan) — 4 B per ACTIVE COLUMN
    # instead of the 2 B per NNZ the round-4 layout shipped (news20:
    # ~1 MB vs 18 MB over the relay link)
    CE = np.full(nblk * cb, nnz, np.int32)
    CE[:d] = Acsc.indptr[1:d + 1]
    Vf = np.zeros(L, dtype)
    Vf[:nnz] = Acsc.data.astype(dtype)
    return Rf, CE, Vf, starts, lens, cb, cap, nblk


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
    n, _ = map(int, A.shape)
    # K = A A^T is invariant to dropping all-zero columns; _pack_flat_
    # panels compacts them away so the panel count (and the MXU GEMM
    # work, n_pad^2 * d_panels) scales with the *active* columns.
    packed = _pack_flat_panels(A, n_pad, dtype, col_block)
    if packed is not None:
        Rf, CE, Vf, starts, lens, cb, cap, nblk = packed
        Rd, Cd, Vd = jnp.asarray(Rf), jnp.asarray(CE), jnp.asarray(Vf)
        pidx = np.arange(nblk, dtype=np.int32)
        # bound device work per dispatch (~65 ms GEMM + cap scatter per
        # panel): minutes-long single programs crash the TPU worker
        # through the relay
        seg_p = 64
        K = None
        for s in range(0, nblk, seg_p):
            e = min(s + seg_p, nblk)
            st = jnp.asarray(starts[s:e])
            ln = jnp.asarray(lens[s:e])
            pi = jnp.asarray(pidx[s:e])
            if K is None:
                K = _scan_build_K_seg0(Rd, Cd, Vd, st, ln, pi,
                                       prec=precision, cb=cb, cap=cap,
                                       npad=n_pad)
            else:
                K = _scan_build_K_seg(K, Rd, Cd, Vd, st, ln, pi,
                                      prec=precision, cb=cb, cap=cap)
        return K

    # ---- masked-GEMM fallback (exact-size chunk stream) ----
    Acsc = A.tocsc()
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
    K = jnp.zeros((n_pad, n_pad), dtype)
    ridt = np.uint16 if n_pad <= 65535 else np.int32
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


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("vdt", "lr"))
def _finalize_init(K, aux, ibuf, vdt, lr):
    """Standalone finalize + initial-state program (the fused build's
    tail) for paths where the K build used the masked fallback."""
    return _finalize_state_flat(K, aux, ibuf, vdt, lr)


def _dispatch_fused_build(packed, aux, ibuf_d, n_pad, vdt, lr, seg_p,
                          dev):
    """The fused build's dispatch plan — the EXACT sequence of jitted
    programs (including static kwargs) build_gram_fused runs,
    parameterized by the array source ``dev`` so warm_build_gram_fused
    executes byte-identical jit cache entries over device-created
    zeros. This is the single point of truth: a warm-up that diverges
    structurally from the real build warms the WRONG cache entries and
    silently re-pays ~0.4 s/program executable loads inside the timed
    region (the failure mode documented on warm_fused,
    solvers/krylov_gram.py)."""
    precision = jax.lax.Precision.HIGHEST
    Rf, CE, Vf, starts, lens, cb, cap, nblk = packed
    Rd, Cd, Vd = dev(Rf), dev(CE), dev(Vf)
    pidx = np.arange(nblk, dtype=np.int32)
    bounds = list(range(0, nblk, seg_p))
    if len(bounds) == 1:
        return _scan_build_K_full(
            Rd, Cd, Vd, dev(starts), dev(lens), dev(pidx),
            aux, ibuf_d, prec=precision, cb=cb, cap=cap, npad=n_pad,
            vdt=vdt, lr=lr)
    K = None
    for s in bounds[:-1]:
        e = s + seg_p
        st, ln, pi = dev(starts[s:e]), dev(lens[s:e]), dev(pidx[s:e])
        if K is None:
            K = _scan_build_K_seg0(Rd, Cd, Vd, st, ln, pi,
                                   prec=precision, cb=cb, cap=cap,
                                   npad=n_pad)
        else:
            K = _scan_build_K_seg(K, Rd, Cd, Vd, st, ln, pi,
                                  prec=precision, cb=cb, cap=cap)
    s = bounds[-1]
    return _scan_build_K_fin(
        K, Rd, Cd, Vd, dev(starts[s:]), dev(lens[s:]), dev(pidx[s:]),
        aux, ibuf_d, prec=precision, cb=cb, cap=cap, vdt=vdt, lr=lr)


def build_gram_fused(A, b, x0, ibuf, dtype, vdt,
                     low_res_lanczos: bool | None = None,
                     seg_p: int = 64):
    """Device Gram build + finalize + initial solver state with the
    MINIMUM number of device programs (one, for single-segment builds):
    the per-process executable load of each distinct jitted program
    costs ~0.4 s through the relayed transport, which dominated the
    round-3 setup (measured: K-zeros 0.45 s + bf16 copy 0.43 s + aux
    unpack + state init 0.45 s of pure program-load overhead).

    ``ibuf`` is the packed initial-state buffer [Ax_lo; w_g; uK; value
    pair, reg] of length 3*n_pad+3 (see solvers/krylov_gram.init_state,
    which computes it from three exact host fp64 SpMVs). Returns
    (GramData, state_flat) with state_flat the 15-tuple of initial
    GramKrylovState fields in declaration order."""
    A = A.tocsr()
    n, d = map(int, A.shape)
    n_pad = pad_rows(n)
    x0 = np.asarray(x0, np.float64)
    if low_res_lanczos is None:
        low_res_lanczos = np.dtype(dtype) == np.float32
    from krylov_crn_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    Ax0 = np.zeros(n_pad, dtype)
    Ax0[:n] = A @ x0
    bp = np.zeros(n_pad, dtype)
    bp[:n] = np.asarray(b, dtype)
    mask = np.zeros(n_pad, dtype)
    mask[:n] = 1
    x0row = np.zeros(n_pad, dtype)
    x0row[0] = np.dtype(dtype).type(x0 @ x0)
    aux = jnp.asarray(np.stack([Ax0, bp, mask, x0row]))
    ibuf_d = jnp.asarray(ibuf)

    packed = _pack_flat_panels(A, n_pad, np.dtype(dtype))
    if packed is not None:
        out = _dispatch_fused_build(packed, aux, ibuf_d, n_pad,
                                    jnp.dtype(vdt), low_res_lanczos,
                                    seg_p, jnp.asarray)
    else:
        K = _build_K_device(A, n_pad, np.dtype(dtype))
        out = _finalize_init(K, aux, ibuf_d, vdt=jnp.dtype(vdt),
                             lr=low_res_lanczos)
    K, K_lr, Ax0_d, b_d, mask_d, x0sq, state_flat = out
    from krylov_crn_tpu.ops.symv import symv_supported

    gd = GramData(
        K=K, Ax0=Ax0_d, b=b_d, mask=mask_d, x0_sqnorm=x0sq,
        K_lr=K_lr, n=n, d=d, nnz=int(A.nnz),
        symv=symv_supported(n_pad, dtype))
    return gd, state_flat


def warm_build_gram_fused(A, dtype, vdt, low_res_lanczos: bool = False,
                          seg_p: int = 64):
    """Execute-once warm-up of every device program a subsequent
    build_gram_fused(A, ...) will dispatch — the same role warm_fused
    plays for the race programs (solvers/krylov_gram.py): the
    per-process executable load of each distinct program costs ~0.4 s
    through the relayed transport even with a warm persistent
    compilation cache, which is session overhead of the transport (like
    the ~12 s PJRT client init), not part of any build's cost.

    The warm dispatch runs the REAL executables (byte-identical static
    args: the pack shapes of this A) over device-created zero arrays —
    jnp.zeros materializes on device, so the warm-up ships no nnz bytes
    across the ~46 MB/s host link; the timed build then pays only its
    real data transfer + device execution. Returns True if the panel
    path was warmed (False = masked fallback, which has its own
    per-dataset programs and no cheap warm path)."""
    A = A.tocsr()
    n, _ = map(int, A.shape)
    n_pad = pad_rows(n)
    from krylov_crn_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    packed = _pack_flat_panels(A, n_pad, np.dtype(dtype))
    if packed is None:
        return False
    aux = jnp.zeros((4, n_pad), np.dtype(dtype))
    ibuf = jnp.zeros(3 * n_pad + 3, np.dtype(dtype))
    out = _dispatch_fused_build(
        packed, aux, ibuf, n_pad, jnp.dtype(vdt), low_res_lanczos,
        seg_p, dev=lambda a: jnp.zeros(a.shape, a.dtype))
    # force completion (block_until_ready through the relay can return
    # early — PERF.md): fetch one scalar data-dependent on the build
    float(out[0][0, 0])
    return True


@jax.jit
def _to_bf16(K):
    return K.astype(jnp.bfloat16)


@jax.jit
def _unpack3(aux):
    return aux[0], aux[1], aux[2]


@jax.jit
def _finalize_gram(K, aux):
    """One program for the post-build steps: bf16 Lanczos copy + aux
    unpack. Each separate jitted call costs a per-process executable
    load (~0.4 s through the relayed transport) on top of its ~ms of
    device work — consolidation keeps the timed build lean."""
    return K.astype(jnp.bfloat16), aux[0], aux[1], aux[2]


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
    n_pad = pad_rows(n)
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
    # ONE packed transfer for the three aux vectors (separate device_puts
    # cost ~150 ms each through the relayed transport, measured) and ONE
    # jitted finalize program (bf16 copy + unpack; the eager .astype
    # compiled per-session at ~1.5 s against ~4 ms of HBM work)
    aux = jnp.asarray(np.stack([Ax0, bp, mask]))
    if low_res_lanczos:
        K_lr, Ax0_d, b_d, mask_d = _finalize_gram(Kd, aux)
    else:
        K_lr = None
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

    from krylov_crn_tpu.ops.symv import symv_supported

    return GramData(
        K=Kd, Ax0=Ax0_d, b=b_d,
        mask=mask_d,
        x0_sqnorm=jnp.asarray(float(x0 @ x0), dtype),
        K_lr=K_lr,
        n=n, d=d, nnz=int(A.nnz),
        # the SYMV kernel is single-device only (a Pallas call under a
        # GSPMD-sharded K would break the row-sharded lowering)
        symv=mesh is None and symv_supported(n_pad, dtype),
    )


def k_matvec(gd: "GramData", Kmat, q):
    """K @ q through the fastest available path: when the GramData was
    built symv-capable (single-device TPU, fp32, n_pad divisible by the
    kernel block), fp32 matvecs stream only the upper triangle via the
    Pallas SYMV kernel (~1.5x measured, tools/measure_symv.py); all
    other cases use the XLA matvec. Same fp32 accuracy class either way
    (summation order differs only)."""
    if gd.symv and Kmat.dtype == jnp.float32:
        from krylov_crn_tpu.ops.symv import symv

        return symv(Kmat, q)
    return Kmat @ q


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
