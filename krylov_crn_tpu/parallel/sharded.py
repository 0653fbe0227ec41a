"""Row-partitioned sparse data + shard_map sparse products.

The multi-device analogue of ``DualSparse`` (SURVEY.md §2.2, a net-new
subsystem with no reference counterpart — the reference is single-process
NumPy). Layout over a 1-D "data" mesh axis:

* rows of A are split into contiguous, **nnz-balanced** blocks (power-law
  row distributions make row-count balancing badly skewed — SURVEY.md hard
  part (d)); each block is padded to uniform (rows, nnz) so shards stack;
* each device holds its row block in row-sorted COO with *local* row ids,
  plus the block's transpose with *global* column ids;
* the dense iterate x is replicated; margins/labels/mask are row-sharded.

Communication pattern per fused HVP (the design in SURVEY.md §5
"long-context" analogue):

    A v        : local SpMV, no comms           (x, v replicated)
    w * Av     : local elementwise on the shard
    A^T (…)    : local transpose-SpMV -> psum of the d-vector over "data"

Loss/gradient reductions are the same psum; Lanczos vector algebra happens
on replicated d-vectors, so its inner products need no extra collectives.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from krylov_crn_tpu.parallel.mesh import DATA_AXIS

__all__ = ["ShardedDual", "partition_rows", "build_sharded_dual",
           "sharded_spmv", "sharded_rmatvec", "sharded_gather_columns"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDual:
    """Row-partitioned A (+ transpose) over a 1-D device mesh.

    Global array shapes (sharded on the leading dim via NamedSharding):
      a_vals/a_rows/a_cols   (D * nnz_l,)  — local row ids in a_rows
      at_vals/at_rows/at_cols(D * nnzt_l,) — global col ids in at_rows,
                                             local row ids in at_cols
      mask                   (D * n_l,)    — 1 for real rows, 0 for padding
    """

    a_vals: jax.Array
    a_rows: jax.Array
    a_cols: jax.Array
    at_vals: jax.Array
    at_rows: jax.Array
    at_cols: jax.Array
    mask: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))  # true rows
    d: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))

    # mirror DualSparse's interface bits used by shared code
    @property
    def dense(self):
        return None

    @property
    def shape(self):
        return (self.n, self.d)

    @property
    def n_padded(self) -> int:
        return self.n_shards * self.n_local


def partition_rows(indptr: np.ndarray, n_shards: int) -> list[tuple[int, int]]:
    """Contiguous nnz-balanced row ranges from a CSR indptr."""
    nnz = int(indptr[-1])
    targets = [round(nnz * (i + 1) / n_shards) for i in range(n_shards)]
    bounds = np.searchsorted(indptr, targets, side="left")
    bounds = np.clip(bounds, 0, len(indptr) - 1)
    ranges = []
    start = 0
    for i, b in enumerate(bounds):
        end = int(b) if i < n_shards - 1 else len(indptr) - 1
        end = max(end, start)  # allow empty shards in degenerate cases
        ranges.append((start, end))
        start = end
    return ranges


def build_sharded_dual(A, mesh: Mesh, dtype=np.float32,
                       pad_to: int = 1024) -> ShardedDual:
    """Partition a scipy CSR matrix over the mesh's data axis."""
    import scipy.sparse as sp

    A = A.tocsr()
    n, d = map(int, A.shape)
    D = mesh.devices.size
    ranges = partition_rows(A.indptr, D)
    n_l = _round_up(max(max(e - s for s, e in ranges), 1), 8)

    shards = []
    for s, e in ranges:
        blk = A[s:e]
        coo = blk.tocoo()
        order = np.argsort(coo.row, kind="stable")
        shards.append((coo.row[order].astype(np.int32),
                       coo.col[order].astype(np.int32),
                       coo.data[order].astype(dtype), e - s))

    nnz_l = _round_up(max(max(len(r) for r, _, _, _ in shards), 1), pad_to)

    def pad_coo(rows, cols, vals, n_rows, length, row_pad_id):
        k = length - len(rows)
        rows = np.concatenate([rows, np.full(k, row_pad_id, np.int32)])
        cols = np.concatenate([cols, np.zeros(k, np.int32)])
        vals = np.concatenate([vals, np.zeros(k, dtype)])
        return rows, cols, vals

    a_rows, a_cols, a_vals = [], [], []
    at_rows, at_cols, at_vals = [], [], []
    masks = []
    nnzt_l = 0
    t_shards = []
    for rows, cols, vals, rcount in shards:
        r, c, v = pad_coo(rows, cols, vals, rcount, nnz_l,
                          max(rcount - 1, 0))
        a_rows.append(r)
        a_cols.append(c)
        a_vals.append(v)
        # transpose of the local block: rows = global col ids (sorted),
        # cols = local row ids
        order = np.argsort(cols, kind="stable")
        t_shards.append((cols[order], rows[order], vals[order]))
        nnzt_l = max(nnzt_l, len(cols))
        m = np.zeros(n_l, dtype)
        m[:rcount] = 1
        masks.append(m)
    nnzt_l = _round_up(max(nnzt_l, 1), pad_to)
    for tr, tc, tv in t_shards:
        r, c, v = pad_coo(tr, tc, tv, d, nnzt_l, d - 1)
        at_rows.append(r)
        at_cols.append(c)
        at_vals.append(v)

    row_shard = NamedSharding(mesh, P(DATA_AXIS))

    def put(stack):
        return jax.device_put(np.concatenate(stack), row_shard)

    return ShardedDual(
        a_vals=put(a_vals), a_rows=put(a_rows), a_cols=put(a_cols),
        at_vals=put(at_vals), at_rows=put(at_rows), at_cols=put(at_cols),
        mask=put(masks),
        n=n, d=d, nnz=int(A.nnz), n_local=n_l, n_shards=D, mesh=mesh,
    )


def pad_rowvec(v: np.ndarray, sd: ShardedDual, ranges=None, dtype=None):
    """Pad+shard an n-vector (e.g. labels b) to the (D*n_l,) layout."""
    if dtype is None:
        dtype = sd.a_vals.dtype
    # reconstruct ranges from mask row counts
    mask = np.asarray(sd.mask).reshape(sd.n_shards, sd.n_local)
    out = np.zeros((sd.n_shards, sd.n_local), dtype)
    start = 0
    for i in range(sd.n_shards):
        cnt = int(mask[i].sum())
        out[i, :cnt] = v[start:start + cnt]
        start += cnt
    assert start == sd.n
    return jax.device_put(
        out.reshape(-1), NamedSharding(sd.mesh, P(DATA_AXIS))
    )


def sharded_spmv(sd: ShardedDual, x: jax.Array) -> jax.Array:
    """Ax: replicated x -> row-sharded margins (D*n_l,). No collectives."""
    def local(vals, rows, cols, x):
        prod = vals * jnp.take(x, cols, axis=0)
        return jax.ops.segment_sum(prod, rows, num_segments=sd.n_local,
                                   indices_are_sorted=True)

    return shard_map(
        local, mesh=sd.mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )(sd.a_vals, sd.a_rows, sd.a_cols, x)


def sharded_row_sqnorms(sd: ShardedDual) -> jax.Array:
    """Per-row squared norms, row-sharded (padding rows report 0... plus
    any zero-padding contributions, which are 0)."""
    def local(vals, rows):
        return jax.ops.segment_sum(vals * vals, rows,
                                   num_segments=sd.n_local,
                                   indices_are_sorted=True)

    return shard_map(
        local, mesh=sd.mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )(sd.a_vals, sd.a_rows)


def sharded_gather_columns(sd: ShardedDual, I: jax.Array) -> jax.Array:
    """Row-sharded dense column panel B = A[:, I], shape (D*n_l, m).

    The sharded analogue of ops/coords.gather_columns_dense (reference
    ``A[:, I]`` CSC slicing, loss.py:234-264) and the enabler of sharded
    SSCN (round-4 verdict item 6): each shard owns its rows' slice of
    every column, stored in the local transpose with *sorted global
    column ids* (build_sharded_dual sorts at_rows) — so membership of
    each nnz in the sampled set I is one searchsorted against sorted(I)
    and the local panel assembles with a single scatter-add. No
    inter-shard communication: the panel comes out row-sharded, and the
    SSCN partials reduce it with psums downstream (H_I = psum of local
    B^T W B)."""
    m = int(I.shape[0])
    order = jnp.argsort(I)
    I_sorted = jnp.take(I, order)

    def local(at_vals, at_rows, at_cols, I_sorted, order):
        pos = jnp.clip(jnp.searchsorted(I_sorted, at_rows), 0, m - 1)
        match = I_sorted[pos] == at_rows
        slot = jnp.where(match, jnp.take(order, pos), 0)
        B = jnp.zeros((sd.n_local, m), at_vals.dtype)
        # padding entries carry zero values (build_sharded_dual), so a
        # spurious match on the pad column id contributes nothing
        return B.at[at_cols, slot].add(
            jnp.where(match, at_vals, jnp.zeros((), at_vals.dtype)))

    return shard_map(
        local, mesh=sd.mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=P(DATA_AXIS, None),
    )(sd.at_vals, sd.at_rows, sd.at_cols, I_sorted, order)


def sharded_rmatvec(sd: ShardedDual, z: jax.Array) -> jax.Array:
    """A^T z: row-sharded z -> replicated d-vector via one psum."""
    def local(vals, rows, cols, z):
        prod = vals * jnp.take(z, cols, axis=0)
        out = jax.ops.segment_sum(prod, rows, num_segments=sd.d,
                                  indices_are_sorted=True)
        return jax.lax.psum(out, DATA_AXIS)

    return shard_map(
        local, mesh=sd.mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )(sd.at_vals, sd.at_rows, sd.at_cols, z)
