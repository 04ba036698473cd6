"""Row-block sharded COO operator: the 1-D row-parallel SpMV layout.

The reference's only answer to graph scale is ``torch.sparse.mm`` on one device
(/root/reference/neural_dynamics.py:28-31, heat_dynamics.py:170-175). Here the
edge list is partitioned by destination row into equal-size per-device blocks and
A·X runs under ``shard_map`` over the mesh's 'model' axis:

- each device holds the edges of its contiguous row range (padded to the max
  block size with zero-valued self-edges, so shapes are static and equal),
- X arrives replicated (XLA all-gathers it over ICI when it lives row-sharded),
- the device computes a local segment-sum over its n/p rows,
- the row-sharded result concatenates along the 'model' axis with no collective.

The backward pass is a custom VJP over a SECOND row-block packing of Aᵀ (same
layout, Aᵀ's rows = A's columns): dX = Aᵀ·Ḡ runs as another sorted local
segment-sum + the row-shard concatenation — matching the single-device
``CooGraph.*_t`` design. Without it, shard_map's mechanical transpose is an
UNSORTED scatter-add over the columns + psum, the pattern that measured ~100x
slower on TPU at 2M edges (advisor r2 finding)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ndcn_tpu.graph.sparse import CooGraph


class RowShardedCoo(NamedTuple):
    """COO edges grouped into per-device row blocks (A and Aᵀ packings).

    ``local_rows`` are row indices relative to the owning block's first row, so
    each device's segment-sum is over its local row count only. The mesh, axis
    name and (padded) node counts are static aux data — they shape the program.
    """
    local_rows: jnp.ndarray  # (p, m) int32, row - block_start
    cols: jnp.ndarray        # (p, m) int32
    vals: jnp.ndarray        # (p, m) float
    local_rows_t: Optional[jnp.ndarray]  # (p, mt) row blocks of Aᵀ
    cols_t: Optional[jnp.ndarray]
    vals_t: Optional[jnp.ndarray]
    n: int                   # true node count
    n_pad: int               # node count padded to a multiple of p
    axis: str                # mesh axis the row blocks shard over
    mesh: Mesh

    @property
    def n_nodes(self) -> int:
        return self.n

    def _matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ X for X of shape (n, d); returns (n, d), rows sharded over axis."""
        if self.local_rows_t is not None:
            return _rs_coo_matvec(self, x)
        return _rs_apply(self, self.local_rows, self.cols, self.vals, x)


jax.tree_util.register_pytree_node(
    RowShardedCoo,
    lambda g: ((g.local_rows, g.cols, g.vals,
                g.local_rows_t, g.cols_t, g.vals_t),
               (g.n, g.n_pad, g.axis, g.mesh)),
    lambda aux, children: RowShardedCoo(*children, *aux),
)


def _rs_apply(op: RowShardedCoo, lr, cc, vv, x: jnp.ndarray) -> jnp.ndarray:
    """shard_map row-block SpMV over the given (p, m) triplet arrays."""
    p = lr.shape[0]
    rows_per = op.n_pad // p
    if op.n_pad != op.n:
        x = jnp.pad(x, ((0, op.n_pad - op.n), (0, 0)))

    def local_spmv(lr_, c_, v_, x_full):
        # lr_/c_/v_: (1, m) this device's edge block; x_full: (n_pad, d) replicated
        contrib = v_[0][:, None].astype(x_full.dtype) * jnp.take(
            x_full, c_[0], axis=0)
        return jax.ops.segment_sum(contrib, lr_[0], num_segments=rows_per,
                                   indices_are_sorted=True)

    y = jax.shard_map(
        local_spmv, mesh=op.mesh,
        in_specs=(P(op.axis, None), P(op.axis, None),
                  P(op.axis, None), P(None, None)),
        out_specs=P(op.axis, None),
    )(lr, cc, vv, x)
    return y[: op.n]


@jax.custom_vjp
def _rs_coo_matvec(op: RowShardedCoo, x: jnp.ndarray) -> jnp.ndarray:
    """Sharded A·X whose backward runs the Aᵀ row-block packing (sorted local
    segment-sums on every device). The operator is a CONSTANT: float
    cotangents are NaN-poisoned so learned-sparse-operator gradients fail
    loudly (same policy as graph.sparse._coo_matvec)."""
    return _rs_apply(op, op.local_rows, op.cols, op.vals, x)


def _rs_fwd(op, x):
    return _rs_apply(op, op.local_rows, op.cols, op.vals, x), op


def _rs_bwd(op, g):
    from ndcn_tpu.graph.sparse import _nan_cotangent

    dx = _rs_apply(op, op.local_rows_t, op.cols_t, op.vals_t, g)
    dop = RowShardedCoo(
        local_rows=_nan_cotangent(op.local_rows),
        cols=_nan_cotangent(op.cols), vals=_nan_cotangent(op.vals),
        local_rows_t=_nan_cotangent(op.local_rows_t),
        cols_t=_nan_cotangent(op.cols_t), vals_t=_nan_cotangent(op.vals_t),
        n=op.n, n_pad=op.n_pad, axis=op.axis, mesh=op.mesh)
    return dop, dx


_rs_coo_matvec.defvjp(_rs_fwd, _rs_bwd)


def _pack_row_blocks(rows, cols, vals, p: int, rows_per: int):
    """Group row-sorted triplets into p equal-size padded row blocks."""
    owner = rows // rows_per
    m = max(1, int(np.bincount(owner, minlength=p).max()))
    lr = np.zeros((p, m), np.int32)
    cc = np.zeros((p, m), np.int32)
    vv = np.zeros((p, m), vals.dtype)
    for b in range(p):
        sel = owner == b
        k = int(sel.sum())
        lr[b, :k] = rows[sel] - b * rows_per
        cc[b, :k] = cols[sel]
        vv[b, :k] = vals[sel]
        # keep local rows sorted within the padded tail too (pad rows are 0;
        # a sorted segment_sum only needs non-decreasing ids, and 0-padding at
        # the tail breaks that) — mark pads as the last local row instead
        lr[b, k:] = rows_per - 1
    return lr, cc, vv


def shard_coo_rows(coo: CooGraph, mesh: Mesh, axis: str = "model"
                   ) -> RowShardedCoo:
    """Host-side packer: split a (row-sorted) CooGraph into p equal row blocks.

    Rows pad up to a multiple of p; each block's edge list pads to the largest
    block with zero-valued (local_row, col=0) entries, which contribute 0. When
    the CooGraph carries transpose triplets (``*_t``), Aᵀ is packed the same
    way so the backward runs sorted on every device."""
    p = int(mesh.shape[axis])
    n = coo.n
    n_pad = -(-n // p) * p
    rows_per = n_pad // p
    lr, cc, vv = _pack_row_blocks(np.asarray(coo.rows), np.asarray(coo.cols),
                                  np.asarray(coo.vals), p, rows_per)
    sharding = jax.sharding.NamedSharding(mesh, P(axis, None))
    put = lambda a: jax.device_put(jnp.asarray(a), sharding)
    lr_t = cc_t = vv_t = None
    if coo.rows_t is not None:
        lr_t, cc_t, vv_t = _pack_row_blocks(
            np.asarray(coo.rows_t), np.asarray(coo.cols_t),
            np.asarray(coo.vals_t), p, rows_per)
        lr_t, cc_t, vv_t = put(lr_t), put(cc_t), put(vv_t)
    return RowShardedCoo(
        local_rows=put(lr), cols=put(cc), vals=put(vv),
        local_rows_t=lr_t, cols_t=cc_t, vals_t=vv_t,
        n=n, n_pad=n_pad, axis=axis, mesh=mesh)
