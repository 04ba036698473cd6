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

The backward pass is the transpose: the cotangent of the replicated X is a
psum over 'model' of the local scatter-adds — shard_map derives it mechanically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ndcn_tpu.graph.sparse import CooGraph


class RowShardedCoo(NamedTuple):
    """COO edges grouped into per-device row blocks.

    ``local_rows`` are row indices relative to the owning block's first row, so
    each device's segment-sum is over its local row count only. The mesh, axis
    name and (padded) node counts are static aux data — they shape the program.
    """
    local_rows: jnp.ndarray  # (p, m) int32, row - block_start
    cols: jnp.ndarray        # (p, m) int32
    vals: jnp.ndarray        # (p, m) float
    n: int                   # true node count
    n_pad: int               # node count padded to a multiple of p
    axis: str                # mesh axis the row blocks shard over
    mesh: Mesh

    @property
    def n_nodes(self) -> int:
        return self.n

    def _matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ X for X of shape (n, d); returns (n, d), rows sharded over axis."""
        p = self.local_rows.shape[0]
        rows_per = self.n_pad // p
        if self.n_pad != self.n:
            x = jnp.pad(x, ((0, self.n_pad - self.n), (0, 0)))

        def local_spmv(lr, c, v, x_full):
            # lr/c/v: (1, m) this device's edge block; x_full: (n_pad, d) replicated
            contrib = v[0][:, None].astype(x_full.dtype) * jnp.take(
                x_full, c[0], axis=0)
            return jax.ops.segment_sum(contrib, lr[0], num_segments=rows_per,
                                       indices_are_sorted=True)

        y = jax.shard_map(
            local_spmv, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None),
                      P(self.axis, None), P(None, None)),
            out_specs=P(self.axis, None),
        )(self.local_rows, self.cols, self.vals, x)
        return y[: self.n]


jax.tree_util.register_pytree_node(
    RowShardedCoo,
    lambda g: ((g.local_rows, g.cols, g.vals),
               (g.n, g.n_pad, g.axis, g.mesh)),
    lambda aux, children: RowShardedCoo(*children, *aux),
)


def shard_coo_rows(coo: CooGraph, mesh: Mesh, axis: str = "model"
                   ) -> RowShardedCoo:
    """Host-side packer: split a (row-sorted) CooGraph into p equal row blocks.

    Rows pad up to a multiple of p; each block's edge list pads to the largest
    block with zero-valued (local_row=0, col=0) entries, which contribute 0.
    """
    p = int(mesh.shape[axis])
    n = coo.n
    n_pad = -(-n // p) * p
    rows_per = n_pad // p
    rows = np.asarray(coo.rows)
    cols = np.asarray(coo.cols)
    vals = np.asarray(coo.vals)
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
    sharding = jax.sharding.NamedSharding(mesh, P(axis, None))
    return RowShardedCoo(
        local_rows=jax.device_put(jnp.asarray(lr), sharding),
        cols=jax.device_put(jnp.asarray(cc), sharding),
        vals=jax.device_put(jnp.asarray(vv), sharding),
        n=n, n_pad=n_pad, axis=axis, mesh=mesh)
