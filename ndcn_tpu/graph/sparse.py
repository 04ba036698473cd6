"""Device-side graph operator containers: dense (MXU) and ELL-packed sparse.

The reference switches between dense ``torch.mm`` and ``torch.sparse.mm`` at each
call site (neural_dynamics.py:28-31, heat_dynamics.py:170-175). Here the operator
is a pytree value with a single ``matvec`` entry point:

- ``DenseGraph``: an (n, n) matrix; A·X is a plain jnp matmul → MXU. On TPU this is
  the fastest choice up to several thousand nodes (a 2708² f32 operator is 29 MB of
  HBM and one MXU pass — far cheaper than any gather/scatter sparse form).
- ``EllGraph``: ELLPACK packing (row-padded neighbor lists) — static shapes, so the
  gather/one-reduction SpMV compiles cleanly under jit; the Pallas kernel in
  ndcn_tpu.kernels accelerates the same layout for large graphs (pubmed-scale,
  19717 nodes, where dense would be 1.5 GB).

Both containers are NamedTuples of arrays, hence pytrees: they can be closed over
or passed through jit/scan/grad freely.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


class DenseGraph(NamedTuple):
    mat: jnp.ndarray  # (n, n)

    @property
    def n_nodes(self) -> int:
        return self.mat.shape[0]


class EllGraph(NamedTuple):
    cols: jnp.ndarray  # (n, k) int32 neighbor column indices, padded with 0
    vals: jnp.ndarray  # (n, k) edge values, padded with 0.0

    @property
    def n_nodes(self) -> int:
        return self.cols.shape[0]


class CooGraph(NamedTuple):
    """COO triplets sorted by row; A·X = segment_sum(vals · X[cols], rows).

    The right layout for large element-sparse graphs (pubmed-scale): work and
    memory are O(nnz · d) — ELL pays O(n · max_degree · d), which explodes on
    power-law degree distributions, and BSR fills in ~99%-zero blocks when edges
    have no block structure. ``n`` rides along as a static field via the ints-
    are-aux NamedTuple treatment below.

    ``*_t`` optionally hold the TRANSPOSE triplets (Aᵀ, sorted by its row =
    A's column). They make the backward pass a second SORTED segment-sum —
    without them, autodiff turns the gather's VJP into an UNSORTED scatter-add
    over the columns, which is catastrophically slow on TPU (~100x the sorted
    form at 2M edges). The operator itself is constant: its float cotangents
    are NaN-poisoned so learned-operator gradients fail loudly.

    ``tiles``/``tiles_t`` optionally hold the sliced-row-tile packing consumed
    by the Pallas segment-sum kernel (kernels/coo_spmv.py) — the scatter-free
    MXU reduction path TPU matvec uses when they are present."""
    rows: jnp.ndarray  # (nnz,) int32, sorted
    cols: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz,)
    rows_t: Optional[jnp.ndarray] = None  # (nnz,) int32, sorted (rows of Aᵀ)
    cols_t: Optional[jnp.ndarray] = None
    vals_t: Optional[jnp.ndarray] = None
    tiles: Optional[object] = None        # kernels.coo_spmv.CooTiles
    tiles_t: Optional[object] = None
    n: int = 0         # static: number of nodes (segment count)

    @property
    def n_nodes(self) -> int:
        return self.n


# NamedTuples treat every field as a pytree leaf; keep the static node count out
# of tracing by registering a custom flatten for CooGraph.
jax.tree_util.register_pytree_node(
    CooGraph,
    lambda g: ((g.rows, g.cols, g.vals, g.rows_t, g.cols_t, g.vals_t,
                g.tiles, g.tiles_t), g.n),
    lambda n, children: CooGraph(*children, n=n),
)


class BsrGraph(NamedTuple):
    """Block-sparse operator served by the Pallas SpMM kernel (kernels/bsr_spmm).

    Holds both A and Aᵀ packings so A·X is differentiable in X."""
    fwd: "object"   # BsrMatrix
    bwd: "object"   # BsrMatrix of the transpose

    @property
    def n_nodes(self) -> int:
        return self.fwd.n_rows


GraphOperator = Union[DenseGraph, EllGraph, CooGraph, BsrGraph]


def from_dense(mat: np.ndarray, dtype=jnp.float32) -> DenseGraph:
    return DenseGraph(mat=jnp.asarray(mat, dtype))


def from_scipy(mat: sp.spmatrix, pad_to_multiple: int = 8,
               dtype=jnp.float32) -> EllGraph:
    """Pack a scipy sparse matrix into ELL (row-major neighbor lists).

    The row width k is the max nnz per row, rounded up to ``pad_to_multiple`` so the
    gathered (n, k, d) tensors tile onto the VPU lanes.
    """
    csr = sp.csr_matrix(mat)
    n = csr.shape[0]
    row_nnz = np.diff(csr.indptr)
    k = int(max(1, row_nnz.max()))
    k = ((k + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    cols = np.zeros((n, k), dtype=np.int32)
    vals = np.zeros((n, k), dtype=np.float64)
    for i in range(n):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        cols[i, : hi - lo] = csr.indices[lo:hi]
        vals[i, : hi - lo] = csr.data[lo:hi]
    return EllGraph(cols=jnp.asarray(cols), vals=jnp.asarray(vals, dtype))


def from_scipy_bsr_graph(mat: sp.spmatrix) -> BsrGraph:
    from ndcn_tpu.kernels.bsr_spmm import from_scipy_bsr

    csr = sp.csr_matrix(mat)
    return BsrGraph(fwd=from_scipy_bsr(csr), bwd=from_scipy_bsr(csr.T.tocsr()))


# Above this many edges the sliced-tile packing for the Pallas segment-sum
# kernel is built at construction (host-side, vectorized numpy): the XLA
# scatter path it replaces degrades to ~100M rows/s on TPU, which already
# dominates SpMV time at pubmed-scale edge counts and the whole train step
# at 2M edges (docs/PARITY.md).
TILE_PACK_THRESHOLD = 50_000


def from_scipy_coo(mat: sp.spmatrix, dtype=jnp.float32,
                   tiled: Optional[bool] = None) -> CooGraph:
    """``tiled`` forces/suppresses the Pallas tile packing (None = auto by
    edge count, TILE_PACK_THRESHOLD)."""
    coo = sp.coo_matrix(mat)
    order = np.argsort(coo.row, kind="stable")
    # transpose triplets (Aᵀ sorted by ITS row = A's column): the backward's
    # dx = Aᵀḡ then runs as a sorted segment-sum instead of an unsorted
    # scatter-add (see CooGraph docstring)
    order_t = np.argsort(coo.col, kind="stable")
    rows = coo.row[order].astype(np.int32)
    cols = coo.col[order].astype(np.int32)
    vals = coo.data[order]
    rows_t = coo.col[order_t].astype(np.int32)
    cols_t = coo.row[order_t].astype(np.int32)
    vals_t = coo.data[order_t]
    n = int(coo.shape[0])
    if tiled is None:
        # the tile packing (and the Pallas kernel's split-accumulation
        # numerics) are f32-only; other dtypes take the XLA segment-sum
        # path, which honours the requested dtype end to end
        tiled = coo.nnz >= TILE_PACK_THRESHOLD and dtype == jnp.float32
    elif tiled and dtype != jnp.float32:
        raise ValueError(f"tiled COO packing is float32-only (the kernel's "
                         f"split accumulation assumes f32 vals); got "
                         f"dtype={dtype} — use dtype=float32 or tiled=False")
    tiles = tiles_t = None
    if tiled:
        from ndcn_tpu.kernels.coo_spmv import pack_tiles

        tiles = pack_tiles(rows, cols, vals, n)
        tiles_t = pack_tiles(rows_t, cols_t, vals_t, n)
    return CooGraph(rows=jnp.asarray(rows), cols=jnp.asarray(cols),
                    vals=jnp.asarray(vals, dtype),
                    rows_t=jnp.asarray(rows_t), cols_t=jnp.asarray(cols_t),
                    vals_t=jnp.asarray(vals_t, dtype),
                    tiles=tiles, tiles_t=tiles_t, n=n)


def as_operator(mat, sparse: bool = False, dtype=jnp.float32,
                format: str = "coo") -> GraphOperator:
    """Build a device operator from numpy / scipy input (the --sparse switch).

    ``format`` picks the sparse layout: 'coo' (segment-sum SpMV, O(nnz·d) — the
    scalable default), 'ell' (gather SpMV, good for bounded-degree graphs), or
    'bsr' (Pallas block-sparse SpMM kernel, best when edges have block structure).
    """
    if not sparse:
        dense = np.asarray(mat.todense()) if sp.issparse(mat) else np.asarray(mat)
        return from_dense(dense, dtype)
    csr = sp.csr_matrix(mat)
    if format == "bsr":
        if dtype != jnp.float32:
            # the Pallas BSR packing is f32-only (MXU accumulate at HIGHEST);
            # honoring other dtypes silently would hand back inconsistent
            # operators across formats
            raise ValueError(f"format='bsr' supports float32 only, got {dtype}")
        return from_scipy_bsr_graph(csr)
    if format == "coo":
        return from_scipy_coo(csr, dtype=dtype)
    if format != "ell":
        raise ValueError(f"unknown sparse format {format!r}; "
                         f"choose 'coo', 'ell' or 'bsr'")
    return from_scipy(csr, dtype=dtype)


def _coo_apply(rows, cols, vals, n: int, x: jnp.ndarray) -> jnp.ndarray:
    """Sorted segment-sum SpMV over explicit triplets."""
    if x.ndim == 2 and x.shape[1] == 1:
        # 1-D fast path: (nnz, 1) intermediates tile to (8, 128) on TPU —
        # a 128x HBM padding blowup (1.05 GB for a 2.2M-edge graph, per the
        # 200k-node OOM dump); flat (nnz,) arrays tile to (1024,) unpadded
        contrib = vals.astype(x.dtype) * jnp.take(x[:, 0], cols)
        out = jax.ops.segment_sum(contrib, rows, num_segments=n,
                                  indices_are_sorted=True)
        return out[:, None]
    contrib = vals.astype(x.dtype)[:, None] * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(contrib, rows, num_segments=n,
                               indices_are_sorted=True)


@jax.custom_vjp
def _coo_matvec(op: "CooGraph", x: jnp.ndarray) -> jnp.ndarray:
    """COO A·X whose backward is a SORTED segment-sum over the transpose
    triplets. Without this, the gather's autodiff VJP is an unsorted
    scatter-add over the columns — measured ~100x slower on TPU at 2M edges
    (it was the entire cost of the 200k-node train step). The operator is a
    CONSTANT: its value cotangents are NaN-poisoned (not zero) so a
    learned-sparse-operator model differentiating through this path fails
    loudly instead of silently never training the operator (same policy as
    kernels/fused_rhs) — route such models through the dense path."""
    return _coo_apply(op.rows, op.cols, op.vals, op.n, x)


def _coo_matvec_fwd(op, x):
    return _coo_apply(op.rows, op.cols, op.vals, op.n, x), op


def _nan_cotangent(leaf):
    """NaN for float leaves (loud), float0 zero for int index leaves (the only
    well-typed tangent for integer primals)."""
    if leaf is None:
        return None
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return jnp.full_like(leaf, jnp.nan)
    return np.zeros(leaf.shape, jax.dtypes.float0)


def poison_coo_cotangent(op: "CooGraph") -> "CooGraph":
    """The NaN-poisoned operator cotangent every CooGraph custom VJP returns:
    NaN float leaves (a learned-sparse-operator model differentiating through
    a constant-operator path fails LOUDLY instead of silently never training),
    float0 for int index leaves, mirroring the primal's FULL pytree structure
    including any CooTiles packing riding along. One definition — when
    CooGraph grows a field, every custom VJP stays structurally correct."""
    return jax.tree_util.tree_map(_nan_cotangent, op)


def _coo_matvec_bwd(op, g):
    dx = _coo_apply(op.rows_t, op.cols_t, op.vals_t, op.n, g)
    return poison_coo_cotangent(op), dx


_coo_matvec.defvjp(_coo_matvec_fwd, _coo_matvec_bwd)


def use_tiled_kernel() -> bool:
    """Dispatch seam: route tile-packed COO matvecs through the Pallas kernel?
    True on TPU execution only (tests monkeypatch this to exercise the kernel
    path in interpret mode on CPU)."""
    from ndcn_tpu.kernels.platform import pallas_interpret

    return not pallas_interpret()


def matvec(op: GraphOperator, x: jnp.ndarray) -> jnp.ndarray:
    """A @ X for X of shape (n, d). The hot op of every model RHS."""
    custom = getattr(op, "_matvec", None)
    if custom is not None:  # e.g. parallel.coo_shard.RowShardedCoo
        return custom(x)
    if isinstance(op, DenseGraph):
        return jnp.matmul(op.mat, x, preferred_element_type=x.dtype)
    if isinstance(op, BsrGraph):
        from ndcn_tpu.kernels.bsr_spmm import bsr_spmm

        return bsr_spmm(op.fwd, op.bwd, x)
    if isinstance(op, CooGraph):
        if op.tiles is not None and x.ndim == 2 and x.shape[1] > 1 \
                and use_tiled_kernel():
            # TPU: the Pallas sliced-tile segment-sum kernel (scatter-free
            # MXU reduction; kernels/coo_spmv.py). CPU execution keeps the
            # XLA path below — its compiled scatter is fine there, while
            # interpret-mode pallas at millions of edges is minutes-slow.
            from ndcn_tpu.kernels.coo_spmv import tiled_spmv

            return tiled_spmv(op.tiles, op.tiles_t, x)
        if op.rows_t is not None:
            return _coo_matvec(op, x)
        return _coo_apply(op.rows, op.cols, op.vals, op.n, x)
    gathered = jnp.take(x, op.cols, axis=0)          # (n, k, d)
    return jnp.einsum("nk,nkd->nd", op.vals.astype(x.dtype), gathered)


def to_dense_matrix(op: GraphOperator) -> jnp.ndarray:
    """Materialize the operator as an (n, n) matrix (tests / small graphs)."""
    if isinstance(op, DenseGraph):
        return op.mat
    if isinstance(op, CooGraph):
        dense = np.zeros((op.n, op.n), np.float32)
        np.add.at(dense, (np.asarray(op.rows), np.asarray(op.cols)),
                  np.asarray(op.vals))
        return jnp.asarray(dense)
    if isinstance(op, BsrGraph):
        m = op.fwd
        blocks = np.asarray(m.blocks)
        ids = np.asarray(m.block_ids)
        cols = np.asarray(m.block_cols)
        block = blocks.shape[1]
        nrb, slots = ids.shape
        full = np.zeros((nrb * block, -(-m.n_cols // block) * block), blocks.dtype)
        for rb in range(nrb):
            for s in range(slots):
                full[rb * block:(rb + 1) * block,
                     cols[rb, s] * block:(cols[rb, s] + 1) * block] += blocks[ids[rb, s]]
        return jnp.asarray(full[: m.n_rows, : m.n_cols])
    n = op.n_nodes
    dense = jnp.zeros((n, n), op.vals.dtype)
    rows = jnp.repeat(jnp.arange(n), op.cols.shape[1])
    return dense.at[rows, op.cols.reshape(-1)].add(op.vals.reshape(-1))
