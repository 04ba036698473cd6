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

from typing import NamedTuple, Union

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


GraphOperator = Union[DenseGraph, EllGraph]


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


def as_operator(mat, sparse: bool = False, dtype=jnp.float32) -> GraphOperator:
    """Build a device operator from numpy / scipy input (the --sparse switch)."""
    if sp.issparse(mat):
        return from_scipy(mat, dtype=dtype) if sparse else from_dense(
            np.asarray(mat.todense()), dtype)
    return from_scipy(sp.csr_matrix(np.asarray(mat)), dtype=dtype) if sparse else (
        from_dense(np.asarray(mat), dtype))


def matvec(op: GraphOperator, x: jnp.ndarray) -> jnp.ndarray:
    """A @ X for X of shape (n, d). The hot op of every model RHS."""
    if isinstance(op, DenseGraph):
        return jnp.matmul(op.mat, x, preferred_element_type=x.dtype)
    gathered = jnp.take(x, op.cols, axis=0)          # (n, k, d)
    return jnp.einsum("nk,nkd->nd", op.vals.astype(x.dtype), gathered)


def to_dense_matrix(op: GraphOperator) -> jnp.ndarray:
    """Materialize the operator as an (n, n) matrix (tests / small graphs)."""
    if isinstance(op, DenseGraph):
        return op.mat
    n = op.n_nodes
    dense = jnp.zeros((n, n), op.vals.dtype)
    rows = jnp.repeat(jnp.arange(n), op.cols.shape[1])
    return dense.at[rows, op.cols.reshape(-1)].add(op.vals.reshape(-1))
