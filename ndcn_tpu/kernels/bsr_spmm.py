"""Pallas TPU kernel: block-sparse (BSR) sparse-matrix × dense-matrix product.

The reference's sparse path is ``torch.sparse.mm`` over COO (neural_dynamics.py:29).
On TPU, element-sparse formats fight the hardware; the native layout is
block-sparse: the (n, n) operator is tiled into B×B blocks (B = 128, the MXU
face), only nonzero blocks are stored, and each row-block's block list is padded
ELL-style. The kernel walks grid (row_block, slot):

- the A-block and X-row-block for each slot are selected by *scalar-prefetched*
  index arrays (PrefetchScalarGridSpec), so Pallas DMAs exactly the needed blocks;
- the output row-block stays resident in VMEM across the slot loop (grid is
  row-major), zeroed at slot 0 and accumulated with jnp.dot on the MXU;
- padded slots point at a reserved all-zero block, so no masking is needed in the
  inner loop.

Forward-only kernel + custom_vjp: for a constant symmetric-structured operator
the VJP of ``y = A @ x`` is ``Aᵀ @ ḡ``, served by a second packing of Aᵀ.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.kernels.platform import pallas_interpret
import scipy.sparse as sp

BLOCK = 128


@jax.tree_util.register_pytree_node_class
class BsrMatrix:
    """ELL-of-blocks packing of a sparse matrix (see from_scipy_bsr).

    blocks (n_blocks_stored, B, B) with index 0 all-zero; block_ids / block_cols
    (n_row_blocks, max_slots). The logical (un-padded) shape is static pytree aux
    data so it survives jit/scan without being traced.
    """

    def __init__(self, blocks, block_ids, block_cols, n_rows: int, n_cols: int):
        self.blocks = blocks
        self.block_ids = block_ids
        self.block_cols = block_cols
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)

    def tree_flatten(self):
        return (self.blocks, self.block_ids, self.block_cols), (self.n_rows,
                                                                self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def from_scipy_bsr(mat: sp.spmatrix, block: int = BLOCK) -> BsrMatrix:
    m = sp.csr_matrix(mat)
    n_rows, n_cols = m.shape
    nrb = -(-n_rows // block)
    ncb = -(-n_cols // block)
    # pad the CSR to block-multiple shape (extra rows empty, extra cols unused)
    indptr = np.concatenate([m.indptr,
                             np.full(nrb * block - n_rows, m.indptr[-1],
                                     dtype=m.indptr.dtype)])
    padded = sp.csr_matrix((m.data, m.indices, indptr),
                           shape=(nrb * block, ncb * block))
    bsr = padded.tobsr(blocksize=(block, block))
    bsr.sort_indices()

    indptr, indices, data = bsr.indptr, bsr.indices, bsr.data
    max_slots = max(1, int(np.diff(indptr).max()))
    n_stored = data.shape[0] + 1  # +1 for the reserved zero block
    blocks = np.zeros((n_stored, block, block), dtype=np.float32)
    blocks[1:] = data.astype(np.float32)
    block_ids = np.zeros((nrb, max_slots), dtype=np.int32)
    block_cols = np.zeros((nrb, max_slots), dtype=np.int32)
    for rb in range(nrb):
        lo, hi = indptr[rb], indptr[rb + 1]
        count = hi - lo
        block_ids[rb, :count] = np.arange(lo, hi) + 1
        block_cols[rb, :count] = indices[lo:hi]
    return BsrMatrix(blocks=jnp.asarray(blocks),
                     block_ids=jnp.asarray(block_ids),
                     block_cols=jnp.asarray(block_cols),
                     n_rows=n_rows, n_cols=n_cols)


def _spmm_kernel(ids_ref, cols_ref, blocks_ref, x_ref, out_ref):
    """One (row_block, slot) grid step: out[rb] += blocks[ids[rb, s]] @ x[cols[rb, s]].

    blocks_ref / x_ref arrive as the BlockSpec-selected (1, B, B) / (B, D) tiles;
    the scalar-prefetch refs (ids/cols) are consumed by the index maps only.
    """
    import jax.experimental.pallas as pl  # local import keeps module CPU-importable

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # full-f32 MXU passes: default precision truncates inputs to bf16, which
    # costs ~1e-2 absolute error on graph-scale operands (breaks 1e-4 parity)
    out_ref[:, :] += jnp.dot(blocks_ref[0], x_ref[:, :],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


def bsr_spmm_raw(a: BsrMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for x (n_cols, d); d is padded to a lane multiple internally."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    block = a.blocks.shape[-1]  # the packing fixes the block size
    nrb = a.block_ids.shape[0]
    max_slots = a.block_ids.shape[1]
    ncb = -(-a.n_cols // block)

    d_pad = max(128, -(-d // 128) * 128)
    x_pad = jnp.zeros((ncb * block, d_pad), x.dtype)
    x_pad = x_pad.at[:n, :d].set(x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ids, block_cols
        grid=(nrb, max_slots),
        in_specs=[
            pl.BlockSpec((1, block, block),
                         lambda i, j, ids, cols: (ids[i, j], 0, 0)),
            pl.BlockSpec((block, d_pad),
                         lambda i, j, ids, cols: (cols[i, j], 0)),
        ],
        out_specs=pl.BlockSpec((block, d_pad), lambda i, j, ids, cols: (i, 0)),
    )

    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * block, d_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(a.block_ids, a.block_cols, a.blocks, x_pad)
    return out[: a.n_rows, :d].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def bsr_spmm(a: BsrMatrix, at: BsrMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable (in x) BSR SpMM. ``at`` is the packing of Aᵀ for the VJP.

    A / Aᵀ are CONSTANT operators: their cotangents are symbolic zero. A
    learned-operator model must not route through this kernel (use the dense
    path, whose fused kernel NaN-poisons the operator cotangent loudly)."""
    return bsr_spmm_raw(a, x)


def _fwd(a, at, x):
    return bsr_spmm_raw(a, x), (a, at)


def _bwd(res, g):
    a, at = res
    return None, None, bsr_spmm_raw(at, g)


bsr_spmm.defvjp(_fwd, _bwd)


# --------------------------------------------------------------- fused RHS path
# Sparse counterpart of kernels/fused_rhs.py: the whole learned graph-ODE RHS
# relu((A @ h) @ W + b) (reference neural_dynamics.py:20-39) with A block-sparse.
# The accumulated (B, d) row-block of A·h stays in VMEM through the control
# matmul + bias + relu epilogue — the propagated hidden state is never written
# to HBM between the two matmuls.


def _spmm_fused_kernel(ids_ref, cols_ref, blocks_ref, x_ref, w_ref, b_ref,
                       out_ref):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    hi = jax.lax.Precision.HIGHEST
    out_ref[:, :] += jnp.dot(blocks_ref[0], x_ref[:, :],
                             preferred_element_type=jnp.float32, precision=hi)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _epilogue():
        ahw = jnp.dot(out_ref[:, :], w_ref[:, :],
                      preferred_element_type=jnp.float32, precision=hi)
        out_ref[:, :] = jnp.maximum(ahw + b_ref[:, :], 0.0)


def bsr_fused_rhs_raw(a: BsrMatrix, x: jnp.ndarray, w: jnp.ndarray,
                      b: jnp.ndarray) -> jnp.ndarray:
    """relu((A @ x) @ w + b) with A block-sparse, x (n, d), w (d, d), b (d,)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    block = a.blocks.shape[-1]  # the packing fixes the block size
    nrb = a.block_ids.shape[0]
    max_slots = a.block_ids.shape[1]
    ncb = -(-a.n_cols // block)

    d_pad = max(128, -(-d // 128) * 128)
    x_pad = jnp.zeros((ncb * block, d_pad), x.dtype).at[:n, :d].set(x)
    w_pad = jnp.zeros((d_pad, d_pad), jnp.float32).at[:d, :d].set(w)
    b_pad = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb, max_slots),
        in_specs=[
            pl.BlockSpec((1, block, block),
                         lambda i, j, ids, cols: (ids[i, j], 0, 0)),
            pl.BlockSpec((block, d_pad),
                         lambda i, j, ids, cols: (cols[i, j], 0)),
            pl.BlockSpec((d_pad, d_pad), lambda i, j, ids, cols: (0, 0)),
            pl.BlockSpec((1, d_pad), lambda i, j, ids, cols: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, d_pad), lambda i, j, ids, cols: (i, 0)),
    )

    out = pl.pallas_call(
        _spmm_fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * block, d_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(a.block_ids, a.block_cols, a.blocks, x_pad, w_pad, b_pad)
    return out[: a.n_rows, :d].astype(x.dtype)


@jax.custom_vjp
def bsr_fused_rhs(a: BsrMatrix, at: BsrMatrix, x: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused sparse RHS. ``at`` packs Aᵀ for the x-cotangent;
    A itself is a constant operator (zero cotangent), like every model here."""
    return bsr_fused_rhs_raw(a, x, w, b)


def _fused_fwd(a, at, x, w, b):
    out = bsr_fused_rhs_raw(a, x, w, b)
    return out, (a, at, x, w, out)


def _fused_bwd(res, g):
    a, at, x, w, out = res
    hi = jax.lax.Precision.HIGHEST
    g = g * (out > 0).astype(g.dtype)
    ah = bsr_spmm_raw(a, x)  # recomputed: cheaper than storing it per RHS eval
    dx = bsr_spmm_raw(at, jnp.matmul(g, w.T, preferred_element_type=jnp.float32,
                                     precision=hi).astype(g.dtype))
    dw = jnp.matmul(ah.T, g, preferred_element_type=jnp.float32,
                    precision=hi).astype(w.dtype)
    db = jnp.sum(g, axis=0).astype(g.dtype)
    return None, None, dx, dw, db


bsr_fused_rhs.defvjp(_fused_fwd, _fused_bwd)
