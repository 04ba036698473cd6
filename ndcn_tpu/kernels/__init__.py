"""Pallas TPU kernels for the hot compute paths (the framework's native layer)."""

from ndcn_tpu.kernels.bsr_spmm import BsrMatrix, bsr_spmm, bsr_spmm_raw, from_scipy_bsr  # noqa: F401
from ndcn_tpu.kernels.fused_rhs import fused_graph_rhs  # noqa: F401
