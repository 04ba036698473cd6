"""Graph operators, generators, and device-side operator containers."""

from ndcn_tpu.graph import generators, operators  # noqa: F401
from ndcn_tpu.graph.sparse import (BsrGraph, CooGraph, DenseGraph,  # noqa: F401
                                   EllGraph, GraphOperator, as_operator,
                                   from_dense, from_scipy, from_scipy_coo,
                                   matvec, to_dense_matrix)
