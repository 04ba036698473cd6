"""Graph operators, generators, and device-side operator containers."""

from ndcn_tpu.graph import generators, operators  # noqa: F401
from ndcn_tpu.graph.sparse import (DenseGraph, EllGraph, GraphOperator,  # noqa: F401
                                   as_operator, from_dense, from_scipy, matvec,
                                   to_dense_matrix)
