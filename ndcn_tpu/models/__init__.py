"""Model zoo: NDCN (continuous graph ODE), temporal GCN baselines, discrete GCNs."""

from ndcn_tpu.models.ndcn import init_ndcn, ndcn_forward, ode_block, ode_func  # noqa: F401
from ndcn_tpu.models.temporal_gcn import (init_temporal_gcn,  # noqa: F401
                                          temporal_gcn_forward)
from ndcn_tpu.models import gcn_zoo, nn  # noqa: F401
