"""Device-mesh sharding and batched experiment sweeps."""

from ndcn_tpu.parallel.mesh import (make_mesh, node_sharding,  # noqa: F401
                                    operator_sharding, replica_sharding,
                                    replicated)
from ndcn_tpu.parallel.sweep import (batched_init,  # noqa: F401
                                     make_sharded_ndcn_train_step,
                                     place_problem_on_mesh)
