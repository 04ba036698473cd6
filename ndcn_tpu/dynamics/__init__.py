"""Ground-truth physics right-hand sides (pure functions over graph operators)."""

from ndcn_tpu.dynamics.rhs import (gene_dynamics, heat_diffusion,  # noqa: F401
                                   make_rhs, mutualistic_dynamics)
