"""ndcn_tpu — a TPU-native framework for learning neural dynamics on complex networks.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the NDCN reference
implementation ("Neural Dynamics on Complex Networks", Zang & Wang, KDD 2020):

- ``ndcn_tpu.ode``       — differentiable ODE solver library (fixed-grid + adaptive,
                           dense output, continuous adjoint, NFE accounting).
- ``ndcn_tpu.graph``     — graph operators (normalized Laplacian / Kipf / zipf-alpha ...)
                           and synthetic graph generators.
- ``ndcn_tpu.kernels``   — Pallas TPU kernels for the hot compute paths.
- ``ndcn_tpu.dynamics``  — ground-truth physics right-hand sides (heat / mutualistic / gene).
- ``ndcn_tpu.models``    — NDCN, temporal GCN baselines, the discrete GCN zoo.
- ``ndcn_tpu.data``      — Planetoid citation-network loading & splits.
- ``ndcn_tpu.train``     — optax training loops with torch-parity Adam, losses, metrics.
- ``ndcn_tpu.parallel``  — device-mesh sharding & batched experiment sweeps.
- ``ndcn_tpu.serve``     — export the compiled inference forward as a portable
                           serving artifact (jax.export / StableHLO).
- ``ndcn_tpu.experiments``— CLI entry points mirroring the reference flag surfaces.

Everything under ``jax.jit`` is static-shaped and compiler friendly: solver loops are
``lax.scan`` / ``lax.while_loop``, state is pytrees, and the training path is
end-to-end differentiable (gradients flow through the adaptive step controller,
matching the reference's backprop-through-solver behaviour).
"""

__version__ = "0.1.0"

from ndcn_tpu.ode import odeint, odeint_adjoint, odeint_with_stats, SOLVERS  # noqa: F401
