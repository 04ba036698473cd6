"""Model export for serving: the compiled inference solve as one portable artifact.

The reference has no deployment story — its "checkpointing" is appending
``model.state_dict()`` into an in-memory results dict consumed by its own
scripts (/root/reference/heat_dynamics.py:363, SURVEY §5), and serving a model
means re-importing the whole research codebase. This module is the TPU-native
serving layer on top of ``jax.export``: the FULL inference forward — encoder,
while-loop adaptive solve over the frozen observation grid, sparse operator,
decoder — serializes to one StableHLO artifact. Loading it needs jax only (no
ndcn_tpu, no model code, no pickle trust), and the loaded callable replays the
exported computation: round-trips match the in-process forward to float
tolerance (tests/test_serve.py).

Notes for serving:
- Parameters, the graph operator, and the time grid are BAKED into the
  artifact (a frozen model, like the reference's ODEBlock2 freezing its time
  grid, neural_dynamics.py:82-119). The runtime input is x0 alone.
- The artifact records its lowering platform(s); export on (or for, via
  ``platforms=``) the platform that will serve it. Static shapes — TPU-first.
- The inference path is the minimal-FLOP ``lax.while_loop`` solve
  (``nondiff=True``); the callable returns ``(trajectory_or_final, success)``
  where ``success`` is the solver's budget/underflow flag — serve NaN-poisoned
  outputs loudly, never silently (the framework's failure-detection policy).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def export_ndcn(params: Dict[str, Any], op, vt, x_shape: Sequence[int], *,
                x_dtype=jnp.float32, platforms: Optional[Sequence[str]] = None,
                **forward_kwargs) -> bytes:
    """Serialize the NDCN inference forward to a portable artifact.

    ``forward_kwargs`` pass through to ``models.ndcn_forward`` (rtol/atol/
    method/terminal/ablations...); the solve is forced onto the inference
    (while-loop) path. Returns the serialized bytes — hand them to
    ``save_artifact`` / ``load_ndcn``.
    """
    from jax import export as jax_export

    from ndcn_tpu.models import ndcn_forward

    # the artifact always serves the inference (while-loop) path — drop any
    # training-path switches a caller mirrors from their training config
    # (adjoint=True would otherwise short-circuit ode_block before nondiff
    # and return stats=None)
    forward_kwargs.pop("nondiff", None)
    forward_kwargs.pop("adjoint", None)

    def fwd(x):
        out, stats = ndcn_forward(params, op, jnp.asarray(vt), x,
                                  nondiff=True, **forward_kwargs)
        return out, stats.success

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exp = jax_export.export(jax.jit(fwd), **kwargs)(
        jax.ShapeDtypeStruct(tuple(x_shape), x_dtype))
    return bytes(exp.serialize())  # serialize() hands back a bytearray


def load_ndcn(blob: bytes) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray,
                                                            jnp.ndarray]]:
    """Deserialize an ``export_ndcn`` artifact into ``x0 -> (out, success)``.

    Needs only jax at load time; the returned callable is jittable and
    replays the exported computation exactly.
    """
    from jax import export as jax_export

    exp = jax_export.deserialize(blob if isinstance(blob, bytearray)
                                 else bytearray(blob))
    return exp.call


def save_artifact(path: str, blob: bytes) -> None:
    """Atomic write (shared helper; the checkpointing policy)."""
    from ndcn_tpu.utils.io import atomic_write

    atomic_write(path, blob)


def load_artifact(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
