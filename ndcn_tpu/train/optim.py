"""Optimizers with torch-parity semantics.

Every reference experiment trains with ``optim.Adam(params, lr, weight_decay)``
(heat_dynamics.py:295, dgnn.py:185): *coupled* L2 — weight decay is added to the
gradient before the Adam moments — and eps added after the sqrt of the
bias-corrected second moment. In optax terms:

    chain(add_decayed_weights(wd), scale_by_adam(eps_root=0), scale(-lr))
"""

from __future__ import annotations

import jax
import optax


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def make_sgd_step(opt: optax.GradientTransformation, loss_fn):
    """One (params, opt_state, rng) -> (params, opt_state, loss, aux) step.

    ``loss_fn(params, rng) -> (loss, aux)``. Shared by the per-step, chunked and
    vmapped-replica trainers so the update rule lives in exactly one place.
    """

    def step(p, s, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda q: loss_fn(q, rng), has_aux=True)(p)
        updates, s = opt.update(grads, s, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return p, s, loss, aux

    return step
