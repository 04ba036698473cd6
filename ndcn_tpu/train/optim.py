"""Optimizers with torch-parity semantics.

Every reference experiment trains with ``optim.Adam(params, lr, weight_decay)``
(heat_dynamics.py:295, dgnn.py:185): *coupled* L2 — weight decay is added to the
gradient before the Adam moments — and eps added after the sqrt of the
bias-corrected second moment. In optax terms:

    chain(add_decayed_weights(wd), scale_by_adam(eps_root=0), scale(-lr))
"""

from __future__ import annotations

import optax


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)
