"""torch_adam must reproduce torch.optim.Adam (coupled L2) step-for-step.

Every reference experiment uses optim.Adam(params, lr, weight_decay)
(heat_dynamics.py:295, dgnn.py:185); training-trajectory parity hinges on the
optimizer arithmetic matching exactly.
"""

import jax.numpy as jnp
import numpy as np
import torch

from ndcn_tpu.train.optim import torch_adam


def test_adam_matches_torch_with_weight_decay():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    lr, wd = 0.01, 0.024

    # torch side: params receive a fixed synthetic gradient sequence
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]
    for g in grads:
        opt_t.zero_grad()
        wt.grad = torch.tensor(g)
        opt_t.step()

    # jax side
    opt_j = torch_adam(lr, wd)
    wj = jnp.asarray(w0)
    state = opt_j.init(wj)
    for g in grads:
        updates, state = opt_j.update(jnp.asarray(g), state, wj)
        wj = wj + updates

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adam_matches_torch_no_decay():
    rng = np.random.RandomState(1)
    w0 = rng.randn(10).astype(np.float32)
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = torch.optim.Adam([wt], lr=0.05)
    opt_j = torch_adam(0.05)
    wj = jnp.asarray(w0)
    state = opt_j.init(wj)
    for i in range(8):
        g = rng.randn(10).astype(np.float32)
        wt.grad = torch.tensor(g)
        opt_t.step()
        updates, state = opt_j.update(jnp.asarray(g), state, wj)
        wj = wj + updates
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
