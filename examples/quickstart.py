"""Quickstart: learn heat diffusion on a graph with NDCN in ~40 lines.

Run:  python examples/quickstart.py            (TPU if available)
      JAX_PLATFORMS=cpu python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

import ndcn_tpu
from ndcn_tpu.dynamics import make_rhs
from ndcn_tpu.graph import generators, operators
from ndcn_tpu.graph.sparse import from_dense
from ndcn_tpu.models import init_ndcn, ndcn_forward
from ndcn_tpu.train.losses import l1_loss
from ndcn_tpu.train.optim import make_sgd_step, torch_adam

# 1. a graph, an operator, and ground-truth heat diffusion
adj = generators.build_network("grid", 400, seed=0)
x0 = jnp.asarray(generators.grid_block_initial_value(20))
t = jnp.linspace(0.0, 5.0, 50)
truth = ndcn_tpu.odeint(make_rhs("heat", from_dense(operators.laplacian_dense(adj))),
                        x0, t, rtol=1e-7, atol=1e-9, method="dopri5",
                        options={"differentiable": False})

# 2. an NDCN model over the normalized Laplacian
op = from_dense(operators.normalized_laplacian(adj))
params = init_ndcn(jax.random.PRNGKey(0), 1, 20, 1)

def loss_fn(p, rng):
    pred, stats = ndcn_forward(p, op, t, x0, rtol=0.01, atol=0.001,
                               method="dopri5", max_steps=24)
    loss = l1_loss(pred, truth)
    return jnp.where(stats.success, loss, jnp.nan), loss / jnp.mean(truth)

# 3. train (backprop straight through the adaptive solver)
opt = torch_adam(lr=0.01, weight_decay=1e-3)
step = jax.jit(make_sgd_step(opt, loss_fn), donate_argnums=(0, 1))
opt_state = opt.init(params)
rng = jax.random.PRNGKey(1)
for i in range(1, 301):
    rng, k = jax.random.split(rng)
    params, opt_state, loss, rel = step(params, opt_state, k)
    if i % 50 == 0:
        # loss is the NaN-poisoned value: budget exhaustion must be visible
        # here (the un-poisoned rel alone would keep printing plausible
        # numbers while gradients are zero and nothing trains)
        assert np.isfinite(float(loss)), \
            "step budget exhausted (max_steps=24) — raise it for this config"
        print(f"iter {i:4d}  relative L1 {float(rel):.4f}")
