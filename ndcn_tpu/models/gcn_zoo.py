"""Discrete GCN baseline zoo for semi-supervised node classification.

Capability parity with /root/reference/models.py and ode_gcn.py:

- ``gcn``        — 2-layer Kipf GCN with optional middle layers (models.py:23-47)
- ``deep_gcn``   — residual Euler-step middle layers with one learned scalar
                   time_step (models.py:50-105)
- ``deep_gcn2``  — fixed-filter 2-linear variant (models.py:108-140)
- ``deep_gcn3``  — learned dense adjacency weight AW with on-the-fly Laplacian
                   (models.py:143-201)
- ``deep_gcn4``  — per-layer learned step sizes (models.py:241-295), DiagLinear
                   (:204-238) kept for parity though its middle layers are
                   pass-throughs in the reference forward as well
- ``res_gcn``    — Linear→ReLU → ResBlock^L → Linear (ode_gcn.py:29-60, wired in
                   dgnn.py:129-141)
- ``row_normalize`` / RowNorm (ode_gcn.py:9-26)

All are (init, apply) pairs over param dicts; ``apply(params, op, x, ...)`` takes
the propagation operator as a pytree (dense or ELL).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ndcn_tpu.graph.sparse import GraphOperator, matvec, to_dense_matrix
from ndcn_tpu.models import nn


def row_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """x / ||row||_1 with zero rows kept at zero (ode_gcn.py:9-16)."""
    norm = jnp.sum(jnp.abs(x), axis=1, keepdims=True)
    return x / jnp.where(norm == 0, 1.0, norm)


def _maybe_dropout(key, x, rate, deterministic):
    if deterministic or rate == 0.0 or key is None:
        return x
    return nn.dropout(key, x, rate, deterministic=False)


# ----------------------------------------------------------------------- GCN


def init_gcn(key, input_size, hidden_size, num_classes, num_middle_layers=0):
    keys = jax.random.split(key, 2 + num_middle_layers)
    return {
        "gc1": nn.linear_init(keys[0], input_size, hidden_size),
        "middle": [nn.linear_init(k, hidden_size, hidden_size)
                   for k in keys[1:1 + num_middle_layers]],
        "gc2": nn.linear_init(keys[-1], hidden_size, num_classes),
    }


def gcn_apply(params, op: GraphOperator, x, dropout=0.0, rng=None,
              deterministic=True):
    keys = (jax.random.split(rng, 2 + len(params["middle"]))
            if rng is not None else [None] * (2 + len(params["middle"])))
    x = _maybe_dropout(keys[0], x, dropout, deterministic)
    x = jax.nn.relu(matvec(op, nn.linear_apply(params["gc1"], x)))
    for i, layer in enumerate(params["middle"]):
        x = _maybe_dropout(keys[1 + i], x, dropout, deterministic)
        x = jax.nn.relu(matvec(op, nn.linear_apply(layer, x)))
    x = _maybe_dropout(keys[-1], x, dropout, deterministic)
    return matvec(op, nn.linear_apply(params["gc2"], x))


# ------------------------------------------------------------------- DeepGCN


def init_deep_gcn(key, input_size, hidden_size, num_classes, num_middle_layers=0):
    p = init_gcn(key, input_size, hidden_size, num_classes, num_middle_layers)
    p["time_step"] = jnp.asarray([0.1], jnp.float32)
    return p


def deep_gcn_apply(params, op: GraphOperator, x, dropout=0.0, rng=None,
                   deterministic=True):
    """Residual Euler steps: x ← x + relu(conv(x)) * time_step."""
    keys = (jax.random.split(rng, 2 + len(params["middle"]))
            if rng is not None else [None] * (2 + len(params["middle"])))
    x = _maybe_dropout(keys[0], x, dropout, deterministic)
    x = jax.nn.relu(matvec(op, nn.linear_apply(params["gc1"], x)))
    for i, layer in enumerate(params["middle"]):
        f = _maybe_dropout(keys[1 + i], x, dropout, deterministic)
        f = jax.nn.relu(matvec(op, nn.linear_apply(layer, f)))
        x = x + f * params["time_step"]
    x = _maybe_dropout(keys[-1], x, dropout, deterministic)
    return matvec(op, nn.linear_apply(params["gc2"], x))


# ------------------------------------------------------------------ DeepGCN2


def init_deep_gcn2(key, input_size, hidden_size, num_classes):
    k1, k2 = jax.random.split(key)
    return {
        "linear1": nn.linear_init(k1, input_size, hidden_size),
        "linear2": nn.linear_init(k2, hidden_size, num_classes),
        "time_step": jnp.asarray([0.1], jnp.float32),
    }


def deep_gcn2_apply(params, op: GraphOperator, x, dropout=0.0, rng=None,
                    deterministic=True):
    keys = jax.random.split(rng, 2) if rng is not None else [None, None]
    x = matvec(op, x)
    x = _maybe_dropout(keys[0], x, dropout, deterministic)
    x = jax.nn.relu(nn.linear_apply(params["linear1"], x))
    x = matvec(op, x)
    x = _maybe_dropout(keys[1], x, dropout, deterministic)
    return nn.linear_apply(params["linear2"], x)


# ------------------------------------------------------------------ DeepGCN3


def init_deep_gcn3(key, input_size, hidden_size, num_classes, num_nodes,
                   num_middle_layers=0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "linear1": nn.linear_init(k1, input_size, hidden_size),
        "linear2": nn.linear_init(k2, hidden_size, num_classes),
        "AW": jax.random.uniform(k3, (num_nodes, num_nodes), jnp.float32),
        "time_step": jnp.asarray([0.1], jnp.float32),
    }


def deep_gcn3_apply(params, op: GraphOperator, x, num_middle_layers=0,
                    dropout=0.0, rng=None, deterministic=True):
    """Learns an elementwise adjacency reweighting AW; L = A∘AW - D recomputed
    per forward (models.py:175-177). Requires a dense operator."""
    del dropout, rng, deterministic
    x = nn.linear_apply(params["linear1"], x)
    a = params["AW"] * to_dense_matrix(op)
    lap = a - jnp.diag(a.sum(1))
    for _ in range(num_middle_layers):
        x = x + jax.nn.relu(lap @ x) * params["time_step"]
    return nn.linear_apply(params["linear2"], x)


# ------------------------------------------------------------------ DeepGCN4


def init_diag_linear(key, n_features, bias=True):
    kw, kb = jax.random.split(key)
    stdv = 1.0 / jnp.sqrt(jnp.asarray(n_features, jnp.float32))
    p = {"weight": jax.random.uniform(kw, (n_features,), jnp.float32, -stdv, stdv)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (n_features,), jnp.float32, -stdv, stdv)
    return p


def diag_linear_apply(params, x):
    out = x * params["weight"]
    return out + params["bias"] if "bias" in params else out


def init_deep_gcn4(key, input_size, hidden_size, num_classes, num_middle_layers=0):
    keys = jax.random.split(key, 2 + num_middle_layers)
    return {
        "linear1": nn.linear_init(keys[0], input_size, hidden_size),
        "diag": [init_diag_linear(k, hidden_size, bias=False)
                 for k in keys[1:1 + num_middle_layers]],
        "linear2": nn.linear_init(keys[-1], hidden_size, num_classes),
        "time_step_list": jnp.full((max(num_middle_layers, 1),), 0.1, jnp.float32),
    }


def deep_gcn4_apply(params, op: GraphOperator, x, dropout=0.0, rng=None,
                    deterministic=True):
    """Per-layer learned Euler steps (models.py:241-295). As in the reference
    forward, the DiagLinear middle weights are present but unused."""
    n_mid = len(params["diag"])
    keys = jax.random.split(rng, n_mid) if (rng is not None and n_mid) else [None] * n_mid
    x = jax.nn.relu(nn.linear_apply(params["linear1"], x))
    for i in range(n_mid):
        f = matvec(op, x)
        f = _maybe_dropout(keys[i], f, dropout, deterministic)
        f = jax.nn.relu(f)
        x = x + f * params["time_step_list"][i]
    return nn.linear_apply(params["linear2"], x)


# -------------------------------------------------------------------- resGCN


def init_res_gcn(key, input_size, hidden_size, num_classes, n_blocks=0,
                 euler=False, time_varying=False):
    keys = jax.random.split(key, 2 + max(n_blocks, 1))
    blocks = []
    for i in range(n_blocks):
        blk = {}
        if time_varying:
            blk["linear"] = nn.linear_init(keys[1 + i], hidden_size, hidden_size)
        if euler:
            # reference initializes the learned step U(0, 1) (ode_gcn.py:44-45)
            blk["time_step"] = jax.random.uniform(jax.random.fold_in(keys[1 + i], 7),
                                                  (1,), jnp.float32, 0.0, 1.0)
        blocks.append(blk)
    return {
        "in": nn.linear_init(keys[0], input_size, hidden_size),
        "blocks": blocks,
        "out": nn.linear_init(keys[-1], hidden_size, num_classes),
    }


def res_gcn_apply(params, op: GraphOperator, x, dropout=0.0, rng=None,
                  deterministic=True, normalize=False):
    """ResBlock stack (ode_gcn.py:46-60): x ← x + relu(dropout(A x)) * step."""
    n_blocks = len(params["blocks"])
    keys = (jax.random.split(rng, n_blocks) if (rng is not None and n_blocks)
            else [None] * n_blocks)
    x = jax.nn.relu(nn.linear_apply(params["in"], x))
    for i, blk in enumerate(params["blocks"]):
        h = row_normalize(x) if normalize else x
        f = matvec(op, h)
        if "linear" in blk:
            f = nn.linear_apply(blk["linear"], f)
        f = _maybe_dropout(keys[i], f, dropout, deterministic)
        if normalize:
            f = row_normalize(f)
        f = jax.nn.relu(f)
        step = blk["time_step"] if "time_step" in blk else 1.0
        x = x + f * step
    return nn.linear_apply(params["out"], x)
