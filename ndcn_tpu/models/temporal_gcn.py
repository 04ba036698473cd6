"""Discrete recurrent baselines: GCN feature extractor + {LSTM,GRU,RNN} cell.

Capability parity with ``TemporalGCN`` (neural_dynamics.py:179-238): at each time
step the (n, 1) node state is graph-convolved (Linear → A·support, flattened to a
single (1, n·h) vector, :163-176), fed through a recurrent cell, and decoded back
to (n,). Teacher-forced over the observed steps, then free-running for ``future``
steps feeding predictions back. Both phases are ``lax.scan``s — the reference's
per-step python loop (:210-236) becomes two compiled scans.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ndcn_tpu.graph.sparse import GraphOperator, matvec
from ndcn_tpu.models import nn


def init_temporal_gcn(key, input_size: int, hidden_size_gnn: int,
                      n_nodes: int, hidden_size_rnn: int,
                      rnn_type: str = "lstm") -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    gates = nn.RNN_GATES[rnn_type]
    return {
        "gc": nn.linear_init(k1, input_size, hidden_size_gnn),
        "cell": nn.rnn_cell_init(k2, n_nodes * hidden_size_gnn, hidden_size_rnn,
                                 gates=gates),
        "out": nn.linear_init(k3, hidden_size_rnn, n_nodes),
    }


def _cell_step(params, rnn_type, features, state):
    if rnn_type == "lstm":
        h, c = nn.lstm_cell_apply(params["cell"], features, state)
        return (h, c), h
    if rnn_type == "gru":
        h = nn.gru_cell_apply(params["cell"], features, state[0])
        return (h, state[1]), h
    h = nn.rnn_cell_apply(params["cell"], features, state[0])
    return (h, state[1]), h


def temporal_gcn_forward(params: Dict[str, Any], op: GraphOperator,
                         x_seq: jnp.ndarray, rnn_type: str = "lstm",
                         future: int = 0, dropout: float = 0.0,
                         rng=None, deterministic: bool = True) -> jnp.ndarray:
    """x_seq: (n, T) observed node states. Returns (n, T + future) predictions."""
    n, T = x_seq.shape
    hidden_rnn = params["out"]["w"].shape[0]
    state0 = (jnp.zeros((1, hidden_rnn), x_seq.dtype),
              jnp.zeros((1, hidden_rnn), x_seq.dtype))

    def embed(xt, key):
        """(n, 1) → (1, n*h): Linear, graph-propagate, flatten, relu."""
        if not deterministic and dropout > 0.0 and key is not None:
            xt = nn.dropout(key, xt, dropout, deterministic=False)
        support = nn.linear_apply(params["gc"], xt)       # (n, h)
        prop = matvec(op, support)                        # (n, h)
        return jax.nn.relu(prop.reshape(1, -1))           # (1, n*h)

    use_drop = (not deterministic) and dropout > 0.0 and rng is not None
    keys_tf = jax.random.split(rng, T + future) if use_drop else [None] * (T + future)

    def teacher_step(state, inp):
        xt, key = inp
        feats = embed(xt[:, None], key)
        state, h = _cell_step(params, rnn_type, feats, state)
        out = nn.linear_apply(params["out"], h)[0]        # (n,)
        return state, out

    if not use_drop:
        def teacher_step_nd(state, xt):
            return teacher_step(state, (xt, None))
        state, outs = jax.lax.scan(teacher_step_nd, state0, x_seq.T)
    else:
        state, outs = jax.lax.scan(teacher_step, state0,
                                   (x_seq.T, jnp.stack(keys_tf[:T])))

    if future > 0:
        def free_step(carry, key):
            state, prev = carry
            feats = embed(prev[:, None], key if use_drop else None)
            state, h = _cell_step(params, rnn_type, feats, state)
            out = nn.linear_apply(params["out"], h)[0]
            return (state, out), out

        init = (state, outs[-1])
        if use_drop:
            _, future_outs = jax.lax.scan(free_step, init, jnp.stack(keys_tf[T:]))
        else:
            _, future_outs = jax.lax.scan(lambda c, _: free_step(c, None), init,
                                          None, length=future)
        outs = jnp.concatenate([outs, future_outs], axis=0)

    return outs.T  # (n, T + future)
