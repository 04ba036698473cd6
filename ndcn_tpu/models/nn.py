"""Minimal functional NN primitives with torch-parity initialization.

Models in this framework are (init_fn, apply_fn) pairs over plain dict pytrees —
no module system — so they compose freely with jit / grad / vmap / lax loops and
can sit inside ODE right-hand sides.

Initialization matches torch.nn.Linear / RNN-cell defaults so that parity
experiments share parameter distributions with the reference: every weight and
bias is U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform(a=sqrt(5)) reduces to
exactly that bound for Linear weights).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def linear_init(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    params = {"w": jax.random.uniform(kw, (in_features, out_features), dtype,
                                      -bound, bound)}
    if bias:
        params["b"] = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return params


def linear_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    out = x @ params["w"]
    if "b" in params:
        out = out + params["b"]
    return out


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout. rate == 0 or deterministic → identity (no key needed)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def dropout_mask(key, shape, rate: float, dtype=jnp.float32) -> jnp.ndarray:
    """A fixed inverted-dropout mask (sampled once, reused across RHS evals).

    The reference resamples dropout at every RHS evaluation inside the solver
    (neural_dynamics.py:34), which makes the ODE stochastic per eval and the
    adaptive controller ill-posed; all showcased configs run dropout=0. Here a
    single mask per forward pass keeps the ODE well-defined when dropout > 0.
    """
    keep = 1.0 - rate
    return jax.random.bernoulli(key, keep, shape).astype(dtype) / keep


# ----------------------------------------------------------------- RNN cells

def _cell_uniform(key, shape, hidden_size: int, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def rnn_cell_init(key, input_size: int, hidden_size: int, gates: int = 1,
                  dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Shared init for RNN (1 gate block), GRU (3), LSTM (4) cells.

    Weight layout matches torch cells: w_ih (gates*H, I), w_hh (gates*H, H),
    b_ih/b_hh (gates*H,), all U(±1/sqrt(H)).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    g = gates * hidden_size
    return {
        "w_ih": _cell_uniform(k1, (g, input_size), hidden_size, dtype),
        "w_hh": _cell_uniform(k2, (g, hidden_size), hidden_size, dtype),
        "b_ih": _cell_uniform(k3, (g,), hidden_size, dtype),
        "b_hh": _cell_uniform(k4, (g,), hidden_size, dtype),
    }


def rnn_cell_apply(params, x, h):
    """Elman cell: h' = tanh(W_ih x + b_ih + W_hh h + b_hh)."""
    return jnp.tanh(x @ params["w_ih"].T + params["b_ih"]
                    + h @ params["w_hh"].T + params["b_hh"])


def gru_cell_apply(params, x, h):
    """GRU with torch gate order (reset, update, new)."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell_apply(params, x, hc):
    """LSTM with torch gate order (input, forget, cell, output)."""
    h, c = hc
    gates = (x @ params["w_ih"].T + params["b_ih"]
             + h @ params["w_hh"].T + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


RNN_GATES = {"rnn": 1, "gru": 3, "lstm": 4}
