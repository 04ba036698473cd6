"""Pallas TPU kernel: fused graph-ODE right-hand side  relu((A @ H) @ W + b).

This is the entire learned RHS of NDCN (ODEFunc, reference neural_dynamics.py:20-39)
in one kernel: the propagation matmul, the control matmul, bias and ReLU — the
(n, hidden) intermediate never leaves VMEM. XLA already fuses bias+relu into the
second matmul; the win here is chaining the two matmuls so A·H is not written to
HBM between them (one HBM round-trip of the hidden state per RHS eval, ~6 evals
per solver step).

Grid: row-blocks of A. Each step loads a (Bm, n) row panel of A, the whole H
(n, h) and W (h, h) (small for this model family), computes on the MXU, writes a
(Bm, h) output tile. Sizes are padded to (8,128)/(128,128) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.kernels.platform import pallas_interpret


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, h_ref, w_ref, b_ref, out_ref):
    import jax.experimental.pallas as pl  # noqa: F401  (kept local for CPU import)

    hi = jax.lax.Precision.HIGHEST
    ah = jnp.dot(a_ref[:, :], h_ref[:, :], preferred_element_type=jnp.float32,
                 precision=hi)
    ahw = jnp.dot(ah, w_ref[:, :], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:, :] = jnp.maximum(ahw + b_ref[:, :], 0.0)


@jax.custom_vjp
def fused_ode_rhs(a: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused RHS: relu((a @ h) @ w + b).

    Forward runs the Pallas kernel (intermediate stays in VMEM); the backward
    pass recomputes ah = a @ h and applies the standard matmul transposes (XLA
    fuses those well on its own). ``a`` is a CONSTANT operator: its cotangent
    is NaN-poisoned (not zero) so differentiating a learned-operator model
    through this kernel fails loudly instead of silently never training the
    operator — route such models (e.g. the DeepGCN3 pattern) through the
    plain XLA matmul path instead.
    """
    return fused_graph_rhs(a, h, w, b)


def _fused_fwd(a, h, w, b):
    out = fused_graph_rhs(a, h, w, b)
    return out, (a, h, w, out)


def _fused_bwd(res, g):
    a, h, w, out = res
    # match the forward kernel's full-f32 MXU passes: preferred_element_type only
    # sets the accumulator; without precision=HIGHEST the inputs truncate to bf16
    # and the gradients belong to a lower-precision function than the forward
    hi = jax.lax.Precision.HIGHEST
    g = g * (out > 0).astype(g.dtype)          # relu mask (out==0 ⇒ blocked)
    ah = jnp.matmul(a, h, preferred_element_type=jnp.float32, precision=hi)
    dh = jnp.matmul(a.T, jnp.matmul(g, w.T, preferred_element_type=jnp.float32,
                                    precision=hi),
                    preferred_element_type=jnp.float32, precision=hi).astype(h.dtype)
    dw = jnp.matmul(ah.T, g, preferred_element_type=jnp.float32,
                    precision=hi).astype(w.dtype)
    db = jnp.sum(g, axis=0).astype(g.dtype)
    # NaN, not zero: a silent zero cotangent would make a learned operator
    # look like a vanishing gradient (see fused_ode_rhs docstring). Discarded
    # for free when a is (as designed) a constant.
    da = jnp.full_like(a, jnp.nan)
    return da, dh, dw, db


fused_ode_rhs.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_graph_rhs(a: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray,
                    b: jnp.ndarray, block_rows: int = 256) -> jnp.ndarray:
    """relu((a @ h) @ w + b) with a (n, n), h (n, k), w (k, k), b (k,)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = h.shape
    n_pad = _round_up(n, block_rows)
    k_pad = _round_up(max(k, 128), 128)

    # skip the (n_pad, n_pad) copy when the operator is already aligned — the
    # solver scan evaluates this ~6x per step and A is loop-invariant
    if a.shape == (n_pad, n_pad):
        a_p = a.astype(jnp.float32)
    else:
        a_p = jnp.zeros((n_pad, n_pad), jnp.float32).at[:n, :n].set(a)
    h_p = jnp.zeros((n_pad, k_pad), jnp.float32).at[:n, :k].set(h)
    w_p = jnp.zeros((k_pad, k_pad), jnp.float32).at[:k, :k].set(w)
    b_p = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(b)

    grid = (n_pad // block_rows,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, k_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(a_p, h_p, w_p, b_p)
    return out[:n, :k].astype(h.dtype)
