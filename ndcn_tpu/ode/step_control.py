"""Adaptive step-size control.

Semantics mirror the reference controller exactly so trajectories agree at matched
tolerances (/root/reference/torchdiffeq/_impl/misc.py:84-170):

- error tolerance per element: atol + rtol * max(|y0|, |y1|)
- per-leaf error metric: mean over elements of (err/tol)^2 ("mean squared ratio")
- accept iff every leaf's metric <= 1
- next dt = dt / clamp(sqrt(max_ratio)^(1/order) / safety, 1/ifactor, 1/dfactor),
  with dfactor forced to 1 when the step was accepted (never shrink on accept)
- Hairer's heuristic for the initial step (Solving ODEs I, II.4)

Everything is branch-free (jnp.where) and differentiable — like the reference, where
the controller arithmetic sits on the autograd tape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndcn_tpu.ode.tree_math import tree_map, tree_rms_norm

# Guard against division by zero. Must be a *normal* float32: subnormals (e.g.
# 1e-38) are flushed to zero by XLA, turning 0/max(0, tiny) into NaN.
_TINY = 1e-30


class Controller(NamedTuple):
    rtol: float
    atol: float
    safety: float = 0.9
    ifactor: float = 10.0
    dfactor: float = 0.2
    order: int = 5


def error_ratios(y1_error, y0, y1, rtol, atol, tdtype):
    """Per-leaf mean squared error ratios (misc.py:146-157).

    Returns a list of scalars in the time dtype.
    """

    def per_leaf(err, a, b):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = (err / tol).astype(tdtype)
        return jnp.mean(r * r)

    leaves = jax.tree_util.tree_leaves(tree_map(per_leaf, y1_error, y0, y1))
    return leaves


def accept_and_max_ratio(ratios):
    """(accept, max_ratio): accept iff all per-leaf ratios <= 1 (dopri5.py:108-109)."""
    stacked = jnp.stack(ratios)
    return jnp.all(stacked <= 1.0), jnp.max(stacked)


def optimal_step_size(last_step, max_ratio, ctrl: Controller):
    """Next step size from the max per-leaf mean-squared ratio (misc.py:160-170).

    The dfactor→1-on-accept quirk is reproduced: when max_ratio < 1 the step may
    only grow or stay. max_ratio == 0 falls out of the same clamp (factor=1/ifactor).

    A NaN ratio (an oversized trial step overflowed and its error estimate
    cancelled inf-inf) is treated as infinitely bad: maximal shrink (dt/dfactor)
    instead of a NaN dt that would dead-end the solve. The reference never gets
    here — it asserts the trial state finite and crashes (dopri5.py:100-102);
    shrinking and retrying is the recoverable version of that guard.
    """
    max_ratio = jnp.where(jnp.isnan(max_ratio), jnp.inf, max_ratio)
    dfactor = jnp.where(max_ratio < 1.0, 1.0, ctrl.dfactor)
    ratio_safe = jnp.maximum(max_ratio, _TINY)  # avoid 0**x NaN in grad
    error_ratio = jnp.sqrt(ratio_safe)
    exponent = 1.0 / ctrl.order
    factor = jnp.maximum(1.0 / ctrl.ifactor,
                         jnp.minimum(error_ratio ** exponent / ctrl.safety, 1.0 / dfactor))
    return last_step / factor


def select_initial_step(func, t0, y0, order, rtol, atol, f0, tdtype):
    """Hairer's empirical initial step selection (misc.py:84-143).

    ``order`` follows the reference call sites (4 for dopri5/tsit5, 2 for VCABM).
    Branch points in the reference (`.item()` comparisons) become jnp.where, so this
    is jit-safe; the thresholds are identical.
    """

    def leaf_norms(x, scale):
        return tree_map(lambda a, s: tree_rms_norm(a / s), x, scale)

    scale = tree_map(lambda y: atol + jnp.abs(y) * rtol, y0)

    d0 = jnp.max(jnp.stack(jax.tree_util.tree_leaves(leaf_norms(y0, scale)))).astype(tdtype)
    d1 = jnp.max(jnp.stack(jax.tree_util.tree_leaves(leaf_norms(f0, scale)))).astype(tdtype)

    # reference: max over leaves of (d0_i / d1_i); with one leaf this is d0/d1.
    # Leaves whose derivative norm is ~0 (e.g. the adjoint-time scalar in the
    # augmented system) carry no step-size information — excluding them avoids the
    # inf/NaN the raw ratio produces in float32 (the reference's python-max over
    # per-leaf tensors has the same pathology in its adjoint path).
    ratio_leaves = tree_map(
        lambda a, b: jnp.where(b < 1e-5, 0.0, a / jnp.maximum(b, _TINY)),
        leaf_norms(y0, scale), leaf_norms(f0, scale))
    h0_candidate = 0.01 * jnp.max(jnp.stack(jax.tree_util.tree_leaves(ratio_leaves))).astype(tdtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), jnp.asarray(1e-6, tdtype), h0_candidate)

    y1 = tree_map(lambda y, f: y + h0.astype(y.dtype) * f, y0, f0)
    f1 = func(t0 + h0, y1)

    d2_leaves = tree_map(lambda a, b, s: tree_rms_norm((a - b) / s) / h0.astype(a.dtype),
                         f1, f0, scale)
    d2 = jnp.max(jnp.stack(jax.tree_util.tree_leaves(d2_leaves))).astype(tdtype)

    h1_small = jnp.maximum(jnp.asarray(1e-6, tdtype), h0 * 1e-3)
    h1_big = (0.01 / jnp.maximum(jnp.maximum(d1, d2), _TINY)) ** (1.0 / (order + 1.0))
    h1 = jnp.where((d1 <= 1e-15) & (d2 <= 1e-15), h1_small, h1_big)

    return jnp.minimum(100.0 * h0, h1).astype(tdtype)
