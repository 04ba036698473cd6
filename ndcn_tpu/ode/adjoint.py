"""Continuous-adjoint gradients (O(1)-memory in trajectory length).

Counterpart of /root/reference/torchdiffeq/_impl/adjoint.py: the backward pass walks
observation intervals in reverse, integrating the augmented system
(y, adjoint_y, adjoint_t, adjoint_params) whose RHS uses a VJP of the dynamics with
cotangent -adjoint_y (adjoint.py:32-55, 63-98). Here the interval walk is a
``lax.scan`` and each interval solve is a compiled ``lax.while_loop``; the VJP comes
from ``jax.vjp`` instead of retain-graph autograd.

Because JAX is functional, the API takes the parameter pytree explicitly:

    sol = odeint_adjoint(func, y0, t, params=params, ...)   # func(t, y, params)

The reference requires an nn.Module for the same reason (adjoint.py:108-110).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ndcn_tpu.ode.api import odeint_with_stats
from ndcn_tpu.ode.tree_math import tree_dot, tree_map, tree_zeros_like


def _nan_on_failure(sol, stats):
    """Budget exhaustion must be loud: poison the trajectory with NaN instead of
    returning the zero-filled unreached rows of the solve buffer."""
    return tree_map(lambda b: jnp.where(stats.success, b, jnp.nan), sol)


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7))
def odeint_adjoint(func: Callable, y0, t, params, rtol: float = 1e-6,
                   atol: float = 1e-12, method: Optional[str] = None,
                   options: Optional[Dict[str, Any]] = None):
    """Solve dy/dt = func(t, y, params) with continuous-adjoint gradients."""
    sol, stats = odeint_with_stats(lambda tt, yy: func(tt, yy, params), y0, t,
                                   rtol=rtol, atol=atol, method=method,
                                   options=_nondiff(options))
    return _nan_on_failure(sol, stats)


def _nondiff(options):
    options = dict(options or {})
    options["differentiable"] = False
    return options


def _fwd(func, y0, t, params, rtol, atol, method, options):
    sol = odeint_adjoint(func, y0, t, params, rtol, atol, method, options)
    return sol, (sol, t, params)


def _bwd(func, rtol, atol, method, options, residuals, grad_output):
    sol, t, params = residuals
    T = t.shape[0]

    def augmented_dynamics(s, aug):
        """RHS of the reverse-time augmented system at s = -t (adjoint.py:32-55)."""
        y, adj_y, _, _ = aug
        tt = -s
        f_eval, vjp_fn = jax.vjp(lambda tt_, yy_, pp_: func(tt_, yy_, pp_),
                                 tt, y, params)
        vjp_t, vjp_y, vjp_params = vjp_fn(tree_map(jnp.negative, adj_y))
        # reverse time: d/ds = -d/dt
        return (tree_map(jnp.negative, f_eval),
                tree_map(jnp.negative, vjp_y),
                -vjp_t,
                tree_map(jnp.negative, vjp_params))

    def interval(carry, i):
        """Integrate the augmented system over [t[i], t[i-1]] (adjoint.py:63-98)."""
        adj_y, adj_time, adj_params = carry
        y_i = tree_map(lambda buf: buf[i], sol)
        g_i = tree_map(lambda buf: buf[i], grad_output)

        f_i = func(t[i], y_i, params)
        dLd_cur_t = tree_dot(f_i, g_i)
        adj_time = adj_time - dLd_cur_t

        aug0 = (y_i, adj_y, adj_time, adj_params)
        s_grid = jnp.stack([-t[i], -t[i - 1]])
        aug_sol, aug_stats = odeint_with_stats(augmented_dynamics, aug0, s_grid,
                                               rtol=rtol, atol=atol, method=method,
                                               options=_nondiff(options))
        aug_sol = _nan_on_failure(aug_sol, aug_stats)
        _, adj_y, adj_time, adj_params = tree_map(lambda buf: buf[1], aug_sol)

        g_prev = tree_map(lambda buf: buf[i - 1], grad_output)
        adj_y = tree_map(jnp.add, adj_y, g_prev)
        return (adj_y, adj_time, adj_params), dLd_cur_t

    adj_y0 = tree_map(lambda buf: buf[-1], grad_output)
    tdtype = t.dtype
    carry0 = (adj_y0, jnp.zeros((), tdtype), tree_zeros_like(params))
    (adj_y, adj_time, adj_params), time_vjps_rev = jax.lax.scan(
        interval, carry0, jnp.arange(T - 1, 0, -1))

    grad_t = jnp.concatenate([adj_time[None], time_vjps_rev[::-1]]).astype(t.dtype)
    return adj_y, grad_t, adj_params


odeint_adjoint.defvjp(_fwd, _bwd)
