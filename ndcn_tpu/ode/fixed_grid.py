"""Fixed-grid solvers: euler / midpoint / rk4 — one `lax.scan` over the time grid.

Mirrors /root/reference/torchdiffeq/_impl/fixed_grid.py and the FixedGridODESolver
integrate loop (solvers.py:79-102). By default the integration grid is the requested
observation grid itself (solvers.py:51); an optional ``step_size`` builds a finer
grid and linearly interpolates observations (solvers.py:55-68, 99-102).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.ode.adaptive import SolveStats
from ndcn_tpu.ode.runge_kutta import rk4_alt_step_func
from ndcn_tpu.ode.tree_math import tree_add, tree_map


def euler_step(func, t, dt, y):
    f = func(t, y)
    return tree_map(lambda f_: dt.astype(f_.dtype) * f_, f), 1


def midpoint_step(func, t, dt, y):
    f = func(t, y)
    y_mid = tree_map(lambda y_, f_: y_ + f_ * (dt.astype(y_.dtype) / 2.0), y, f)
    f_mid = func(t + dt / 2.0, y_mid)
    return tree_map(lambda f_: dt.astype(f_.dtype) * f_, f_mid), 2


def rk4_step(func, t, dt, y):
    return rk4_alt_step_func(func, t, dt, y), 4


STEP_FUNCS = {"euler": euler_step, "midpoint": midpoint_step, "rk4": rk4_step}


def solve_fixed_grid(step_fn: Callable, func, y0, t,
                     step_size: Optional[float] = None):
    """Integrate over the grid and return (solution, SolveStats).

    With ``step_size`` set, ``t`` must be a concrete (host) array so the finer grid
    can be constructed statically; observations are linearly interpolated from the
    bracketing grid steps.
    """
    if step_size is None:
        return _solve_on_grid(step_fn, func, y0, t)
    return _solve_with_step_size(step_fn, func, y0, t, step_size)


def _solve_on_grid(step_fn, func, y0, t):
    t0s, t1s = t[:-1], t[1:]

    def body(y, ts):
        t0, t1 = ts
        dy, n = step_fn(func, t0, t1 - t0, y)
        y1 = tree_add(y, dy)
        return y1, (y1, n)

    _, (ys, nfes) = jax.lax.scan(body, y0, (t0s, t1s))
    sol = tree_map(lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys)
    stats = SolveStats(nfe=jnp.sum(nfes).astype(jnp.int32),
                       n_accepted=jnp.asarray(t.shape[0] - 1, jnp.int32),
                       n_rejected=jnp.asarray(0, jnp.int32),
                       success=jnp.asarray(True))
    return sol, stats


def _solve_with_step_size(step_fn, func, y0, t, step_size):
    t_host = np.asarray(jax.device_get(t), dtype=np.float64)
    niters = int(np.ceil((t_host[-1] - t_host[0]) / step_size + 1))
    grid = np.arange(niters) * step_size + t_host[0]
    if grid[-1] > t_host[-1]:
        grid[-1] = t_host[-1]
    grid_j = jnp.asarray(grid, t.dtype)

    def body(y, ts):
        t0, t1 = ts
        dy, n = step_fn(func, t0, t1 - t0, y)
        y1 = tree_add(y, dy)
        return y1, (y1, n)

    _, (ys, nfes) = jax.lax.scan(body, y0, (grid_j[:-1], grid_j[1:]))
    ys_all = tree_map(lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys)

    # For each observation, the bracketing grid interval [grid[i], grid[i+1]] is the
    # first with grid[i+1] >= t_obs (reference inner while, solvers.py:99-102).
    # DELIBERATE FIX vs the reference: it rebinds y0 = y1 before calling
    # _linear_interp (solvers.py:93-96), collapsing the slope to zero so every
    # off-grid observation effectively gets the RIGHT-endpoint value; here the
    # interpolation is genuinely linear between the bracketing grid states
    # (documented in docs/PARITY.md, deviations table).
    seg = np.clip(np.searchsorted(grid[1:], t_host[1:], side="left"), 0, len(grid) - 2)
    seg_j = jnp.asarray(seg)
    g0, g1 = grid_j[seg_j], grid_j[seg_j + 1]
    x = (t[1:] - g0) / jnp.where(g1 == g0, 1.0, g1 - g0)

    def interp_leaf(buf):
        a = buf[seg_j]
        b = buf[seg_j + 1]
        xl = x.astype(buf.dtype).reshape((-1,) + (1,) * (buf.ndim - 1))
        return a + (b - a) * xl

    ys_obs = tree_map(interp_leaf, ys_all)
    sol = tree_map(lambda y, o: jnp.concatenate([y[None], o], axis=0), y0, ys_obs)
    stats = SolveStats(nfe=jnp.sum(nfes).astype(jnp.int32),
                       n_accepted=jnp.asarray(len(grid) - 1, jnp.int32),
                       n_rejected=jnp.asarray(0, jnp.int32),
                       success=jnp.asarray(True))
    return sol, stats
