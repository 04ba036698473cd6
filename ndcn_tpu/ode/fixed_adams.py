"""Fixed-grid Adams-Bashforth(-Moulton) solvers.

Mirrors /root/reference/torchdiffeq/_impl/fixed_adams.py: coefficient tables up to
order 12 (:7-144), RK4 bootstrap while the history is short (:174-177), and a
fixed-point Adams-Moulton corrector (:185-200).

TPU-native differences (documented deviations, both tightening):
- the corrector always runs ``max_iters`` fixed-point iterations (the reference
  breaks early on a convergence test — extra iterations only refine the fixed point);
- the history is never popped on non-convergence (the reference pops + warns).

History is a ring-free newest-first buffer of shape (max_order-1, *state) carried
through one ``lax.scan``; the per-step order is dynamic (min(step+1, 11)) and
selects a row of a constant coefficient matrix — a single dynamic-slice + dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.ode.adaptive import SolveStats
from ndcn_tpu.ode.runge_kutta import rk4_alt_step_func
from ndcn_tpu.ode.tree_math import tree_add, tree_map, tree_where

_MIN_ORDER = 4
_MAX_ORDER = 12
_MAX_ITERS = 4

# Tables transcribed as exact integers in the reference (fixed_adams.py:7-144);
# rebuilt here from the classic recurrences so rows match coeff/divisor as floats.


def _adams_bashforth_table(max_order: int) -> np.ndarray:
    """Rows o=1..max_order: AB weights for f_{n}, f_{n-1}, ... (newest first)."""
    table = np.zeros((max_order + 1, max_order), dtype=np.float64)
    for order in range(1, max_order + 1):
        # weights w_j = integral_0^1 prod_{i != j} (s + i)/(i - j) ds, j=0..order-1
        for j in range(order):
            poly = np.poly1d([1.0])
            denom = 1.0
            for i in range(order):
                if i == j:
                    continue
                poly = poly * np.poly1d([1.0, float(i)])
                denom *= (i - j)
            integ = np.polyint(poly)
            table[order, j] = (integ(1.0) - integ(0.0)) / denom
    return table


def _adams_moulton_table(max_order: int) -> np.ndarray:
    """Rows o=1..max_order: AM weights for f_{n+1}, f_n, f_{n-1}, ... (newest first).

    With u = (t - t_n)/dt, node m sits at u_m (1 for f_{n+1}, -j for f_{n-j});
    weight = integral over [0, 1] of the Lagrange basis polynomial at that node.
    """
    table = np.zeros((max_order + 1, max_order + 1), dtype=np.float64)
    for order in range(1, max_order + 1):
        nodes = [1.0] + [-float(j) for j in range(order - 1)]
        for j, nj in enumerate(nodes):
            poly = np.poly1d([1.0])
            denom = 1.0
            for i, ni in enumerate(nodes):
                if i == j:
                    continue
                poly = poly * np.poly1d([1.0, -ni])
                denom *= (nj - ni)
            integ = np.polyint(poly)
            table[order, j] = (integ(1.0) - integ(0.0)) / denom
    return table


# Built lazily: creating device arrays at import time would initialize the JAX
# backend before callers can select a platform.
import functools


@functools.lru_cache(maxsize=1)
def _tables_np():
    return (_adams_bashforth_table(_MAX_ORDER - 1),  # (12, 11)
            _adams_moulton_table(_MAX_ORDER))        # (13, 13)


def _tables():
    # jnp conversion must happen per call: caching device arrays would leak
    # tracers when first invoked under jit.
    ab, am = _tables_np()
    return jnp.asarray(ab, jnp.float32), jnp.asarray(am, jnp.float32)


def solve_fixed_adams(func, y0, t, implicit: bool = True,
                      max_order: int = _MAX_ORDER, max_iters: int = _MAX_ITERS):
    """Integrate on the observation grid; returns (solution, SolveStats)."""
    # clamp like the reference (fixed_adams.py:162 int(min(max_order, 12)));
    # an out-of-range value would otherwise die in an opaque shape error when
    # the static table slice silently clips but the history buffer does not
    max_order = max(1, min(int(max_order), _MAX_ORDER))
    max_hist = max_order - 1  # 11 for the default order 12
    hist0 = tree_map(lambda y: jnp.zeros((max_hist,) + y.shape, y.dtype), y0)

    def push(hist, f):
        return tree_map(lambda h, f_: jnp.concatenate([f_[None], h[:-1]], axis=0),
                        hist, f)

    def body(carry, inp):
        y, hist, step_i = carry
        t0, t1 = inp
        dt = t1 - t0
        f = func(t0, y)
        hist = push(hist, f)
        n_hist = jnp.minimum(step_i + 1, max_hist)
        order = n_hist  # reference: order = min(len(prev_f), max_order - 1)

        def rk4_branch(_):
            dy = rk4_alt_step_func(func, t0, dt, y, k1=f)
            return dy, jnp.asarray(3, jnp.int32)

        def adams_branch(_):
            ab_table, am_table = _tables()
            ab_row = ab_table[order, :max_hist]

            def predict(h):
                c = ab_row.astype(h.dtype)
                return dt.astype(h.dtype) * jnp.tensordot(c, h, axes=1)

            dy = tree_map(predict, hist)
            n = jnp.asarray(0, jnp.int32)
            if implicit:
                am_row = am_table[order + 1]  # (13,): weight 0 is for f(t+dt)
                c0 = am_row[0]

                def delta_leaf(h):
                    c = am_row[1:1 + max_hist].astype(h.dtype)
                    return dt.astype(h.dtype) * jnp.tensordot(c, h, axes=1)

                delta = tree_map(delta_leaf, hist)
                for _ in range(max_iters):
                    fc = func(t1, tree_add(y, dy))
                    dy = tree_map(
                        lambda fc_, d_: dt.astype(fc_.dtype) * c0.astype(fc_.dtype) * fc_ + d_,
                        fc, delta)
                n = jnp.asarray(max_iters, jnp.int32)
            return dy, n

        # reference bootstraps with RK4 while order < _MIN_ORDER - 1 (= 3)
        use_rk4 = order < (_MIN_ORDER - 1)
        dy, extra = jax.lax.cond(use_rk4, rk4_branch, adams_branch, None)
        y1 = tree_add(y, dy)
        return (y1, hist, step_i + 1), (y1, extra + 1)

    steps = (t[:-1], t[1:])
    init = (y0, hist0, jnp.asarray(0, jnp.int32))
    _, (ys, nfes) = jax.lax.scan(body, init, steps)
    sol = tree_map(lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys)
    stats = SolveStats(nfe=jnp.sum(nfes).astype(jnp.int32),
                       n_accepted=jnp.asarray(t.shape[0] - 1, jnp.int32),
                       n_rejected=jnp.asarray(0, jnp.int32),
                       success=jnp.asarray(True))
    return sol, stats
