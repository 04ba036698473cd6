"""Generic explicit Runge-Kutta stage machinery.

TPU-native counterpart of /root/reference/torchdiffeq/_impl/rk_common.py: instead of
per-stage python lists of tensors, stage derivatives are kept as a pytree whose
leaves carry a leading stage axis (S, *shape) — the stage combine is a tensordot
with constant coefficients, which XLA fuses into a handful of FMAs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ndcn_tpu.ode.tableaux import Tableau
from ndcn_tpu.ode.tree_math import scaled_dot_product, tree_add, tree_map, tree_stack


def runge_kutta_step(func: Callable, y0, f0, t0, dt, tableau: Tableau):
    """One explicit RK step with embedded error estimate (rk_common.py:22-61).

    Args:
        func: RHS callable ``f(t, y) -> dy/dt`` over pytrees.
        y0: state pytree at t0.
        f0: RHS at (t0, y0) — FSAL reuse from the previous step.
        t0, dt: scalars in the time dtype.
        tableau: explicit Butcher tableau.

    Returns:
        (y1, f1, y1_error, k) with k a pytree of stage derivatives (S, *shape).
    """
    ks = [f0]
    for alpha_i, beta_i in zip(tableau.alpha, tableau.beta):
        ti = t0 + jnp.asarray(alpha_i, t0.dtype) * dt
        acc = scaled_dot_product(dt, beta_i, tree_stack(ks))
        yi = tree_add(y0, acc)
        ks.append(func(ti, yi))
    k = tree_stack(ks)

    if tableau.fsal:
        # Last stage was evaluated at the solution point (Dormand-Prince property):
        # c_sol[:-1] == beta[-1] and c_sol[-1] == 0, so yi is already y1.
        y1 = yi
    else:
        y1 = tree_add(y0, scaled_dot_product(dt, tableau.c_sol, k))

    f1 = tree_map(lambda l: l[-1], k)
    y1_error = scaled_dot_product(dt, tableau.c_error, k)
    return y1, f1, y1_error, k


def rk4_alt_step_func(func: Callable, t, dt, y, k1=None):
    """RK4 via the 3/8-rule variant (rk_common.py:72-78) — the reference's 'rk4'."""
    if k1 is None:
        k1 = func(t, y)
    third = dt / 3.0
    k2 = func(t + third, tree_map(lambda y_, k_: y_ + third.astype(y_.dtype) * k_, y, k1))
    k3 = func(t + third * 2.0, tree_map(
        lambda y_, k1_, k2_: y_ + dt.astype(y_.dtype) * (k1_ / -3.0 + k2_), y, k1, k2))
    k4 = func(t + dt, tree_map(
        lambda y_, k1_, k2_, k3_: y_ + dt.astype(y_.dtype) * (k1_ - k2_ + k3_), y, k1, k2, k3))
    return tree_map(
        lambda k1_, k2_, k3_, k4_: (k1_ + 3.0 * k2_ + 3.0 * k3_ + k4_) * (dt.astype(k1_.dtype) / 8.0),
        k1, k2, k3, k4)
