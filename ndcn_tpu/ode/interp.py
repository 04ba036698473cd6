"""Dense-output interpolation between accepted solver steps.

Two strategies, matching the reference solvers:

- dopri5: quartic polynomial fit from (y0, y1, y_mid, f0, f1)
  (/root/reference/torchdiffeq/_impl/interp.py:5-65, dopri5.py:39-45).
- tsit5: Tsitouras' own rational dense-output coefficients over the 7 stages
  (/root/reference/torchdiffeq/_impl/tsit5.py:30-47).

Interp state is a small pytree carried by the integrator and emitted per step so
observation times can be evaluated by a gather + polynomial evaluation — no
data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndcn_tpu.ode.tableaux import DOPRI5
from ndcn_tpu.ode.tree_math import scaled_dot_product, tree_add, tree_map

# ---------------------------------------------------------------- dopri5 (quartic)


def dopri5_interp_state(y0, y1, k, dt):
    """Build the interp source pytree after an accepted dopri5 step."""
    y_mid = tree_add(y0, scaled_dot_product(dt, DOPRI5.c_mid, k))
    f0 = tree_map(lambda l: l[0], k)
    f1 = tree_map(lambda l: l[-1], k)
    return {"y0": y0, "y1": y1, "y_mid": y_mid, "f0": f0, "f1": f1}


def dopri5_interp_init(y0):
    """Placeholder interp state before the first accepted step (never evaluated)."""
    z = tree_map(jnp.zeros_like, y0)
    return {"y0": y0, "y1": y0, "y_mid": y0, "f0": z, "f1": z}


def dopri5_interp_eval(state, t0, t1, t):
    """Evaluate the quartic fit at time t in [t0, t1] (interp.py:5-65).

    Shares dopri5_interp_weights with the scan path's matmul-form evaluation —
    ONE set of polynomial coefficients, so the while_loop inference path and
    the differentiable training path cannot drift apart."""
    dt = t1 - t0
    x = ((t - t0) / jnp.where(dt == 0, 1.0, dt))
    w = dopri5_interp_weights(jnp.reshape(x, (1,)), jnp.reshape(dt, (1,)))[0]

    def per_leaf(y0, y1, ym, f0, f1):
        wl = w.astype(y0.dtype)
        return wl[0] * y0 + wl[1] * y1 + wl[2] * ym + wl[3] * f0 + wl[4] * f1

    return tree_map(per_leaf, state["y0"], state["y1"], state["y_mid"], state["f0"], state["f1"])


# ----------------------------------------------------------------- tsit5 (rational)


def tsit5_interp_state(y0, y1, k, dt):
    del y1, dt
    return {"y0": y0, "k": k}


def tsit5_interp_init(y0):
    z = tree_map(lambda l: jnp.zeros((7,) + l.shape, l.dtype), y0)
    return {"y0": y0, "k": z}


def _tsit5_b_coeffs(x):
    """The 7 dense-output polynomials b_i(x) (tsit5.py:30-47)."""
    t = x
    b1 = -1.0530884977290216 * t * (t - 1.3299890189751412) * (t * t - 1.4364028541716351 * t + 0.7139816917074209)
    b2 = 0.1017 * t * t * (t * t - 2.1966568338249754 * t + 1.2949852507374631)
    b3 = 2.490627285651252793 * t * t * (t * t - 2.38535645472061657 * t + 1.57803468208092486)
    b4 = -16.54810288924490272 * (t - 1.21712927295533244) * (t - 0.61620406037800089) * t * t
    b5 = 47.37952196281928122 * (t - 1.203071208372362603) * (t - 0.658047292653547382) * t * t
    b6 = -34.87065786149660974 * (t - 1.2) * (t - 0.666666666666666667) * t * t
    b7 = 2.5 * (t - 1.0) * (t - 0.6) * t * t
    return jnp.stack([b1, b2, b3, b4, b5, b6, b7])


def tsit5_interp_eval(state, t0, t1, t):
    dt = t1 - t0
    x = (t - t0) / jnp.where(dt == 0, 1.0, dt)
    b = _tsit5_b_coeffs(x)

    def per_leaf(y0, k):
        bl = b.astype(y0.dtype)
        return y0 + dt.astype(y0.dtype) * jnp.tensordot(bl, k, axes=1)

    return tree_map(per_leaf, state["y0"], state["k"])


# ------------------------------------------------ matmul-form dense output
# Both dense outputs are LINEAR in their coefficient leaves with scalar weights
# depending only on (x, dt). The scan path exploits that: emitted coefficients
# stack to (C, *shape) per leaf, and evaluating O observation times against S
# emitted steps is ONE (O, S·C) × (S·C, ·) matmul — a gather of scalars plus an
# MXU pass, instead of materializing (O, C, *shape) gathered coefficient copies
# (measured 5 GB of layout-churning copies per 128-replica train step).


def dopri5_interp_stack(state):
    """Stack the quartic-fit sources to a (5, *shape) leaf each."""
    return tree_map(lambda a, b, c, d, e: jnp.stack([a, b, c, d, e]),
                    state["y0"], state["y1"], state["y_mid"],
                    state["f0"], state["f1"])


def dopri5_interp_weights(x, dt):
    """(O,) x, dt → (O, 5) weights w s.t. y(t) = Σ_c w_c · stack_c.

    Expansion of the Horner quartic in dopri5_interp_eval by source:
    checked at x=0 → y0 and x=1 → y1.
    """
    x2 = x * x
    x3 = x2 * x
    x4 = x3 * x
    w_y0 = -8.0 * x4 + 18.0 * x3 - 11.0 * x2 + 1.0
    w_y1 = -8.0 * x4 + 14.0 * x3 - 5.0 * x2
    w_ym = 16.0 * x4 - 32.0 * x3 + 16.0 * x2
    w_f0 = dt * (-2.0 * x4 + 5.0 * x3 - 4.0 * x2 + x)
    w_f1 = dt * (2.0 * x4 - 3.0 * x3 + x2)
    return jnp.stack([w_y0, w_y1, w_ym, w_f0, w_f1], axis=-1)


def tsit5_interp_stack(state):
    """Stack y0 and the 7 stages to an (8, *shape) leaf each."""
    return tree_map(lambda y0, k: jnp.concatenate([y0[None], k], axis=0),
                    state["y0"], state["k"])


def tsit5_interp_weights(x, dt):
    """(O,) x, dt → (O, 8): [1, dt·b_1(x), …, dt·b_7(x)]."""
    b = _tsit5_b_coeffs(x)  # (7, O)
    ones = jnp.ones_like(x)[None]
    return jnp.concatenate([ones, dt[None] * b], axis=0).T


def linear_interp(t0, t1, y0, y1, t):
    """Linear interpolation used by fixed-grid solvers (solvers.py:104-108)."""
    dt = t1 - t0
    slope_denom = jnp.where(dt == 0, 1.0, dt)
    x = (t - t0) / slope_denom
    return tree_map(lambda a, b: a + (b - a) * x.astype(a.dtype), y0, y1)
