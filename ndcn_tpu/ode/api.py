"""Public odeint API.

Mirrors the reference seam every model crosses
(/root/reference/torchdiffeq/_impl/odeint.py:20-76):

    odeint(func, y0, t, rtol=1e-7, atol=1e-9, method=None, options=None)

- ``func(t, y) -> dy/dt`` over arbitrary pytrees (a bare array works too).
- ``t`` is a 1-D, strictly monotone time grid; the solution carries a new leading
  time axis with solution[0] == y0. Decreasing grids are handled by negating time
  and the RHS (misc.py:184-187); this requires a concrete (host) ``t``.
- default method is dopri5 with rtol=1e-7 / atol=1e-9 (odeint.py:20,68-69).

Extra TPU-native options (all static):
- ``differentiable`` (default True): adaptive methods use the bounded
  reverse-differentiable scan; set False for minimal-FLOP while_loop inference.
- ``max_steps``: step-attempt budget (scan length for the differentiable path).
- ``first_step``: honoured as given. (Deliberate fix of a reference quirk: there a
  caller-provided first_step is ignored and 0.01 used instead, dopri5.py:81-82.)
- ``emission_dtype`` (adaptive, scan path): store dense-output emission buffers
  (and their cotangents) in e.g. bf16 — the dominant training residual at
  scale; solver steps are unaffected (full-precision carry).
- ``emission_readout`` (adaptive, scan path): a LINEAR state→observable map
  contracted through the emitted coefficients, so the returned "solution" is
  the (much smaller) readout trajectory and the full state trajectory never
  materializes. Exact: linearity commutes with dense-output interpolation.

``odeint_with_stats`` additionally returns SolveStats (NFE / accepted / rejected /
success) — first-class NFE accounting, carried in the solver state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.ode import adaptive, fixed_adams, fixed_grid, vcabm
from ndcn_tpu.ode.step_control import Controller

_ADAPTIVE = {
    "dopri5": adaptive.DOPRI5_METHOD,
    "tsit5": adaptive.TSIT5_METHOD,
}

SOLVERS = ("dopri5", "tsit5", "euler", "midpoint", "rk4",
           "explicit_adams", "fixed_adams", "adams")

_DEFAULT_MAX_STEPS_SCAN = 256
_DEFAULT_MAX_STEPS_WHILE = 1 << 16

# recognized per-method option keys (reference warns on unexpected kwargs,
# misc.py:79-81; a typo'd option silently ignored is a debugging trap)
_COMMON_OPTIONS = {"differentiable", "max_steps"}
_METHOD_OPTIONS = {
    "dopri5": _COMMON_OPTIONS | {"safety", "ifactor", "dfactor", "first_step",
                                 "time_dtype", "emission_dtype", "emission_readout"},
    "tsit5": _COMMON_OPTIONS | {"safety", "ifactor", "dfactor", "first_step",
                                "time_dtype", "reference_weights",
                                "emission_dtype", "emission_readout"},
    # fixed-grid/fixed-order methods accept (and ignore) the common options so
    # method-agnostic callers like ode_block can pass one options dict
    "euler": _COMMON_OPTIONS | {"step_size"},
    "midpoint": _COMMON_OPTIONS | {"step_size"},
    "rk4": _COMMON_OPTIONS | {"step_size"},
    "explicit_adams": _COMMON_OPTIONS | {"max_order", "max_iters"},
    "fixed_adams": _COMMON_OPTIONS | {"max_order", "max_iters"},
    "adams": _COMMON_OPTIONS | {"max_order", "time_dtype", "safety",
                                "ifactor", "dfactor"},
}


def _check_options(method: str, options: Dict[str, Any]) -> None:
    unknown = set(options) - _METHOD_OPTIONS[method]
    if unknown:
        import warnings

        warnings.warn(f"{method}: unexpected options {sorted(unknown)} "
                      f"(recognized: {sorted(_METHOD_OPTIONS[method])})")


def _canonical_time(t):
    tdtype = jnp.result_type(jnp.asarray(t).dtype, jnp.float32)
    return jnp.asarray(t, tdtype)


def _maybe_reverse(func, y0, t):
    """Reverse-time handling (misc.py:184-187): integrate s = -t forward.

    Concrete grids are validated on the host (strictly monotone, like the
    reference's assert at misc.py:59-60). A traced grid (t passed through jit)
    cannot be inspected, so the direction is handled *symbolically*: integrate
    s = sign·t with the RHS scaled by sign — correct for either direction, at
    the cost of one scalar multiply per RHS eval. Strict monotonicity of a
    traced grid remains the caller's contract.
    """
    t = _canonical_time(t)
    if t.ndim != 1 or t.shape[0] < 2:
        raise ValueError("t must be a 1-D grid with at least 2 points")
    if isinstance(t, jax.core.Tracer):
        base = func
        sign = jnp.where(t[-1] >= t[0], jnp.ones((), t.dtype),
                         -jnp.ones((), t.dtype))
        scaled = (lambda s, y: jax.tree_util.tree_map(
            lambda v: v * sign, base(sign * s, y)))
        return scaled, sign * t, False
    t_host = np.asarray(jax.device_get(t))
    if np.all(t_host[1:] < t_host[:-1]):
        base = func
        return (lambda s, y: jax.tree_util.tree_map(jnp.negative, base(-s, y))), -t, True
    if not np.all(t_host[1:] > t_host[:-1]):
        raise ValueError("t must be strictly increasing or decreasing")
    return func, t, False


def odeint_with_stats(func: Callable, y0, t, rtol: float = 1e-7, atol: float = 1e-9,
                      method: Optional[str] = None,
                      options: Optional[Dict[str, Any]] = None):
    """Solve dy/dt = func(t, y); returns (solution, SolveStats)."""
    if options is None:
        options = {}
    elif method is None:
        raise ValueError("cannot supply `options` without specifying `method`")
    if method is None:
        method = "dopri5"
    if method not in SOLVERS:
        raise ValueError(f"unknown method {method!r}; choose from {SOLVERS}")
    _check_options(method, options)

    func, t, _ = _maybe_reverse(func, y0, t)

    if method in _ADAPTIVE:
        # time_dtype="float64" matches the reference's f64 time scalars inside
        # adaptive solvers (solvers.py:28); needs jax x64 enabled (CPU parity
        # runs). State dtype is unaffected — controller/step arithmetic widens.
        if options.get("time_dtype") is not None:
            t = t.astype(options["time_dtype"])
        ctrl = Controller(rtol=float(rtol), atol=float(atol),
                          safety=float(options.get("safety", 0.9)),
                          ifactor=float(options.get("ifactor", 10.0)),
                          dfactor=float(options.get("dfactor", 0.2)),
                          order=5)
        differentiable = bool(options.get("differentiable", True))
        first_step = options.get("first_step")
        m = _ADAPTIVE[method]
        if method == "tsit5" and options.get("reference_weights"):
            # bit-compatibility mode: the reference's (non-converging) tsit5
            # error weights (tsit5.py:17-26) — see tableaux.py
            m = adaptive.TSIT5_REFERENCE_METHOD
        if differentiable:
            max_steps = int(options.get("max_steps", _DEFAULT_MAX_STEPS_SCAN))
            return adaptive.solve_scan(
                m, func, y0, t, ctrl, max_steps=max_steps,
                first_step=first_step,
                emission_dtype=options.get("emission_dtype"),
                emission_readout=options.get("emission_readout"))
        max_steps = int(options.get("max_steps", _DEFAULT_MAX_STEPS_WHILE))
        return adaptive.solve_while(m, func, y0, t, ctrl,
                                    max_steps=max_steps, first_step=first_step)

    if method in ("euler", "midpoint", "rk4"):
        step_fn = fixed_grid.STEP_FUNCS[method]
        return fixed_grid.solve_fixed_grid(step_fn, func, y0, t,
                                           step_size=options.get("step_size"))

    if method in ("explicit_adams", "fixed_adams"):
        return fixed_adams.solve_fixed_adams(
            func, y0, t,
            implicit=(method == "fixed_adams"),
            max_order=int(options.get("max_order", 12)),
            max_iters=int(options.get("max_iters", 4)))

    # method == "adams": variable-coefficient adaptive-order ABM
    # time_dtype="float64" matches the reference's f64 time scalars
    # (solvers.py:28); requires jax.experimental.enable_x64() (CPU parity runs)
    time_dtype = options.get("time_dtype")
    ctrl_kw = dict(safety=float(options.get("safety", 0.9)),
                   ifactor=float(options.get("ifactor", 10.0)),
                   dfactor=float(options.get("dfactor", 0.2)))
    if bool(options.get("differentiable", True)):
        return vcabm.solve_vcabm_scan(
            func, y0, t, rtol=float(rtol), atol=float(atol),
            max_order=int(options.get("max_order", 12)),
            max_steps=int(options.get("max_steps", _DEFAULT_MAX_STEPS_SCAN)),
            time_dtype=time_dtype, **ctrl_kw)
    return vcabm.solve_vcabm(func, y0, t, rtol=float(rtol), atol=float(atol),
                             max_order=int(options.get("max_order", 12)),
                             max_steps=int(options.get("max_steps",
                                                       _DEFAULT_MAX_STEPS_WHILE)),
                             time_dtype=time_dtype, **ctrl_kw)


def odeint(func: Callable, y0, t, rtol: float = 1e-7, atol: float = 1e-9,
           method: Optional[str] = None, options: Optional[Dict[str, Any]] = None):
    """Solve dy/dt = func(t, y) over t; solution has a leading time axis.

    Budget exhaustion (adaptive step count > max_steps) must be loud even
    though this seam discards SolveStats: the trajectory is poisoned with NaN,
    the compiled-program analogue of the reference's max_num_steps assert
    (dopri5.py:89). Callers who want to branch on failure instead should use
    ``odeint_with_stats`` and check ``stats.success``.
    """
    sol, stats = odeint_with_stats(func, y0, t, rtol=rtol, atol=atol,
                                   method=method, options=options)
    return jax.tree_util.tree_map(
        lambda b: jnp.where(stats.success, b, jnp.nan), sol)
