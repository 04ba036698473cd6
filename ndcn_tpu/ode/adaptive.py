"""Adaptive Runge-Kutta integration (dopri5 / tsit5), TPU-native.

The reference advances one observation time at a time with a python ``while`` loop
around single steps (/root/reference/torchdiffeq/_impl/solvers.py:25-33,
dopri5.py:85-92) — interpreter-bound, one kernel launch per RHS eval. Here the whole
solve is a single compiled program, with two execution strategies sharing one step
function:

- ``solve_while``: a ``lax.while_loop`` that interleaves adaptive step attempts with
  observation-time consumption (dense-output interpolation). Minimal FLOPs; used for
  inference / ground-truth generation. Not reverse-differentiable (JAX cannot
  reverse an unbounded while_loop).

- ``solve_scan``: a bounded ``lax.scan`` over ``max_steps`` step attempts with
  masked freezing once the final time is reached. Fully reverse-differentiable —
  and, like the reference's default backprop-through-solver path, gradients flow
  through the step-size controller and rejected steps. Observation times are then
  evaluated by a vectorized searchsorted + gather over the per-step dense-output
  states.

Step-control semantics match the reference exactly (see step_control.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ndcn_tpu.ode import grad_guard
from ndcn_tpu.ode import interp as interp_lib
from ndcn_tpu.ode.runge_kutta import runge_kutta_step
from ndcn_tpu.ode.step_control import (Controller, accept_and_max_ratio,
                                       error_ratios, optimal_step_size,
                                       select_initial_step)
from ndcn_tpu.ode.tableaux import (DOPRI5, TSIT5, TSIT5_REFERENCE_WEIGHTS,
                                   Tableau)
from ndcn_tpu.ode.tree_math import tree_map, tree_where

# Matches the reference's initial-step-selection order argument (dopri5.py:81, a
# deliberate quirk: order 4 is passed for the 5th-order methods).
_INIT_STEP_ORDER = 4


@dataclasses.dataclass(frozen=True)
class AdaptiveMethod:
    name: str
    tableau: Tableau
    interp_init: Callable
    interp_make: Callable
    interp_eval: Callable
    interp_stack: Callable    # state pytree → (C, *shape)-stacked leaves
    interp_weights: Callable  # (x, dt) of shape (O,) → (O, C) scalar weights


DOPRI5_METHOD = AdaptiveMethod(
    name="dopri5",
    tableau=DOPRI5,
    interp_init=interp_lib.dopri5_interp_init,
    interp_make=interp_lib.dopri5_interp_state,
    interp_eval=interp_lib.dopri5_interp_eval,
    interp_stack=interp_lib.dopri5_interp_stack,
    interp_weights=interp_lib.dopri5_interp_weights,
)

TSIT5_METHOD = AdaptiveMethod(
    name="tsit5",
    tableau=TSIT5,
    interp_init=interp_lib.tsit5_interp_init,
    interp_make=interp_lib.tsit5_interp_state,
    interp_eval=interp_lib.tsit5_interp_eval,
    interp_stack=interp_lib.tsit5_interp_stack,
    interp_weights=interp_lib.tsit5_interp_weights,
)


# Compatibility method for odeint(..., options={"reference_weights": True}):
# identical solver, the REFERENCE'S (non-converging) tsit5 error weights — see
# tableaux.TSIT5_REFERENCE_WEIGHTS.
TSIT5_REFERENCE_METHOD = dataclasses.replace(TSIT5_METHOD,
                                             tableau=TSIT5_REFERENCE_WEIGHTS)


class SolveStats(NamedTuple):
    nfe: jnp.ndarray          # number of RHS evaluations
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    success: jnp.ndarray      # all observation times reached within max_steps


def _n_new_evals(tableau: Tableau) -> int:
    return len(tableau.alpha)  # f0 is reused from the previous step (FSAL)


_all_finite = grad_guard.all_finite


def _attempt_step_core(method: AdaptiveMethod, func, rk, ctrl: Controller,
                       tdtype):
    """One accept-or-reject adaptive step, branch-free, interp-free carry.

    ``rk`` carries the reference's ``_RungeKuttaState`` fields (rk_common.py:8)
    minus the interp state: y/f at t1, the last accepted interval ends, the
    proposed next dt. Returns (updated base state, this attempt's interp state,
    this attempt's interval ends, accept, finite).

    An attempt whose internals (any RK stage, the trial state, or the error
    estimate) are non-finite is ALWAYS rejected with dt_next = dt·dfactor
    (maximal shrink), whatever the error ratio claims: an overflowed stage can
    cancel out of the b-combination, and growing dt off a garbage "small
    error" would livelock the controller. The reference assert-crashes in this
    regime instead (dopri5.py:100-102); shrink-and-retry is the recoverable
    version of that guard.
    """
    y1, f1, y1_error, k = runge_kutta_step(func, rk["y"], rk["f"], rk["t1"], rk["dt"],
                                           method.tableau)
    finite = _all_finite(y1, f1, y1_error, k)
    ratios = error_ratios(y1_error, rk["y"], y1, ctrl.rtol, ctrl.atol, tdtype)
    accept, max_ratio = accept_and_max_ratio(ratios)
    accept = accept & finite
    dt_next = jnp.where(finite, optimal_step_size(rk["dt"], max_ratio, ctrl),
                        rk["dt"] * ctrl.dfactor)
    new_interp = method.interp_make(rk["y"], y1, k, rk["dt"])
    att_t0, att_t1 = rk["t1"], rk["t1"] + rk["dt"]

    base = dict(
        y=tree_where(accept, y1, rk["y"]),
        f=tree_where(accept, f1, rk["f"]),
        t0=jnp.where(accept, att_t0, rk["t0"]),
        t1=jnp.where(accept, att_t1, rk["t1"]),
        dt=dt_next,
    )
    return base, new_interp, (att_t0, att_t1), accept, finite


def _attempt_step(method: AdaptiveMethod, func, rk, ctrl: Controller, tdtype):
    """While-loop variant: the carry keeps the last ACCEPTED interp state (the
    obs-consumption branch interpolates from it)."""
    base = {k: v for k, v in rk.items() if k != "interp"}
    base, new_interp, _, accept, _ = _attempt_step_core(method, func, base,
                                                        ctrl, tdtype)
    out = dict(base, interp=tree_where(accept, new_interp, rk["interp"]))
    return out, accept


def _init_rk_state(method, func, y0, t0, ctrl, first_step, tdtype):
    f0 = func(t0, y0)
    if first_step is None:
        dt0 = select_initial_step(func, t0, y0, _INIT_STEP_ORDER, ctrl.rtol, ctrl.atol,
                                  f0, tdtype)
        nfe0 = 2
    else:
        dt0 = jnp.asarray(first_step, tdtype)
        nfe0 = 1
    rk = dict(y=y0, f=f0, t0=t0, t1=t0, dt=dt0, interp=method.interp_init(y0))
    return rk, jnp.asarray(nfe0, jnp.int32)


# ------------------------------------------------------------------ while_loop path


def solve_while(method: AdaptiveMethod, func, y0, t, ctrl: Controller,
                max_steps: int = 1 << 16, first_step: Optional[float] = None):
    """Non-differentiable minimal-FLOP solve. Returns (solution, SolveStats).

    solution: pytree with a leading time axis of len(t); solution[0] == y0.
    """
    T = t.shape[0]
    tdtype = t.dtype
    rk0, nfe0 = _init_rk_state(method, func, y0, t[0], ctrl, first_step, tdtype)
    # The solution buffer is FLATTENED per leaf: (T, numel), not (T, *shape).
    # It rides the while carry through a lax.cond join that copies it every
    # iteration, and a small minor dim in the 128-lane position pads the
    # buffer 128/d x under the TPU's (8, 128) tiling — at 200k nodes x d=20
    # the padded (T, n, d) buffer copies cost ~330 ms per solve (measured:
    # flattening cut the while-path inference solve 581 -> ~290 ms), the
    # same layout lesson as the scan path's emissions.
    sol0 = tree_map(
        lambda y: jnp.zeros((T, y.size), y.dtype).at[0].set(y.reshape(-1)), y0)
    n_evals = _n_new_evals(method.tableau)

    carry0 = dict(rk=rk0, sol=sol0, obs_i=jnp.asarray(1, jnp.int32), nfe=nfe0,
                  nacc=jnp.asarray(0, jnp.int32), nrej=jnp.asarray(0, jnp.int32),
                  ok=jnp.asarray(True))

    def cond(c):
        within_budget = (c["nacc"] + c["nrej"]) < max_steps
        return (c["obs_i"] < T) & within_budget & c["ok"]

    def consume_obs(c):
        rk = c["rk"]
        t_obs = t[c["obs_i"]]
        y_obs = method.interp_eval(rk["interp"], rk["t0"], rk["t1"], t_obs)
        sol = tree_map(lambda buf, v: buf.at[c["obs_i"]].set(v.reshape(-1)),
                       c["sol"], y_obs)
        return dict(c, sol=sol, obs_i=c["obs_i"] + 1)

    def take_step(c):
        rk = c["rk"]
        # dt-underflow guard (reference asserts, dopri5.py:100): flag and stop.
        underflow = ~((rk["t1"] + rk["dt"]) > rk["t1"])
        rk_new, accept = _attempt_step(method, func, rk, ctrl, tdtype)
        return dict(
            c,
            rk=rk_new,
            nfe=c["nfe"] + n_evals,
            nacc=c["nacc"] + accept.astype(jnp.int32),
            nrej=c["nrej"] + (~accept).astype(jnp.int32),
            ok=c["ok"] & ~underflow,
        )

    def body(c):
        ready = t[c["obs_i"]] <= c["rk"]["t1"]
        return jax.lax.cond(ready, consume_obs, take_step, c)

    final = jax.lax.while_loop(cond, body, carry0)
    stats = SolveStats(nfe=final["nfe"], n_accepted=final["nacc"],
                       n_rejected=final["nrej"],
                       success=final["ok"] & (final["obs_i"] >= T))
    sol = tree_map(lambda buf, y: buf.reshape((T,) + y.shape), final["sol"], y0)
    return sol, stats


# ------------------------------------------------------------------------ scan path


def _make_guarded_attempt(method: AdaptiveMethod, func, ctrl: Controller,
                          tdtype, interp_zero, stack_fn):
    """A step attempt whose GRADIENT survives overflowing trial steps.

    Forward == the masked attempt (identical numbers); backward switches to
    the forced-reject linearization when the attempt's internals went
    non-finite — full rationale and contract in ode/grad_guard.py. Accept and
    finite ride as 0/1 floats (the guard requires all-inexact outputs).

    ``stack_fn`` maps the attempt's interp state to the emitted coefficient
    stack — method.interp_stack, optionally composed with a per-coefficient
    readout (see solve_scan's emission_readout).
    """

    def attempt(rk):
        base, interp_att, tts, accept, finite = _attempt_step_core(
            method, func, rk, ctrl, tdtype)
        stacked_flat = tree_map(lambda l, z: l.reshape(-1).astype(z.dtype),
                                stack_fn(interp_att), interp_zero)
        interp_out = tree_where(accept, stacked_flat, interp_zero)
        return (base, interp_out, tts, accept.astype(tdtype),
                finite.astype(tdtype))

    def fallback(rk):
        # exact primal of a forced-reject attempt, with NO func call on the
        # tape — its VJP is clean by construction (and returns materialized
        # zeros for the attempt's captured params: poisoned attempts
        # contribute exactly nothing to d(loss)/d(params))
        base = dict(y=rk["y"], f=rk["f"], t0=rk["t0"], t1=rk["t1"],
                    dt=rk["dt"] * ctrl.dfactor)
        tts = (rk["t1"], rk["t1"] + rk["dt"])
        zero = jnp.zeros((), tdtype)
        return (base, interp_zero, tts, zero, zero)

    return grad_guard.guard_attempt(attempt, fallback)


def solve_scan(method: AdaptiveMethod, func, y0, t, ctrl: Controller,
               max_steps: int = 256, first_step: Optional[float] = None,
               emission_dtype=None, emission_readout=None):
    """Reverse-differentiable bounded solve. Returns (solution, SolveStats).

    ``emission_readout``: optional LINEAR map from a state pytree to a (much
    smaller) observable, applied to each emitted dense-output coefficient
    INSIDE the scan body. Because both the interpolation and the readout are
    linear in the state, readout(interp(c)) == interp(readout(c)) EXACTLY —
    so neither the full solution trajectory (T × state) NOR the full-state
    emission buffers (S × C × state, the scan's dominant residual: 3.8 GB
    per direction for a 1M-node solve) ever materialize; the emissions and
    their backward cotangents shrink to S × C × readout and the returned
    "solution" is the readout trajectory (T, *readout_shape). Affine offsets
    must be added by the caller (a bias does not commute with interpolation).
    Ignored by the while path (no emissions there — apply the readout to its
    output instead).

    Runs exactly ``max_steps`` step attempts; iterations after the final time is
    reached are skipped via lax.cond (no RHS evals, frozen carry). Gradient
    semantics mirror the reference's default path: the whole step/controller
    arithmetic is on the tape (heat_dynamics.py:333 backprops through the solver).

    Each iteration emits its dense-output interval state plus an accept flag;
    after the scan, all observation times are evaluated by one vectorized
    searchsorted + gather over the emitted buffers (a running max of accepted
    end times makes rejected/frozen emissions unselectable). Each iteration is
    rematerialized in the backward pass, and — unlike a carried interp state —
    the emissions cost nothing per skipped iteration: the scan carry holds only
    (y, f) state leaves, so cond-skips copy 2 leaves instead of 7 and the
    backward saves 2 state leaves per step instead of 7.
    """
    tdtype = t.dtype
    t_final = t[-1]
    rk0, nfe0 = _init_rk_state(method, func, y0, t[0], ctrl, first_step, tdtype)
    interp0 = rk0.pop("interp")  # scan carry is interp-free (see docstring)
    n_evals = _n_new_evals(method.tableau)

    carry0 = dict(rk=rk0, nfe=nfe0, nacc=jnp.asarray(0, jnp.int32),
                  nrej=jnp.asarray(0, jnp.int32), ok=jnp.asarray(True))
    # Emissions are FLATTENED per leaf: (C, *shape) → (C·numel,). The scan
    # output then has a large minor dimension, so the TPU's (8, 128) tiling
    # pads it by ~nothing — emitting (S, C, n, d) with a small d in the
    # 128-lane minor position padded the buffer 6.4x at d=20 (11.4 GB instead
    # of 1.8 GB for a 200k-node solve: the exact shape the OOM dump showed).
    # ``emission_dtype`` (e.g. bf16) stores the emitted dense-output
    # coefficients — and their backward-pass cotangents — at half width: the
    # emission buffers are the scan's dominant residual at scale (S × C × n·d
    # each way; 3.8 GB per direction for a 1M-node solve), while the
    # observation readout accumulates in f32 below. ~4e-3 relative on
    # interpolated observations; solver STEPS are unaffected (the carry stays
    # full precision), so use it where the loss tolerates bf16 reads.
    if emission_readout is not None:
        # compose the readout into the emission itself (vmapped over the
        # coefficient axis): every emitted slot is readout-sized from birth
        def stack_fn(interp_att):
            return jax.vmap(emission_readout)(method.interp_stack(interp_att))
    else:
        stack_fn = method.interp_stack
    interp_tmpl = stack_fn(tree_map(jnp.zeros_like, interp0))
    if emission_dtype is not None:
        interp_tmpl = tree_map(lambda l: l.astype(emission_dtype), interp_tmpl)
    interp_zero = tree_map(lambda l: l.reshape(-1), interp_tmpl)
    guarded = _make_guarded_attempt(method, func, ctrl, tdtype, interp_zero,
                                    stack_fn)

    # Rematerialized per-iteration backward — but SAVE any value the model
    # tagged with checkpoint_name("ndcn_spmv") (the graph SpMV output,
    # models/ndcn.ode_func): its producer is the most expensive op in the
    # body (a Pallas kernel / gather+segment-sum at scale) while its residual
    # footprint is one (n, d) state per stage. Saving it means the backward
    # replays the cheap epilogue ops but never re-runs the forward SpMV —
    # measured 855 -> ~600 ms per 200k-node train step. Functions with no
    # tagged values save nothing (identical to plain jax.checkpoint).
    _policy = jax.checkpoint_policies.save_only_these_names("ndcn_spmv")

    @partial(jax.checkpoint, policy=_policy)
    def body_fn(c):
        done = (c["rk"]["t1"] >= t_final) | (~c["ok"])

        def frozen(c):
            t1 = c["rk"]["t1"]
            return c, dict(acc=jnp.asarray(False), t0=t1, t1=t1,
                           interp=interp_zero)

        def live(c):
            rk = c["rk"]
            underflow = ~((rk["t1"] + rk["dt"]) > rk["t1"])
            # the guarded attempt masks rejected emissions to zero (every
            # emitted slot participates in the dense-output matmul below;
            # 0-weight × non-finite = NaN) and cuts the backward through
            # overflowed internals — see _make_guarded_attempt
            base, interp_out, (att_t0, att_t1), acc_f, _ = guarded(rk)
            accept = acc_f > 0.5
            c = dict(c, rk=base, nfe=c["nfe"] + n_evals,
                     nacc=c["nacc"] + accept.astype(jnp.int32),
                     nrej=c["nrej"] + (~accept).astype(jnp.int32),
                     ok=c["ok"] & ~underflow)
            return c, dict(acc=accept, t0=att_t0, t1=att_t1, interp=interp_out)

        return jax.lax.cond(done, frozen, live, c)

    final, steps = jax.lax.scan(lambda c, _: body_fn(c), carry0, None,
                                length=max_steps)

    # Vectorized dense-output evaluation of all observation times > t[0].
    # Accepted end times are increasing; the running max over accepted-only t1
    # is non-decreasing with rejected/frozen slots pinned to -inf until the
    # first accept, so searchsorted lands exactly on the accepting iteration
    # whose interval covers each observation time. Only the interval-end
    # SCALARS are gathered; because both dense outputs are linear in their
    # stacked coefficients, all O observation values come from one
    # (O, S·C) × (S·C, ·) matmul per leaf — gathering the (S, C, *shape)
    # coefficient buffers themselves costs gigabytes of layout-churning copies
    # at batch (its VJP is a scatter-add), while the matmul's VJP is a matmul.
    t1_acc = jax.lax.cummax(jnp.where(steps["acc"], steps["t1"], -jnp.inf))
    idx = jnp.searchsorted(t1_acc, t[1:], side="left")
    idx = jnp.clip(idx, 0, max_steps - 1)
    t0g = steps["t0"][idx]
    dtg = steps["t1"][idx] - t0g
    x = (t[1:] - t0g) / jnp.where(dtg == 0, 1.0, dtg)
    w = method.interp_weights(x, dtg)                      # (O, C)
    sel = (idx[:, None] == jnp.arange(max_steps)[None, :])  # (O, S) one-hot
    w_full = (sel[:, :, None] * w[:, None, :]).reshape(t.shape[0] - 1, -1)

    def eval_leaf(buf, tmpl):  # buf (S, C·numel) flat; tmpl (C, *shape)
        flat = buf.reshape(buf.shape[0] * tmpl.shape[0], -1)
        # accumulate at least in f32 even for bf16 emissions (weights ride in
        # the buffer dtype — casting the huge buffer UP would materialize the
        # f32 copy the emission_dtype option exists to avoid)
        out = jnp.matmul(w_full.astype(buf.dtype), flat,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.promote_types(
                             buf.dtype, jnp.float32))
        return out.reshape((w_full.shape[0],) + tmpl.shape[1:])

    # with emission_readout the emitted buffers (and interp_tmpl) are already
    # readout-shaped — the same evaluation matmul serves both cases
    ys_obs = tree_map(eval_leaf, steps["interp"], interp_tmpl)
    y0_out = y0 if emission_readout is None else emission_readout(y0)
    sol = tree_map(lambda y, ys: jnp.concatenate([y[None], ys.astype(y.dtype)],
                                                 axis=0), y0_out, ys_obs)

    stats = SolveStats(nfe=final["nfe"], n_accepted=final["nacc"],
                       n_rejected=final["nrej"],
                       success=final["ok"] & (final["rk"]["t1"] >= t_final))
    return sol, stats
