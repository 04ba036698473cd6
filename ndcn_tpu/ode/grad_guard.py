"""Gradient guard for branch-free adaptive step attempts.

Reverse-mode AD cannot traverse a step attempt whose internals hold inf/NaN:
every op VJP multiplies cotangents by primal values, so even an exactly-zero
cotangent into a poisoned RHS stage yields 0·inf = NaN, which then ADDS into
the carry's cotangent and destroys d(loss)/d(params) for the whole solve —
while the forward pass is perfectly healthy (the poisoned attempt was
rejected and its emissions masked). Verified: dy/dt = s·eʸ with an oversized
first step trains NaN without this guard while its forward is finite and
accurate.

``guard_attempt(attempt, fallback, example)`` wraps ``attempt`` in a
``jax.custom_vjp`` whose backward switches on the attempt's own finite flag:

- finite internals  → the real VJP (full reference gradient semantics —
  backprop through the controller, including ordinary rejected steps,
  /root/reference/torchdiffeq/_impl/misc.py:160-170);
- poisoned internals → the VJP of ``fallback``, which must reproduce the
  forced-reject primal EXACTLY (state passthrough, dt ← dt·dfactor, zero
  emission) with NO RHS call on the tape — the exact local linearization of
  what the step actually did, so e.g. the dt chain keeps its true dfactor
  sensitivity while the attempt's captured params receive exactly zero.

Contract: ``attempt(x)`` and ``fallback(x)`` return pytrees of equal
structure whose LAST element (via tuple indexing ``out[-1]``) is a 0/1
float scalar finite flag; all leaves of ``x`` and of the outputs must be
inexact (float) — carry integers/bools through ``float_view`` /
``unfloat_view`` (float0 cotangents are not valid ``lax.cond`` operands).
The attempt may close over traced values (model params — the very things
being differentiated): both branches go through ``jax.closure_convert`` and
their captured tracers ride as explicit custom_vjp arguments.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def all_finite(*trees) -> jnp.ndarray:
    """Scalar bool: every leaf of every tree is finite."""
    leaves = jax.tree_util.tree_leaves(trees)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def float_view(tree):
    """Cast integer/bool leaves to f32 so every leaf has a real cotangent.

    Counters must stay below 2^24 for the round trip to be exact — true by
    orders of magnitude for step/observation counts."""
    return jax.tree_util.tree_map(
        lambda l: l.astype(jnp.float32)
        if not jnp.issubdtype(l.dtype, jnp.inexact) else l, tree)


def unfloat_view(tree_f, template):
    """Inverse of float_view, restoring the template's leaf dtypes."""
    return jax.tree_util.tree_map(
        lambda l, tm: l.astype(tm.dtype), tree_f, template)


def guard_attempt(attempt, fallback):
    """Wrap ``attempt`` with the poisoned-attempt gradient guard."""

    def guarded(x):
        attempt_c, a_consts = jax.closure_convert(attempt, x)
        fallback_c, f_consts = jax.closure_convert(fallback, x)
        return _guarded_call(attempt_c, fallback_c, x,
                             tuple(a_consts), tuple(f_consts))

    return guarded


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _guarded_call(attempt_c, fallback_c, x, a_consts, f_consts):
    return attempt_c(x, *a_consts)


def _guarded_call_fwd(attempt_c, fallback_c, x, a_consts, f_consts):
    out, vjp_attempt = jax.vjp(
        lambda r, ac, fc: attempt_c(r, *ac), x, a_consts, f_consts)
    _, vjp_fallback = jax.vjp(
        lambda r, ac, fc: fallback_c(r, *fc), x, a_consts, f_consts)
    finite = out[-1] > 0.5
    return out, (vjp_attempt, vjp_fallback, finite)


def _guarded_call_bwd(attempt_c, fallback_c, res, ct):
    vjp_attempt, vjp_fallback, finite = res
    return jax.lax.cond(finite, lambda c: vjp_attempt(c),
                        lambda c: vjp_fallback(c), ct)


_guarded_call.defvjp(_guarded_call_fwd, _guarded_call_bwd)
