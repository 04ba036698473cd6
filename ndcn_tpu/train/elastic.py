"""Elastic step-budget recovery for snug adaptive-solve budgets.

The differentiable solver path runs a bounded ``lax.scan`` whose cost is linear
in ``max_steps`` even after the solve completes (frozen iterations still copy
the carry), so trainer throughput wants the budget snug — but a budget the
training trajectory outgrows poisons the loss to NaN (the solvers flag
``success=False`` and the drivers' loss functions propagate that loudly,
mirroring the reference's max_num_steps assert,
/root/reference/torchdiffeq/_impl/dopri5.py:89).

``ElasticBudget`` makes the snug choice safe: the driver snapshots
``(cursor, rng, train state)`` at every finite-loss boundary; when the loss
goes NaN under an auto-sized budget it rolls back to the snapshot, doubles the
budget, recompiles its step functions, and deterministically replays the lost
iterations (same rng stream). After ``max_retries`` doublings a persistent NaN
is genuine divergence, not exhaustion, and the driver aborts with advice.

Snapshots are DEVICE-side copies: the drivers donate their train-state buffers
into each jitted step, so a kept reference would die with the donation, and a
host copy pays a device->host round trip (~tens of ms through a TPU tunnel)
per boundary. A jitted identity-copy allocates fresh HBM buffers instead
(microseconds at these model sizes).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np


_copy_jit = None


def device_copy(tree):
    """Fresh device buffers holding the same values (survives donation of the
    originals; without donate_argnums jit outputs never alias inputs).

    The jitted identity is cached at module level: a fresh ``jax.jit`` wrapper
    per call would retrace — and recompile through the TPU tunnel — on every
    snapshot."""
    import jax

    global _copy_jit
    if _copy_jit is None:
        _copy_jit = jax.jit(
            lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))
    return _copy_jit(tree)


class ElasticBudget:
    """Rollback-and-regrow controller for an auto-sized adaptive step budget.

    Usage (driver loop)::

        elastic = ElasticBudget(max_steps, enabled=budget_is_auto)
        elastic.snapshot(cursor, rng, (params, opt_state))
        ...
        if elastic.exhausted(loss):         # NaN under an auto budget
            cursor, rng, (params, opt_state) = elastic.rollback()
            fns = build_fns(elastic.max_steps)   # recompile, then continue
        else:
            elastic.snapshot(cursor, rng, (params, opt_state))
    """

    def __init__(self, max_steps: int, enabled: bool = True,
                 max_retries: int = 3):
        self.max_steps = max_steps
        self.enabled = enabled
        self.max_retries = max_retries
        self.retries = 0          # consecutive failed doublings (resets)
        self.total_rollbacks = 0  # cumulative, for reporting
        self._snap = None
        self._rollback_cursor = None

    def snapshot(self, cursor: Any, rng: Any, state: Any,
                 copy: bool = True) -> None:
        """Record a finite-loss restore point. ``copy=False`` takes ownership
        of ``state`` (caller already device-copied it — don't copy twice).

        A snapshot strictly past the last rollback point means that recovery
        succeeded: the retry counter resets, so ``max_retries`` bounds
        CONSECUTIVE failed doublings (genuine divergence), not total
        recoveries over a long run whose trajectory complexity grows."""
        if self.enabled:
            if (self._rollback_cursor is not None
                    and cursor > self._rollback_cursor):
                self.retries = 0
                self._rollback_cursor = None
            self._snap = (cursor, rng, device_copy(state) if copy else state)

    def exhausted(self, loss) -> bool:
        """True when recovery should fire: any non-finite value in ``loss``
        (a scalar or a stats vector — eval metrics share the snug budget and
        must be monitored too, not just the train loss)."""
        return self.enabled and not bool(np.all(np.isfinite(np.asarray(loss))))

    def rollback(self) -> Tuple[Any, Any, Any]:
        """Double the budget; return the snapshot ``(cursor, rng, state)``.

        The returned state is a fresh copy — the retained snapshot survives a
        second rollback if the doubled budget is still short."""
        if self.retries >= self.max_retries:
            raise SystemExit(
                f"training loss is NaN even at max_steps={self.max_steps} "
                f"({self.max_retries} budget doublings) — this is divergence, "
                f"not step-budget exhaustion; lower --lr or loosen rtol/atol")
        self.retries += 1
        self.total_rollbacks += 1
        self.max_steps *= 2
        cursor, rng, state = self._snap
        self._rollback_cursor = cursor
        return cursor, rng, device_copy(state)
