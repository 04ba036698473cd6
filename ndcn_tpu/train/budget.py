"""Automatic adaptive-step budgets for the differentiable solver path.

The training-path solver runs a bounded lax.scan of ``max_steps`` attempts;
iterations after the solve completes are cond-skipped but still cost a carry
copy (~0.45 ms each on v5e for cora-sized states). A snug budget is the single
biggest trainer-throughput lever, so experiments probe the solve once at
initialization — on the CPU backend, where compiles are cheap — and size the
budget with headroom. Exhaustion during training surfaces as a NaN loss (the
solvers flag success=False), never as silently wrong trajectories.
"""

from __future__ import annotations

from typing import Callable

import jax


def to_cpu(tree):
    """Copy a pytree to the CPU backend (jax.default_device only steers
    *uncommitted* data — arrays already living on the TPU must be moved
    explicitly, or the probe compiles on the TPU after all)."""
    cpu = jax.devices("cpu")[0]
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, cpu), tree)


def probe_step_budget(solve_nondiff: Callable[[], "object"],
                      floor: int = 16, headroom: float = 4.0,
                      slack: int = 8) -> int:
    """Run ``solve_nondiff`` (returning SolveStats) on CPU; size the scan budget.

    ``solve_nondiff`` must close over CPU-resident inputs (see ``to_cpu``).
    budget = clip(headroom * attempts + slack, floor, ∞), rounded up to 8.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        stats = solve_nondiff()
    attempts = int(stats.n_accepted) + int(stats.n_rejected)
    budget = max(floor, int(headroom * attempts) + slack)
    return -(-budget // 8) * 8
