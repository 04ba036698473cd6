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
import jax.numpy as jnp
import numpy as np


def to_cpu(tree):
    """Copy a pytree to the CPU backend (jax.default_device only steers
    *uncommitted* data — arrays already living on the TPU must be moved
    explicitly, or the probe compiles on the TPU after all)."""
    cpu = jax.devices("cpu")[0]
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, cpu), tree)


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
               for l in jax.tree_util.tree_leaves(tree))


def scan_train_bytes(method: str, max_steps: int, y_state,
                     n_obs: int = 0, max_order: int = 12) -> int:
    """Accelerator-memory footprint of ONE differentiable bounded-scan solve
    inside a train step, derived from the actual solve shapes (not calibrated
    constants): per scan iteration the forward emits the dense-output interval
    state (the method's interp leaves, whose cotangent buffer materializes again
    in the backward) and the rematerialized backward saves the scan carry
    (y, f). ``y_state`` is the ODE state as an array or jax.ShapeDtypeStruct —
    e.g. (n, hidden) for NDCN.

    Validated against jax.jit(...).lower().compile().memory_analysis() on CPU
    (tests/test_data_and_experiments.py): estimate/measured ~= 0.9 for dopri5.
    """
    from ndcn_tpu.ode import adaptive

    y_sds = jax.eval_shape(lambda x: x, y_state)
    y_b = _tree_bytes(y_sds)
    if method in ("dopri5", "tsit5"):
        m = {"dopri5": adaptive.DOPRI5_METHOD,
             "tsit5": adaptive.TSIT5_METHOD}[method]
        interp_b = _tree_bytes(jax.eval_shape(m.interp_init, y_sds))
        # emitted interp buffers + saved carry (y, f, interp) per iteration
        return max_steps * (2 * interp_b + 2 * y_b)
    if method == "adams":
        # vcabm carry: prev_f + phi histories (H = max_order+1 each) + y,
        # saved per iteration, plus the per-step observation emission and its
        # backward cotangent (the solution buffer itself is scattered once
        # after the scan — it no longer rides in the carry)
        H = max_order + 1
        return max_steps * (2 * H + 3) * y_b
    # fixed-grid methods: one pass over the grid, carry saved per grid point
    return 2 * max(n_obs, 2) * y_b


def accelerator_memory_limit(default: int = 16 << 30) -> int:
    """The current default device's memory capacity in bytes (HBM on TPU),
    from memory_stats when the backend reports it."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return int(stats.get("bytes_limit", default))
    except Exception:
        return default


def probe_step_budget(solve_nondiff: Callable[[], "object"],
                      floor: int = 16, headroom: float = 4.0,
                      slack: int = 8, quantum: int = 8) -> int:
    """Run ``solve_nondiff`` (returning SolveStats) on CPU; size the scan budget.

    ``solve_nondiff`` must close over CPU-resident inputs (see ``to_cpu``).
    budget = clip(headroom * attempts + slack, floor, ∞), rounded up to
    ``quantum``. The defaults are deliberately conservative — right when
    exhaustion mid-run just wastes the run. A caller that can RECOVER from
    exhaustion (the dynamics driver rolls back to its last good snapshot and
    regrows the budget) should pass snug values instead, e.g.
    ``floor=8, headroom=2.5, slack=4, quantum=4`` (the values the drivers
    converged on — headroom below ~2 makes rollback a routine event rather
    than rare insurance). With in-loop rollback-and-regrow wired in
    (train/elastic.py, as examples/large_graph.py does) even
    ``headroom=1.5, slack=2`` is safe: frozen scan iterations cost real time
    every step, so the snug budget is the single biggest trainer-throughput
    lever (see module docstring).
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        stats = solve_nondiff()
    attempts = int(stats.n_accepted) + int(stats.n_rejected)
    budget = max(floor, int(headroom * attempts) + slack)
    return -(-budget // quantum) * quantum


def probe_step_budget_multi(solves, floor: int = 16, headroom: float = 4.0,
                            slack: int = 8, quantum: int = 8) -> int:
    """Size one shared budget from SEVERAL probe solves — the max attempts
    over all of them, then the usual headroom formula.

    For vmapped replica sweeps: a batched solve cannot roll back a single
    replica, and one replica's init can need more step attempts than another's
    (the step controller reacts to the initial dynamics the random weights
    produce). Sizing from a single probe seed makes the budget a bet on that
    seed being the hardest; probing a handful of the ACTUAL replica inits and
    taking the max makes the bet explicit and cheap (CPU compiles share one
    cache entry across same-shaped probes)."""
    cpu = jax.devices("cpu")[0]
    attempts = 0
    with jax.default_device(cpu):
        for solve in solves:
            stats = solve()
            attempts = max(attempts,
                           int(stats.n_accepted) + int(stats.n_rejected))
    budget = max(floor, int(headroom * attempts) + slack)
    return -(-budget // quantum) * quantum


def probe_step_budget_each(solves, floor: int = 16, headroom: float = 4.0,
                           slack: int = 8, quantum: int = 8) -> list:
    """Per-probe budgets (same formula as ``probe_step_budget``), one per
    solve. Feed to ``bucket_budgets`` to split a replica sweep into a few
    vmapped programs instead of sizing every replica for the hardest init —
    a frozen scan slot costs real time in EVERY replica of the batch (the
    batched cond degrades to select), so the all-shared budget taxes easy
    replicas by the hardest one's slack."""
    cpu = jax.devices("cpu")[0]
    budgets = []
    with jax.default_device(cpu):
        for solve in solves:
            stats = solve()
            attempts = int(stats.n_accepted) + int(stats.n_rejected)
            b = max(floor, int(headroom * attempts) + slack)
            budgets.append(-(-b // quantum) * quantum)
    return budgets


def bucket_budgets(budgets, max_buckets: int) -> list:
    """Group replica indices by budget into at most ``max_buckets`` groups.

    Returns [(budget, np.ndarray indices)] sorted by budget ascending. When
    there are more distinct budgets than buckets, the smallest groups merge
    UPWARD into the next larger budget (a larger budget is always correct,
    merely slower), keeping the boundary between the cheapest replicas and
    the expensive tail."""
    budgets = np.asarray(budgets)
    uniq = sorted(set(int(b) for b in budgets))
    while len(uniq) > max(1, max_buckets):
        # merge the adjacent pair that adds the fewest wasted scan slots
        # (promoting budget lo -> hi costs count[lo] * (hi - lo) frozen slots)
        counts = {u: int((budgets == u).sum()) for u in uniq}
        i = min(range(len(uniq) - 1),
                key=lambda j: counts[uniq[j]] * (uniq[j + 1] - uniq[j]))
        lo, hi = uniq[i], uniq[i + 1]
        budgets = np.where(budgets == lo, hi, budgets)
        uniq = sorted(set(int(b) for b in budgets))
    return [(u, np.flatnonzero(budgets == u)) for u in uniq]
