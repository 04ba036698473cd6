"""Periodic checkpoint / resume.

The reference has no resume at all — it appends state_dicts into an in-memory
results dict and saves once at the end (heat_dynamics.py:363,434-438; SURVEY.md §5).
This module adds real training checkpointing: atomically written, step-stamped
snapshots of (params, opt_state, step, extra) with latest-k retention and a
one-call resume.

Format: a pickle of the host-transferred pytree. Orbax is available on this image
but its API churns across versions; a self-contained format keeps checkpoints
loadable forever and is plenty at this framework's state sizes (≤ a few MB).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

from ndcn_tpu.utils.io import atomic_write

_CKPT_RE = re.compile(r"ckpt_(\d+)\.pkl$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda l: np.asarray(l), tree)


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state=None,
                    extra: Optional[Dict[str, Any]] = None, keep: int = 3) -> str:
    """Atomically write ckpt_{step}.pkl and prune to the newest ``keep``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "step": int(step),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "extra": extra or {},
    }
    path = os.path.join(ckpt_dir, f"ckpt_{int(step):08d}.pkl")
    atomic_write(path, pickle.dumps(payload))

    steps = sorted(all_checkpoint_steps(ckpt_dir))
    for old in steps[:-keep] if keep else []:
        os.unlink(os.path.join(ckpt_dir, f"ckpt_{old:08d}.pkl"))
    return path


def all_checkpoint_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    return [int(m.group(1)) for name in os.listdir(ckpt_dir)
            if (m := _CKPT_RE.match(name))]


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    steps = all_checkpoint_steps(ckpt_dir)
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"ckpt_{max(steps):08d}.pkl")


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_or_init(ckpt_dir: Optional[str], params, opt_state):
    """Resume from the newest checkpoint if one exists; else return the inputs.

    Restored leaves adopt the structure of the provided templates (so device
    placement / dtypes follow the fresh initialization).
    """
    params, opt_state, step, _ = restore_with_extra(ckpt_dir, params, opt_state)
    return params, opt_state, step


def restore_with_extra(ckpt_dir: Optional[str], params, opt_state):
    """restore_or_init that also hands back the checkpoint's ``extra`` dict
    (drivers stash their rng key / accumulated result rows there so a resumed
    run replays the exact trajectory the killed run would have taken)."""
    if not ckpt_dir:
        return params, opt_state, 0, {}
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return params, opt_state, 0, {}
    payload = load_checkpoint(path)

    def adopt(template, stored):
        return jax.tree_util.tree_map(lambda tpl, s: jax.numpy.asarray(s, tpl.dtype),
                                      template, stored)

    params = adopt(params, payload["params"])
    if payload["opt_state"] is not None and opt_state is not None:
        opt_state = adopt(opt_state, payload["opt_state"])
    print(f"[checkpoint] resumed from {path} (step {payload['step']})")
    return params, opt_state, payload["step"], payload.get("extra", {})
