"""Results-dict artifacts: dump / load / aggregate.

Keeps the reference's artifact schema (heat_dynamics.py:297-311, 390-438) so runs
remain comparable — keys 'args', 'v_iter', 'abs_error', 'rel_error', 'true_y',
'predict_y', 'abs_error2', 'rel_error2', 'predict_y2', 'model_state_dict',
'total_time' — but serialized as a numpy pickle (no torch dependency) and with
real periodic checkpointing on top (see train/checkpoint.py).
"""

from __future__ import annotations

import glob
import os
import pickle
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def new_results_dict(args: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "args": dict(args),
        "v_iter": [],
        "abs_error": [],
        "rel_error": [],
        "true_y": [],
        "predict_y": [],
        "abs_error2": [],
        "rel_error2": [],
        "predict_y2": [],
        "model_state_dict": [],
        "total_time": None,
    }


def record_eval(results: Dict[str, Any], itr: int, abs_error: float,
                rel_error: float, predict_y, params,
                abs_error2: Optional[float] = None,
                rel_error2: Optional[float] = None,
                predict_y2=None) -> None:
    results["v_iter"].append(int(itr))
    results["abs_error"].append(float(abs_error))
    results["rel_error"].append(float(rel_error))
    results["predict_y"].append(np.asarray(predict_y))
    results["model_state_dict"].append(
        jax.tree_util.tree_map(lambda l: np.asarray(l), params))
    if abs_error2 is not None:
        results["abs_error2"].append(float(abs_error2))
        results["rel_error2"].append(float(rel_error2))
        results["predict_y2"].append(np.asarray(predict_y2))


def dump_results(results: Dict[str, Any], path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(results, f)
    return path


def load_results(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def results_path(results_dir: str, baseline: str,
                 appendix: Optional[str] = None) -> str:
    appendix = appendix or time.strftime("%m%d-%H%M%S")
    return os.path.join(results_dir, f"result_{appendix}.{baseline}")


def summarize_directory(directory: str, suffix: str) -> Dict[str, Any]:
    """Aggregate final abs/rel errors across dump files (summarize_result.py:26-57).

    Returns mean/std for extrapolation and (when present) interpolation errors.
    """
    abs_err: List[float] = []
    rel_err: List[float] = []
    abs_err2: List[float] = []
    rel_err2: List[float] = []
    for filename in sorted(glob.glob(os.path.join(directory, f"*.{suffix}"))):
        r = load_results(filename)
        if not r.get("abs_error"):
            # a run that never reached a test_freq boundary dumps empty eval
            # lists; skip it instead of crashing the whole aggregation
            print(f"[summarize] skipping {filename}: no recorded evals")
            continue
        abs_err.append(r["abs_error"][-1])
        rel_err.append(r["rel_error"][-1])
        if r.get("abs_error2"):
            abs_err2.append(r["abs_error2"][-1])
            rel_err2.append(r["rel_error2"][-1])
    out: Dict[str, Any] = {
        "n_runs": len(abs_err),
        "abs_error_mean": float(np.mean(abs_err)) if abs_err else float("nan"),
        "abs_error_std": float(np.std(abs_err)) if abs_err else float("nan"),
        "rel_error_mean": float(np.mean(rel_err)) if rel_err else float("nan"),
        "rel_error_std": float(np.std(rel_err)) if rel_err else float("nan"),
    }
    if abs_err2:
        out.update({
            "abs_error2_mean": float(np.mean(abs_err2)),
            "abs_error2_std": float(np.std(abs_err2)),
            "rel_error2_mean": float(np.mean(rel_err2)),
            "rel_error2_std": float(np.std(rel_err2)),
        })
    return out


def print_summary(summary: Dict[str, Any]) -> None:
    print("abs_error:")
    print("{} \\pm {}".format(summary["abs_error_mean"], summary["abs_error_std"]))
    print("rel_error:")
    print("{:.1f} \\pm {:.1f} %".format(summary["rel_error_mean"] * 100,
                                        summary["rel_error_std"] * 100))
    if "abs_error2_mean" in summary:
        print("abs_error2 interpolation:")
        print("{} \\pm {}".format(summary["abs_error2_mean"], summary["abs_error2_std"]))
        print("rel_error2 interpolation:")
        print("{:.1f} \\pm {:.1f} %".format(summary["rel_error2_mean"] * 100,
                                            summary["rel_error2_std"] * 100))
