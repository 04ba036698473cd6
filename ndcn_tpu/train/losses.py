"""Losses and metrics.

Match the reference's definitions exactly (they define the benchmark numbers):
- dynamics: abs error = mean |pred - true| (l1), rel error = l1 / mean(true)
  (heat_dynamics.py:296,319-321,345-349)
- classification: softmax cross-entropy with mean reduction over the selected
  index set (dgnn.py:203), accuracy (utils.py:321-326), micro/macro F1
  (utils.py:328-334).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - true))


def relative_l1(pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    return l1_loss(pred, true) / jnp.mean(true)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax CE, mean over rows. logits (m, C), labels (m,) int."""
    import optax

    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))


def f1_scores(logits, labels):
    """(micro, macro) F1 on host numpy (eval-time only)."""
    preds = np.asarray(jnp.argmax(logits, -1))
    labels = np.asarray(labels)
    classes = np.unique(np.concatenate([labels, preds]))
    tp_all = fp_all = fn_all = 0.0
    per_class_f1 = []
    for c in classes:
        tp = float(np.sum((preds == c) & (labels == c)))
        fp = float(np.sum((preds == c) & (labels != c)))
        fn = float(np.sum((preds != c) & (labels == c)))
        tp_all, fp_all, fn_all = tp_all + tp, fp_all + fp, fn_all + fn
        denom = 2 * tp + fp + fn
        per_class_f1.append(2 * tp / denom if denom > 0 else 0.0)
    micro_denom = 2 * tp_all + fp_all + fn_all
    micro = 2 * tp_all / micro_denom if micro_denom > 0 else 0.0
    return micro, float(np.mean(per_class_f1))
