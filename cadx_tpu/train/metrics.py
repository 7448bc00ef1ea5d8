"""On-device evaluation metrics.

Confusion matrix, accuracy, and a classification report matching the
sklearn-dict schema the reference persists into
``training_summary_*.json`` (reference: WebApplicationPrototype/static/
trained_model/training_summary_advanced.json:38-77 and
get_training_metrics, CNNM.py:627-652). Everything is computed with
one-hot matmuls/segment sums so it stays inside jit and shards cleanly
over a data-parallel mesh (a psum over the batch axis reduces the
confusion matrix across devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(y_true: jax.Array, y_pred: jax.Array, num_classes: int) -> jax.Array:
    """(num_classes, num_classes) counts; rows = true class, cols = predicted."""
    t = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(y_pred, num_classes, dtype=jnp.float32)
    return (t.T @ p).astype(jnp.int32)


def accuracy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean((y_true == y_pred).astype(jnp.float32))


def precision_recall_f1(cm: jax.Array):
    """Per-class precision/recall/F1/support from a confusion matrix."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)
    pred_count = cm.sum(axis=0)
    precision = jnp.where(pred_count > 0, tp / jnp.maximum(pred_count, 1), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-30), 0.0)
    return precision, recall, f1, support


def classification_report(y_true, y_pred, num_classes: int) -> dict:
    """sklearn-shaped report dict: per-class + accuracy + macro/weighted avg."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    cm = confusion_matrix(y_true, y_pred, num_classes)
    precision, recall, f1, support = precision_recall_f1(cm)
    acc = accuracy(y_true, y_pred)

    p, r, f, s = (np.asarray(v, dtype=np.float64) for v in (precision, recall, f1, support))
    total = float(s.sum())
    report: dict = {}
    for c in range(num_classes):
        report[str(c)] = {
            "precision": float(p[c]),
            "recall": float(r[c]),
            "f1-score": float(f[c]),
            "support": int(s[c]),
        }
    report["accuracy"] = float(acc)
    report["macro avg"] = {
        "precision": float(p.mean()),
        "recall": float(r.mean()),
        "f1-score": float(f.mean()),
        "support": int(total),
    }
    w = s / max(total, 1.0)
    report["weighted avg"] = {
        "precision": float((p * w).sum()),
        "recall": float((r * w).sum()),
        "f1-score": float((f * w).sum()),
        "support": int(total),
    }
    return report


def evaluation_block(y_true, y_pred, num_classes: int) -> dict:
    """The reference summary JSON's ``evaluation`` block."""
    cm = confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), num_classes)
    return {
        "test_accuracy": float(accuracy(jnp.asarray(y_true), jnp.asarray(y_pred))),
        "confusion_matrix": np.asarray(cm).tolist(),
        "classification_report": classification_report(y_true, y_pred, num_classes),
    }
