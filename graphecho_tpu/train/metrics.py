"""Segmentation metrics as pure jnp confusion-count reductions.

Reproduces the reference's inline `_calculate_overlap_metrics`
(`/root/reference/train_camus_echo.py:402-417`) exactly: flatten, TP/FP/FN/TN,
eps=1e-5, dice = (2TP+eps)/(2TP+FP+FN+eps). These are the metric definitions
the parity target is measured with (BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp


class OverlapMetrics(NamedTuple):
    pixel_acc: jnp.ndarray
    dice: jnp.ndarray
    precision: jnp.ndarray
    specificity: jnp.ndarray
    recall: jnp.ndarray


def confusion_counts(gt: jnp.ndarray, pred: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """TP/FP/FN/TN sums over all elements. `pred` is already binarized."""
    output = pred.reshape(-1).astype(jnp.float32)
    target = gt.reshape(-1).astype(jnp.float32)
    tp = jnp.sum(output * target)
    fp = jnp.sum(output * (1 - target))
    fn = jnp.sum((1 - output) * target)
    tn = jnp.sum((1 - output) * (1 - target))
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def overlap_metrics_from_counts(c: Dict[str, jnp.ndarray], eps: float = 1e-5
                                ) -> OverlapMetrics:
    tp, fp, fn, tn = c["tp"], c["fp"], c["fn"], c["tn"]
    return OverlapMetrics(
        pixel_acc=(tp + tn + eps) / (tp + tn + fp + fn + eps),
        dice=(2 * tp + eps) / (2 * tp + fp + fn + eps),
        precision=(tp + eps) / (tp + fp + eps),
        specificity=(tn + eps) / (tn + fp + eps),
        recall=(tp + eps) / (tp + fn + eps),
    )


def calculate_overlap_metrics(gt: jnp.ndarray, pred: jnp.ndarray,
                              eps: float = 1e-5) -> OverlapMetrics:
    """Drop-in equivalent of the reference metric function. `pred` binarized
    (the trainers pass `sigmoid(logits) > 0.5`)."""
    return overlap_metrics_from_counts(confusion_counts(gt, pred), eps)


def binarize_logits(logits: jnp.ndarray, thresh: float = 0.5) -> jnp.ndarray:
    """sigmoid(logits) > thresh as {0,1} — the reference's prediction rule."""
    return (1.0 / (1.0 + jnp.exp(-logits)) > thresh).astype(jnp.int32)
