"""Segmentation / matching losses as pure jnp functions.

TPU re-implementations of the reference losses:
  * BinaryDiceLoss / DiceLoss  (`/root/reference/utils/losses.py:24-95`)
  * BCEWithLogits              (torch loss used throughout the trainers)
  * BCEFocalLoss on probabilities (`models/graph_matching.py:23-45`)
  * FocalLoss on logits        (`models/gradient_reversal.py:35-39`)

All functions operate on arrays channel-last or channel-first agnostically
(they flatten), take `jnp` inputs, and return scalars.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def binary_dice_loss(predict: jnp.ndarray, target: jnp.ndarray,
                     smooth: float = 1.0, p: int = 2,
                     reduction: str = "mean") -> jnp.ndarray:
    """Dice loss of a binary prediction. `predict` is a probability map.

    Mirrors `BinaryDiceLoss` (`utils/losses.py:24-61`): flattens per-sample,
    num = sum(x*y)+smooth, den = sum(x^p + y^p)+smooth.
    """
    n = predict.shape[0]
    predict = predict.reshape(n, -1)
    target = target.reshape(n, -1)
    num = jnp.sum(predict * target, axis=1) + smooth
    den = jnp.sum(predict**p + target**p, axis=1) + smooth
    loss = 1.0 - num / den
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray, channel_axis: int = -1,
              ) -> jnp.ndarray:
    """Multi-channel dice: softmax over channels then mean of per-channel
    binary dice (`utils/losses.py:64-95`). `target` is one-hot-ish float with
    the same shape as `logits`."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=channel_axis)
    prob = jnp.moveaxis(prob, channel_axis, 1)
    target = jnp.moveaxis(target, channel_axis, 1)
    c = prob.shape[1]
    total = 0.0
    for i in range(c):
        total = total + binary_dice_loss(prob[:, i], target[:, i])
    return total / c


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray,
                    weight: Optional[jnp.ndarray] = None,
                    reduction: str = "mean") -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits. Computed in f32
    regardless of input dtype (bf16 logits lose too much around 0)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # max(x,0) - x*z + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        if weight is not None:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-8)
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def bce_focal_loss_probs(p: jnp.ndarray, target: jnp.ndarray,
                         gamma: float = 2.0, alpha: float = 0.25,
                         mask: Optional[jnp.ndarray] = None,
                         eps: float = 1e-7) -> jnp.ndarray:
    """Focal BCE on probabilities (`graph_matching.py:23-45`,
    reduction='elementwise_mean'). `mask` restricts the mean to valid entries
    (our static-shape replacement for the reference's boolean indexing)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    loss = (-alpha * (1 - p) ** gamma * target * jnp.log(p)
            - (1 - alpha) * p**gamma * (1 - target) * jnp.log(1 - p))
    if mask is None:
        return jnp.mean(loss)
    mask = mask.astype(loss.dtype)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def focal_loss_logits(logits: jnp.ndarray, target: jnp.ndarray,
                      gamma: float = 5.0) -> jnp.ndarray:
    """Focal loss on logits (`models/gradient_reversal.py:35-39`)."""
    bce = bce_with_logits(logits, target, reduction="none")
    pt = jnp.exp(-bce)
    return jnp.mean((1 - pt) ** gamma * bce)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-class CE over int labels with optional per-sample weight and
    validity mask (masked mean)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    # one_hot instead of take_along_axis: out-of-range labels contribute 0
    # rather than an undefined gather (defensive; the reference would crash)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=log_p.dtype)
    nll = -jnp.sum(onehot * log_p, axis=-1)
    if weight is not None:
        nll = nll * weight
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
