"""Loss/metric parity tests against direct torch re-runs of the reference
formulas (`utils/losses.py`, `train_camus_echo.py:402-417`)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from graphecho_tpu.train.losses import (
    bce_focal_loss_probs,
    bce_with_logits,
    binary_dice_loss,
    cross_entropy,
    dice_loss,
    focal_loss_logits,
)
from graphecho_tpu.train.metrics import binarize_logits, calculate_overlap_metrics


def _torch_dice_loss(pred, target):
    """Reference DiceLoss (utils/losses.py:64-95) re-run."""
    pred = F.softmax(pred, dim=1)
    total = 0.0
    for i in range(target.shape[1]):
        p = pred[:, i].reshape(pred.shape[0], -1)
        t = target[:, i].reshape(target.shape[0], -1)
        num = (p * t).sum(1) + 1
        den = (p.pow(2) + t.pow(2)).sum(1) + 1
        total = total + (1 - num / den).mean()
    return total / target.shape[1]


def test_dice_loss_parity():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 3, 8, 8).astype(np.float32)  # NCHW for torch
    target = (rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
    want = _torch_dice_loss(torch.from_numpy(logits), torch.from_numpy(target)).item()
    # ours is layout-agnostic via channel_axis
    got = dice_loss(jnp.asarray(logits), jnp.asarray(target), channel_axis=1)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_binary_dice_parity():
    rng = np.random.RandomState(1)
    p = rng.rand(4, 16).astype(np.float32)
    t = (rng.rand(4, 16) > 0.5).astype(np.float32)
    num = (p * t).sum(1) + 1
    den = ((p**2) + (t**2)).sum(1) + 1
    want = (1 - num / den).mean()
    got = binary_dice_loss(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_bce_parity():
    rng = np.random.RandomState(2)
    x = rng.randn(5, 7).astype(np.float32)
    t = (rng.rand(5, 7) > 0.5).astype(np.float32)
    want = F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t)).item()
    got = bce_with_logits(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_focal_probs_parity():
    rng = np.random.RandomState(3)
    p = rng.rand(10, 1).astype(np.float32) * 0.98 + 0.01
    t = (rng.rand(10, 1) > 0.5).astype(np.float32)
    pt = torch.from_numpy(p)
    tt = torch.from_numpy(t)
    want = (-0.25 * (1 - pt) ** 2 * tt * torch.log(pt)
            - 0.75 * pt**2 * (1 - tt) * torch.log(1 - pt)).mean().item()
    got = bce_focal_loss_probs(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_focal_logits_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(6).astype(np.float32)
    t = (rng.rand(6) > 0.5).astype(np.float32)
    bce = F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t),
                                             reduction="none")
    want = ((1 - torch.exp(-bce)) ** 5.0 * bce).mean().item()
    got = focal_loss_logits(jnp.asarray(x), jnp.asarray(t), gamma=5.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_cross_entropy_masked():
    rng = np.random.RandomState(5)
    logits = rng.randn(6, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(6,))
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    want = F.cross_entropy(torch.from_numpy(logits[:3]), torch.from_numpy(labels[:3])).item()
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_overlap_metrics_parity():
    rng = np.random.RandomState(6)
    logits = rng.randn(2, 1, 16, 16).astype(np.float32)
    gt = (rng.rand(2, 1, 16, 16) > 0.5).astype(np.float32)
    pred = binarize_logits(jnp.asarray(logits))
    m = calculate_overlap_metrics(jnp.asarray(gt), pred)

    # torch reference re-run
    out = torch.where(torch.sigmoid(torch.from_numpy(logits)) > 0.5, 1, 0).reshape(-1).float()
    tgt = torch.from_numpy(gt).reshape(-1)
    tp = (out * tgt).sum()
    fp = (out * (1 - tgt)).sum()
    fn = ((1 - out) * tgt).sum()
    tn = ((1 - out) * (1 - tgt)).sum()
    eps = 1e-5
    np.testing.assert_allclose(float(m.dice), ((2 * tp + eps) / (2 * tp + fp + fn + eps)).item(), rtol=1e-5)
    np.testing.assert_allclose(float(m.pixel_acc), ((tp + tn + eps) / (tp + tn + fp + fn + eps)).item(), rtol=1e-5)
