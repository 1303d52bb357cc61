"""Unit tests for core ops: resize parity vs torch, GRL, Sinkhorn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from graphecho_tpu.ops import (
    gradient_reversal,
    resize_bilinear_align_corners,
    resize_nearest,
    sinkhorn_distance,
    sinkhorn_rpm,
)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 7), (28, 28)), ((14, 14), (28, 28)),
                                          ((28, 28), (112, 112)), ((5, 9), (13, 17))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)  # NHWC
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out_hw))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                         mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 10, 2).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), 24, 24))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(24, 24),
                         mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_gradient_reversal():
    x = jnp.asarray([1.0, -2.0, 3.0])
    y, vjp = jax.vjp(lambda t: gradient_reversal(t, 0.02), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    (g,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(g), -0.02 * np.ones(3), rtol=1e-6)


def test_sinkhorn_rpm_matches_reference_impl():
    """Compare against a direct torch re-run of the reference algorithm."""
    rng = np.random.RandomState(2)
    log_alpha = rng.randn(1, 6, 5).astype(np.float32)

    got = np.asarray(jnp.exp(sinkhorn_rpm(jnp.asarray(log_alpha), n_iters=20)))

    # reference slack algorithm (graph_matching.py:654-676) re-expressed
    a = torch.from_numpy(log_alpha)
    pad = torch.nn.ZeroPad2d((0, 1, 0, 1))
    ap = pad(a[:, None]).squeeze(1)
    for _ in range(20):
        ap = torch.cat((ap[:, :-1, :] - torch.logsumexp(ap[:, :-1, :], dim=2, keepdim=True),
                        ap[:, -1, None, :]), dim=1)
        ap = torch.cat((ap[:, :, :-1] - torch.logsumexp(ap[:, :, :-1], dim=1, keepdim=True),
                        ap[:, :, -1, None]), dim=2)
    want = torch.exp(ap[:, :-1, :-1]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
    # rows/cols sum to <= 1
    assert got.sum(-1).max() <= 1 + 1e-4
    assert got.sum(-2).max() <= 1 + 1e-4


def test_sinkhorn_distance_matches_reference_impl():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(9, 4).astype(np.float32)
    cost, pi, C = sinkhorn_distance(jnp.asarray(x), jnp.asarray(y), eps=0.1,
                                    max_iter=5, reduction="mean")

    # torch re-run of the reference loop (sinkhorn_distance.py:27-73), no early stop
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    Ct = torch.sum(torch.abs(tx.unsqueeze(-2) - ty.unsqueeze(-3)) ** 2, -1)
    mu = torch.full((8,), 1.0 / 8)
    nu = torch.full((9,), 1.0 / 9)
    u, v = torch.zeros_like(mu), torch.zeros_like(nu)
    eps = 0.1

    def M(u, v):
        return (-Ct + u.unsqueeze(-1) + v.unsqueeze(-2)) / eps

    for _ in range(5):
        u = eps * (torch.log(mu + 1e-8) - torch.logsumexp(M(u, v), dim=-1)) + u
        v = eps * (torch.log(nu + 1e-8) - torch.logsumexp(M(u, v).transpose(-2, -1), dim=-1)) + v
    pit = torch.exp(M(u, v))
    want_cost = torch.sum(pit * Ct).numpy()
    np.testing.assert_allclose(np.asarray(cost), want_cost, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pi), pit.numpy(), atol=1e-5)


def test_warmup_multistep_schedule_semantics():
    """Reference WarmupMultiStepLR semantics (lr_scheduler.py:38-51):
    constant warmup factor below warmup_iters, gamma decay at milestones."""
    from graphecho_tpu.config import ScheduleConfig
    from graphecho_tpu.train.schedule import warmup_multistep_schedule

    cfg = ScheduleConfig(steps=(10, 20), gamma=0.1, warmup_factor=1 / 3,
                         warmup_iters=5, warmup_method="constant")
    sch = warmup_multistep_schedule(3.0, cfg)
    np.testing.assert_allclose(float(sch(0)), 1.0)  # 3 * 1/3
    np.testing.assert_allclose(float(sch(4)), 1.0)
    np.testing.assert_allclose(float(sch(5)), 3.0)  # warmup over
    np.testing.assert_allclose(float(sch(10)), 0.3)  # first milestone
    np.testing.assert_allclose(float(sch(25)), 0.03, rtol=1e-5)  # second

    lin = ScheduleConfig(steps=(), gamma=0.1, warmup_factor=0.5,
                         warmup_iters=4, warmup_method="linear")
    sch2 = warmup_multistep_schedule(1.0, lin)
    np.testing.assert_allclose(float(sch2(0)), 0.5)
    np.testing.assert_allclose(float(sch2(2)), 0.75)
    np.testing.assert_allclose(float(sch2(4)), 1.0)


def test_build_optimizer_rejects_zero_steps_per_epoch():
    """steps_per_epoch=0 (dataset smaller than the batch) must fail at build
    time: `count // 0` inside the jitted schedule would NOT raise — it would
    silently train at a garbage LR (r5 review)."""
    from graphecho_tpu.config import ComponentConfig
    from graphecho_tpu.train.schedule import build_optimizer

    with pytest.raises(ValueError, match="steps_per_epoch"):
        build_optimizer(ComponentConfig(), steps_per_epoch=0)


def test_cosine_lr_parity():
    """Parity-only helper mirroring the reference's unused
    `adjust_learning_rate` (`train_camus_echo.py:419-423`):
    lr = base * 0.5 * (1 + cos(pi * epoch / total))."""
    import math

    from graphecho_tpu.train.schedule import cosine_lr

    np.testing.assert_allclose(cosine_lr(2.0, 0, 100), 2.0)
    np.testing.assert_allclose(cosine_lr(2.0, 50, 100), 1.0, atol=1e-12)
    np.testing.assert_allclose(cosine_lr(2.0, 100, 100), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        cosine_lr(3.0, 7, 40), 3.0 * 0.5 * (1 + math.cos(math.pi * 7 / 40)))
