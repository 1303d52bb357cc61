"""Convolutional backbones (flax.linen, NHWC, bf16-capable).

TPU re-designs of the reference backbones:
  * VGG16 — 5 conv blocks with BN+ReLU+MaxPool, returns all 5 block outputs
    (`/root/reference/models/fpnseg.py:18-166`);
  * ResNet (Bottleneck) — conv7x7/s2 + maxpool/s2 + 4 stages, returns the
    post-maxpool stem and all 4 stage outputs (`fpnseg.py:177-306`).

Layout is NHWC (TPU-native); normalization is BatchNorm with running stats.
Cross-replica (SyncBN-equivalent) statistics are obtained by passing
`bn_axis_name` matching a mesh axis — flax then reduces batch stats with
`lax.pmean`, replacing the reference's `SyncBatchNorm.convert_sync_batchnorm`
(`train_camus_echo.py:130`).

Note the reference's `ResNet50` factory actually builds stage sizes
`[3, 4, 5, 3]` (`fpnseg.py:295`) — not the canonical `[3, 4, 6, 3]`. We keep
that quirk as the default so checkpoints/FLOPs are comparable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNRelu(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.bn_axis_name)(x)
        return nn.relu(x)


def _max_pool(x, window, strides, padding="VALID"):
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


class VGG16(nn.Module):
    """5-block VGG16-BN encoder; returns the 5 post-pool feature levels at
    strides 2/4/8/16/32 (`fpnseg.py:154-166`).

    `block_spec` overrides the (width, n_convs) per block — same topology,
    shrunken — used by the driver's `dryrun_multichip` to keep XLA:CPU compile
    of the fused full step inside the driver budget on 1-core hosts while
    exercising the identical code path. None → the reference layout.

    `remat=True` wraps each block in `nn.remat` (jax.checkpoint): the backward
    pass recomputes intra-block activations instead of storing them — only the
    block-boundary (post-pool) tensors persist. Function-form lift so the
    parameter paths (`blockN_convM/...`) are byte-identical either way."""

    in_channels: int = 1  # informational; flax infers from input
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None
    block_spec: Optional[Tuple[Tuple[int, int], ...]] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        widths = self.block_spec or ((64, 2), (128, 2), (256, 3), (512, 3),
                                     (512, 3))
        for block_idx, (width, n_convs) in enumerate(widths):
            def block(mdl, x, _bi=block_idx, _w=width, _n=n_convs):
                for conv_idx in range(_n):
                    x = ConvBNRelu(_w, dtype=mdl.dtype,
                                   bn_axis_name=mdl.bn_axis_name,
                                   name=f"block{_bi + 1}_conv{conv_idx + 1}")(x, train)
                return _max_pool(x, (2, 2), (2, 2))

            x = (nn.remat(block) if self.remat else block)(self, x)
            feats.append(x)
        return feats


class Bottleneck(nn.Module):
    """ResNet bottleneck (expansion 4), matching `fpnseg.py:177-212`."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype,
                                       axis_name=self.bn_axis_name, name=name)
        # explicit torch-style symmetric padding (k//2 each side): XLA's
        # "SAME" at stride 2 pads (0, 1) — a half-pixel-shifted sampling grid
        # vs the reference's `padding=1` (`fpnseg.py:186-189`). Identical for
        # the stride-1 convs; the stage-entry stride-2 conv2 needs this.
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), (s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, kernel_init=nn.initializers.he_normal(), name=name)

        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.strides[0], "conv2")(out)))
        out = bn("bn3")(conv(self.planes * self.expansion, 1, 1, "conv3")(out))
        if self.downsample:
            identity = bn("bn_down")(
                conv(self.planes * self.expansion, 1, self.strides[0], "conv_down")(x))
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Bottleneck ResNet returning 5 levels: post-maxpool stem (stride 4) and
    the 4 stage outputs (strides 4/8/16/32) — `fpnseg.py:251-266`."""

    layers: Sequence[int] = (3, 4, 5, 3)
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None
    # per-Bottleneck nn.remat — see VGG16.remat; parameter paths unchanged
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)
        x = _max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                              constant_values=-jnp.inf), (3, 3), (2, 2))
        feats = [x]

        inplanes = 64
        for stage_idx, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                downsample = block_idx == 0 and (s != 1 or inplanes != planes * 4)

                def block(mdl, x, _p=planes, _s=s, _d=downsample,
                          _name=f"layer{stage_idx + 1}_block{block_idx}"):
                    return Bottleneck(_p, (_s, _s), _d, dtype=mdl.dtype,
                                      bn_axis_name=mdl.bn_axis_name,
                                      name=_name)(x, train)

                x = (nn.remat(block) if self.remat else block)(self, x)
                inplanes = planes * 4
            feats.append(x)
        return feats


def ResNet50(dtype=None, bn_axis_name=None, remat=False) -> ResNet:
    """Reference `ResNet50` quirk: stage sizes [3,4,5,3] (`fpnseg.py:295`)."""
    return ResNet(layers=(3, 4, 5, 3), dtype=dtype, bn_axis_name=bn_axis_name,
                  remat=remat)


def ResNet101(dtype=None, bn_axis_name=None, remat=False) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), dtype=dtype, bn_axis_name=bn_axis_name,
                  remat=remat)
