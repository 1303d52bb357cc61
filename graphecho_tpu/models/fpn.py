"""FPN encoder–decoder segmenter (flax.linen, NHWC).

TPU re-design of the reference FPN (`/root/reference/models/fpnseg.py:309-444`):

  * backbone (ResNet50-quirk or VGG16) → 5 levels c1..c5;
  * top-down pyramid: `toplayer` 1x1 on c5, three lateral 1x1 convs merged with
    align-corners bilinear `upsample_add`;
  * `features_map = [p2, p3, p4, p5]` captured BEFORE the smooth convs
    (`fpnseg.py:415-418`) — these pre-smooth taps feed the GModule/discriminators;
  * 3x3 smooth convs on p4/p3/p2;
  * semantic branch with SHARED convs: `conv2` (256→256) is applied twice on
    the p5 path and once on p4; `semantic_branch` (256→128) applied on all four
    paths; GroupNorm gn2 (256 groups of 256) / gn1 (128 of 128) shared likewise
    (`fpnseg.py:426-442`);
  * head: 1x1 conv to classes, then 4x align-corners upsample (`:444`).

Returned features and logits are NHWC; use `jnp.transpose` adapters only at
the data boundary.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

from flax import linen as nn

from graphecho_tpu.models.backbones import VGG16, ResNet50
from graphecho_tpu.ops.resize import resize_bilinear_align_corners, upsample_add

Dtype = Any


class FPN(nn.Module):
    num_classes: int = 1
    back_bone: str = "resnet"  # 'resnet' | 'VGG16'
    fpn_channels: int = 256
    semantic_channels: int = 128
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None
    # VGG (width, n_convs) per-block override — see VGG16.block_spec.
    vgg_spec: Optional[Tuple[Tuple[int, int], ...]] = None
    # per-block backbone rematerialization — see VGG16.remat
    remat: bool = False

    def setup(self):
        if self.back_bone == "resnet":
            self.backbone = ResNet50(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                     remat=self.remat)
        elif self.back_bone == "VGG16":
            self.backbone = VGG16(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                  block_spec=self.vgg_spec, remat=self.remat)
        else:
            raise ValueError(f"unknown backbone {self.back_bone!r}")

        conv1x1 = lambda f, name: nn.Conv(f, (1, 1), padding="VALID",
                                          dtype=self.dtype, name=name)
        conv3x3 = lambda f, name: nn.Conv(f, (3, 3), padding="SAME",
                                          dtype=self.dtype, name=name)
        c = self.fpn_channels
        self.toplayer = conv1x1(c, "toplayer")
        self.latlayer1 = conv1x1(c, "latlayer1")
        self.latlayer2 = conv1x1(c, "latlayer2")
        self.latlayer3 = conv1x1(c, "latlayer3")
        self.smooth1 = conv3x3(c, "smooth1")
        self.smooth2 = conv3x3(c, "smooth2")
        self.smooth3 = conv3x3(c, "smooth3")
        # shared semantic-branch convs (reference reuses the same module)
        self.conv2 = conv3x3(c, "conv2")
        self.semantic_branch = conv3x3(self.semantic_channels, "semantic_branch")
        self.conv3 = conv1x1(self.num_classes, "conv3")
        # GroupNorm with groups == channels (per-channel spatial norm)
        self.gn1 = nn.GroupNorm(num_groups=self.semantic_channels, dtype=self.dtype,
                                name="gn1")
        self.gn2 = nn.GroupNorm(num_groups=self.fpn_channels, dtype=self.dtype,
                                name="gn2")

    def __call__(self, x, train: bool = False
                 ) -> Tuple[Any, List[Any]]:
        """x: (B, H, W, C_in). Returns (logits (B,H,W,num_classes),
        [p2, p3, p4, p5] pre-smooth NHWC features)."""
        feats = self.backbone(x, train=train)
        return self.head(feats)

    def head(self, feats: List[Any]) -> Tuple[Any, List[Any]]:
        """Pyramid + semantic head on backbone features [c1..c5] — exposed so
        alternative backbone executors (e.g. the int8 PTQ path in
        `graphecho_tpu.quant`) can reuse the exact float head via
        `fpn.apply(vars, feats, method=FPN.head)`."""
        _, c2, c3, c4, c5 = feats

        p5 = self.toplayer(c5)
        p4 = upsample_add(p5, self.latlayer1(c4))
        p3 = upsample_add(p4, self.latlayer2(c3))
        p2 = upsample_add(p3, self.latlayer3(c2))

        features_map = [p2, p3, p4, p5]  # pre-smooth taps (fpnseg.py:415-418)

        p4 = self.smooth1(p4)
        p3 = self.smooth2(p3)
        p2 = self.smooth3(p2)

        h, w = p2.shape[1], p2.shape[2]
        up = lambda t: resize_bilinear_align_corners(t, h, w)

        s5 = up(nn.relu(self.gn2(self.conv2(p5))))
        s5 = up(nn.relu(self.gn2(self.conv2(s5))))
        s5 = up(nn.relu(self.gn1(self.semantic_branch(s5))))

        s4 = up(nn.relu(self.gn2(self.conv2(p4))))
        s4 = up(nn.relu(self.gn1(self.semantic_branch(s4))))

        s3 = up(nn.relu(self.gn1(self.semantic_branch(p3))))
        s2 = nn.relu(self.gn1(self.semantic_branch(p2)))

        logits = self.conv3(s2 + s3 + s4 + s5)
        logits = resize_bilinear_align_corners(logits, 4 * h, 4 * w)
        return logits, features_map
