"""Full-model numeric parity: flax FPN (VGG16) vs an independent torch
re-implementation of the reference architecture with transplanted weights.

This is SURVEY §4(b)'s "numeric parity against reference activations": the
torch model below re-states the reference architecture
(`/root/reference/models/fpnseg.py:18-166,309-444`) from its definition —
VGG16-BN blocks, top-down pyramid with align-corners bilinear merges, shared
conv2/semantic_branch/gn1/gn2 semantic branch — and receives the flax model's
weights. Matching outputs prove the JAX graph computes the same function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from graphecho_tpu.models import FPN

VGG_WIDTHS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class TorchVGGFPN(tnn.Module):
    """Reference-architecture FPN (VGG16 backbone) written in torch."""

    def __init__(self, num_classes=2, in_ch=1):
        super().__init__()
        blocks = []
        prev = in_ch
        for width, n_convs in VGG_WIDTHS:
            layers = []
            for _ in range(n_convs):
                layers += [tnn.Conv2d(prev, width, 3, padding=1),
                           tnn.BatchNorm2d(width), tnn.ReLU()]
                prev = width
            layers.append(tnn.MaxPool2d(2, 2))
            blocks.append(tnn.Sequential(*layers))
        self.blocks = tnn.ModuleList(blocks)

        self.toplayer = tnn.Conv2d(512, 256, 1)
        self.latlayer1 = tnn.Conv2d(512, 256, 1)
        self.latlayer2 = tnn.Conv2d(256, 256, 1)
        self.latlayer3 = tnn.Conv2d(128, 256, 1)
        self.smooth1 = tnn.Conv2d(256, 256, 3, padding=1)
        self.smooth2 = tnn.Conv2d(256, 256, 3, padding=1)
        self.smooth3 = tnn.Conv2d(256, 256, 3, padding=1)
        self.semantic_branch = tnn.Conv2d(256, 128, 3, padding=1)
        self.conv2 = tnn.Conv2d(256, 256, 3, padding=1)
        self.conv3 = tnn.Conv2d(128, num_classes, 1)
        self.gn1 = tnn.GroupNorm(128, 128)
        self.gn2 = tnn.GroupNorm(256, 256)

    @staticmethod
    def _up(x, h, w):
        return F.interpolate(x, size=(h, w), mode="bilinear",
                             align_corners=True)

    def forward(self, x):
        feats = []
        for block in self.blocks:
            x = block(x)
            feats.append(x)
        _, c2, c3, c4, c5 = feats
        p5 = self.toplayer(c5)
        p4 = self._up(p5, *c4.shape[-2:]) + self.latlayer1(c4)
        p3 = self._up(p4, *c3.shape[-2:]) + self.latlayer2(c3)
        p2 = self._up(p3, *c2.shape[-2:]) + self.latlayer3(c2)
        features_map = [p2, p3, p4, p5]
        p4 = self.smooth1(p4)
        p3 = self.smooth2(p3)
        p2 = self.smooth3(p2)
        h, w = p2.shape[-2:]
        s5 = self._up(F.relu(self.gn2(self.conv2(p5))), h, w)
        s5 = self._up(F.relu(self.gn2(self.conv2(s5))), h, w)
        s5 = self._up(F.relu(self.gn1(self.semantic_branch(s5))), h, w)
        s4 = self._up(F.relu(self.gn2(self.conv2(p4))), h, w)
        s4 = self._up(F.relu(self.gn1(self.semantic_branch(s4))), h, w)
        s3 = self._up(F.relu(self.gn1(self.semantic_branch(p3))), h, w)
        s2 = F.relu(self.gn1(self.semantic_branch(p2)))
        out = self._up(self.conv3(s2 + s3 + s4 + s5), 4 * h, 4 * w)
        return out, features_map


def _copy_conv(tconv, params):
    tconv.weight.data = torch.from_numpy(
        np.asarray(params["kernel"]).transpose(3, 2, 0, 1).copy())
    if "bias" in params:
        tconv.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())


def _copy_bn(tbn, params, stats):
    tbn.weight.data = torch.from_numpy(np.asarray(params["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(stats["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(stats["var"]).copy())


def _copy_gn(tgn, params):
    tgn.weight.data = torch.from_numpy(np.asarray(params["scale"]).copy())
    tgn.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())


def test_fpn_vgg_full_forward_parity():
    model = FPN(num_classes=2, back_bone="VGG16")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # perturb batch_stats away from init so BN actually matters
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    logits_j, feats_j = model.apply(variables, jnp.asarray(x), train=False)

    tm = TorchVGGFPN(num_classes=2).eval()
    p = variables["params"]
    bs = variables["batch_stats"]
    bb_p, bb_s = p["backbone"], bs["backbone"]
    for bi, (width, n_convs) in enumerate(VGG_WIDTHS):
        for ci in range(n_convs):
            name = f"block{bi + 1}_conv{ci + 1}"
            tseq = tm.blocks[bi]
            _copy_conv(tseq[ci * 3], bb_p[name]["Conv_0"])
            _copy_bn(tseq[ci * 3 + 1], bb_p[name]["BatchNorm_0"],
                     bb_s[name]["BatchNorm_0"])
    for name in ("toplayer", "latlayer1", "latlayer2", "latlayer3", "smooth1",
                 "smooth2", "smooth3", "semantic_branch", "conv2", "conv3"):
        _copy_conv(getattr(tm, name), p[name])
    _copy_gn(tm.gn1, p["gn1"])
    _copy_gn(tm.gn2, p["gn2"])

    with torch.no_grad():
        logits_t, feats_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))

    got = np.asarray(logits_j)
    want = logits_t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(fj),
                                   ft.permute(0, 2, 3, 1).numpy(), atol=1e-3)
