"""Import torch checkpoints (torchvision zoo / reference GraphEcho) into flax.

Two reference surfaces are covered (`/root/reference/models/fpnseg.py`):

  * the `pretrained` knob — torchvision model-zoo ResNet state dicts loaded
    into the backbone (`fpnseg.py:279-287` for ResNet101; the ResNet50 branch
    is typo-broken upstream). `resnet_params_from_torch` maps the torchvision
    naming (`conv1`, `bn1`, `layer{i}.{j}.conv1`, `layer{i}.{j}.downsample.0/1`)
    onto the flax backbone tree;
  * whole reference checkpoints — `torch.save({'network': state_dict})`
    (`train_camus_echo.py:475-488`), whose FPN keys (`back_bone.*` resnet or
    VGG `block_{b}.{pos}.*` naming, plus the pyramid/semantic head convs and
    gn1/gn2) map onto the flax FPN via `fpn_params_from_torch` /
    `load_reference_checkpoint`. This is the machinery for dice-parity
    evaluation against trained reference checkpoints (PARITY.md "what cannot
    be compared yet") once datasets/checkpoints are mounted.

All entries must be numpy-convertible (pass torch tensors through
`{k: v.cpu().numpy() for ...}` or use `load_reference_checkpoint`, which does
the `torch.load` itself).

Robustness (the reference's own loader crashes on some of these):
  * grayscale models (`in_channel=1`): an RGB `conv1.weight` is collapsed by
    summing the RGB axis — exact for grey inputs replicated to RGB;
  * depth mismatches (e.g. the reference's `[3,4,5,3]` ResNet50 quirk vs the
    zoo's `[3,4,6,3]`): missing/extra blocks are skipped and reported;
  * classifier heads (`fc.*`), `module.` DDP prefixes, `num_batches_tracked`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

_RESNET_BLOCK_RE = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")
_VGG_BLOCK_RE = re.compile(r"^block_(\d+)\.(\d+)\.(.+)$")
# flax FPN head modules (models/fpn.py) == reference attribute names
_HEAD_MODULES = ("toplayer", "latlayer1", "latlayer2", "latlayer3", "smooth1",
                 "smooth2", "smooth3", "semantic_branch", "conv2", "conv3",
                 "gn1", "gn2")


def _put(params_mod, stats_mod, torch_leaf: str, value: np.ndarray,
         skipped: List[str], key: str) -> None:
    """Assign one torch leaf into a flax module's params/batch_stats dicts."""
    if torch_leaf == "weight" and value.ndim == 4:
        tgt, leaf = params_mod, "kernel"
        value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif torch_leaf in ("weight", "bias"):
        # 1-D weight: BN/GN affine -> scale
        tgt, leaf = params_mod, {"weight": "scale", "bias": "bias"}[torch_leaf]
    elif torch_leaf in ("running_mean", "running_var"):
        tgt, leaf = stats_mod, {"running_mean": "mean",
                                "running_var": "var"}[torch_leaf]
    else:  # num_batches_tracked etc. — no flax analog
        return
    if tgt is None or leaf not in tgt:
        skipped.append(key)
        return
    want = tgt[leaf]
    if value.shape != want.shape:
        # RGB->grey conv stem: sum the input-channel axis (HWIO axis 2)
        if (leaf == "kernel" and value.ndim == 4
                and value.shape[:2] == want.shape[:2]
                and want.shape[2] == 1 and value.shape[3] == want.shape[3]):
            value = value.sum(axis=2, keepdims=True)
        else:
            skipped.append(key)
            return
    tgt[leaf] = np.asarray(value, np.float32)


def _mod(tree, *path):
    for k in path:
        if tree is None or k not in tree:
            return None
        tree = tree[k]
    return tree


def _assign_resnet(key: str, value: np.ndarray, params, stats,
                   skipped: List[str], full_key: str) -> None:
    m = _RESNET_BLOCK_RE.match(key)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        name = f"layer{stage}_block{block}"
        if rest.startswith("downsample."):
            idx, leaf = rest.split(".")[1:]
            sub = "conv_down" if idx == "0" else "bn_down"
        else:
            sub, leaf = rest.split(".", 1)
        _put(_mod(params, name, sub), _mod(stats, name, sub), leaf, value,
             skipped, full_key)
    elif key.startswith(("conv1.", "bn1.")):
        sub, leaf = key.split(".", 1)
        _put(_mod(params, sub), _mod(stats, sub), leaf, value, skipped,
             full_key)
    else:
        skipped.append(full_key)


def _assign_vgg(key: str, value: np.ndarray, params, stats,
                skipped: List[str], full_key: str) -> None:
    """Reference VGG16 blocks are nn.Sequential with convs at positions
    0/3/6 and BNs at 1/4/7 (`fpnseg.py:18-145`); flax names them
    `block{b}_conv{j}` with inner Conv_0/BatchNorm_0 (models/backbones.py)."""
    m = _VGG_BLOCK_RE.match(key)
    if not m:
        skipped.append(full_key)
        return
    block, pos, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
    conv_idx, kind = divmod(pos, 3)
    name = f"block{block}_conv{conv_idx + 1}"
    sub = {0: "Conv_0", 1: "BatchNorm_0"}.get(kind)
    if sub is None:  # ReLU/MaxPool positions carry no parameters
        skipped.append(full_key)
        return
    _put(_mod(params, name, sub), _mod(stats, name, sub), leaf, value,
         skipped, full_key)


def resnet_params_from_torch(state_dict: Dict[str, np.ndarray],
                             backbone_params, backbone_stats
                             ) -> Tuple[dict, dict, List[str]]:
    """torchvision-format ResNet state_dict -> (params, batch_stats,
    skipped_keys) for the flax backbone subtree. Unmatched leaves keep their
    initialization (the reference's `pretrained` analog)."""
    params = _mutable_copy(backbone_params)
    stats = _mutable_copy(backbone_stats)
    skipped: List[str] = []
    for key, v in state_dict.items():
        _assign_resnet(key.removeprefix("module."), np.asarray(v), params,
                       stats, skipped, key)
    return params, stats, skipped


def fpn_params_from_torch(state_dict: Dict[str, np.ndarray],
                          fpn_params, fpn_stats
                          ) -> Tuple[dict, dict, List[str]]:
    """Reference FPN state_dict (`back_bone.*` + head convs + gn1/gn2) ->
    (params, batch_stats, skipped) for the flax FPN variable subtrees."""
    params = _mutable_copy(fpn_params)
    stats = _mutable_copy(fpn_stats)
    skipped: List[str] = []
    for key, v in state_dict.items():
        k = key.removeprefix("module.")
        v = np.asarray(v)
        if k.startswith("back_bone."):
            rest = k[len("back_bone."):]
            assign = _assign_vgg if rest.startswith("block_") else _assign_resnet
            assign(rest, v, _mod(params, "backbone"), _mod(stats, "backbone"),
                   skipped, key)
        else:
            parts = k.split(".")
            if len(parts) == 2 and parts[0] in _HEAD_MODULES:
                _put(_mod(params, parts[0]), None, parts[1], v, skipped, key)
            else:
                skipped.append(key)
    return params, stats, skipped


def load_reference_checkpoint(state, path: str):
    """Load a reference `net_{epoch}.pth` (`train_camus_echo.py:475-488`,
    possibly wrapped as `{'network': state_dict}` with DDP `module.` prefixes)
    or a torchvision zoo .pth into a TrainState. Returns (state, skipped).

    Full-FPN key sets go through `fpn_params_from_torch`; a bare torchvision
    ResNet state dict (no `back_bone.`/head keys) initializes the backbone
    only — the reference's `pretrained=True` semantics."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        try:
            obj = torch.load(path, map_location="cpu", weights_only=True)
        except TypeError:  # older torch without weights_only
            obj = torch.load(path, map_location="cpu")
        if isinstance(obj, dict) and "network" in obj:
            obj = obj["network"]
        sd = {k: np.asarray(v.cpu().numpy() if hasattr(v, "cpu") else v)
              for k, v in obj.items()}
    is_full_fpn = any(k.removeprefix("module.").startswith("back_bone.")
                      for k in sd)
    if is_full_fpn:
        params, stats, skipped = fpn_params_from_torch(
            sd, state.net_params, state.net_batch_stats)
        return state.replace(net_params=params, net_batch_stats=stats), skipped
    params = _mutable_copy(state.net_params)
    stats = _mutable_copy(state.net_batch_stats)
    bb_p, bb_s, skipped = resnet_params_from_torch(
        sd, params["backbone"], stats["backbone"])
    params["backbone"] = bb_p
    stats["backbone"] = bb_s
    return state.replace(net_params=params, net_batch_stats=stats), skipped


def _mutable_copy(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _mutable_copy(v) for k, v in tree.items()}
    return np.asarray(tree)
