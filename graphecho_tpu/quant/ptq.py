"""Post-training int8 quantization for the FPN backbones (inference only).

The reference has no quantized path (fp32 eager torch, `README.md:24`); this
is a TPU capability extension: the v5e MXU sustains ~195 TOP/s int8 vs
~122 TFLOP/s bf16 (measured, BENCHMARKS.md), so the conv-dominated backbone
forward can run up to ~1.6x faster at inference.

Scheme (standard PTQ):
  * BatchNorm folded into the preceding conv (inference-time affine);
  * per-output-channel symmetric int8 weights;
  * per-tensor symmetric int8 activations, scales calibrated as the absmax
    over a small calibration set;
  * convs execute as int8xint8->int32 `lax.conv_general_dilated`
    (`preferred_element_type=jnp.int32`), dequant + bias + ReLU in float —
    XLA fuses these epilogues into the conv;
  * everything that is not a conv (residual adds, max-pool stem, the whole
    FPN pyramid/semantic head with its GroupNorms and align-corners resizes)
    stays in float: `FPN.head` is reused verbatim, so the quantized model is
    the SAME flax head over an int8 backbone executor.

Both backbones are supported by mirroring their exact op graphs
(`models/backbones.py`): VGG16 conv-BN-ReLU blocks with max-pools, and the
ResNet50-quirk bottleneck stages (reference `fpnseg.py:18-166,177-306`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")
VGG_WIDTHS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def fold_bn(kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
            gamma: jnp.ndarray, beta: jnp.ndarray, mean: jnp.ndarray,
            var: jnp.ndarray, eps: float = 1e-5
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BatchNorm(eval) into the preceding conv:
    y = gamma*(conv(x)+b - mu)/sqrt(var+eps) + beta
      = conv_{W*s}(x) + (b - mu)*s + beta,  s = gamma/sqrt(var+eps)."""
    s = gamma / jnp.sqrt(var + eps)
    w = kernel * s[None, None, None, :]
    b0 = bias if bias is not None else 0.0
    return w, (b0 - mean) * s + beta


def _quant_weights(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12)
    scale = amax / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, None, None, :]), -127, 127)
    return wq.astype(jnp.int8), scale.astype(jnp.float32)


def _q(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _qconv(x8: jnp.ndarray, x_scale: float, wq: jnp.ndarray,
           w_scale: jnp.ndarray, bias: jnp.ndarray,
           strides: Tuple[int, int] = (1, 1), padding: Any = "SAME"
           ) -> jnp.ndarray:
    """int8 conv with int32 accumulation, dequantized to f32 + bias."""
    y = jax.lax.conv_general_dilated(
        x8, wq, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * w_scale)[None, None, None, :] + bias


@dataclasses.dataclass
class _QConv:
    """One folded+quantized conv layer. Arrays live here between calls, but
    jitted forwards read them from an explicit qparams/fparams pytree ARGUMENT
    — closing over them would bake ~25M weights into the HLO as constants,
    the compile-stall mode this host's remote compiler is known for
    (CLAUDE.md: "never capture module-level jnp arrays as jit constants")."""

    wq: jnp.ndarray  # int8 HWIO
    w_scale: jnp.ndarray  # (O,) f32
    bias: jnp.ndarray  # (O,) f32
    w_float: jnp.ndarray  # folded float kernel (calibration / reference)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    in_scale: float = 0.0  # activation scale, set by calibration


def _fold_quant(params: Dict, stats: Dict, conv_name: str, bn_name: str,
                strides=(1, 1), padding="SAME",
                conv_key: str = "kernel") -> _QConv:
    cp = params[conv_name]
    kernel = cp["Conv_0"]["kernel"] if "Conv_0" in cp else cp[conv_key]
    bias = (cp["Conv_0"].get("bias") if "Conv_0" in cp else cp.get("bias"))
    bp = params[conv_name]["BatchNorm_0"] if bn_name is None else params[bn_name]
    bs = stats[conv_name]["BatchNorm_0"] if bn_name is None else stats[bn_name]
    w, b = fold_bn(kernel, bias, bp["scale"], bp["bias"], bs["mean"], bs["var"])
    wq, ws = _quant_weights(w)
    # keep the float mirror on HOST (numpy): device memory then holds only the
    # int8 kernels — the point of the PTQ path for memory-constrained serving
    return _QConv(wq=wq, w_scale=ws, bias=b, w_float=np.asarray(w),
                  strides=strides, padding=padding)


class QuantizedBackbone:
    """int8 executor for a trained FPN backbone.

    Build with `quantize_fpn_backbone(...)`; call `self(x)` for the int8
    forward returning the 5 float feature levels (same contract as the flax
    backbones). `float_forward(x)` runs the BN-folded float mirror (used for
    calibration and as a numerics reference)."""

    def __init__(self, backbone: str, layers: Dict[str, _QConv],
                 resnet_layout: Optional[Sequence[int]] = None):
        self.backbone = backbone
        self.layers = layers
        self.resnet_layout = resnet_layout

    # ------------------------------------------------------------- pytrees
    def qparams(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """int8 inference pytree — pass this as an ARGUMENT to jitted infer
        functions (never close over the backbone in a jit)."""
        return {name: {"wq": l.wq, "w_scale": l.w_scale, "bias": l.bias,
                       "in_scale": jnp.asarray(l.in_scale, jnp.float32)}
                for name, l in self.layers.items()}

    def fparams(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """BN-folded float-mirror pytree (calibration / numerics reference)."""
        return {name: {"w": l.w_float, "bias": l.bias}
                for name, l in self.layers.items()}

    # ------------------------------------------------------------- forward
    def _forward(self, x: jnp.ndarray, int8: bool,
                 amax: Optional[Dict[str, jnp.ndarray]] = None,
                 params: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None
                 ) -> List[jnp.ndarray]:
        """Shared graph walk. With `amax` (calibration) records per-layer
        input absmax; with int8=True uses each layer's frozen in_scale.
        `params` supplies the layer arrays (qparams()/fparams()); omitted,
        they are read off the layer objects (eager use only)."""

        def conv(name: str, t: jnp.ndarray) -> jnp.ndarray:
            lyr = self.layers[name]
            p = params.get(name) if params is not None else None
            if amax is not None:
                amax[name] = jnp.maximum(
                    amax.get(name, 0.0), jnp.max(jnp.abs(t)))
            if int8:
                in_scale = p["in_scale"] if p is not None else lyr.in_scale
                wq = p["wq"] if p is not None else lyr.wq
                w_scale = p["w_scale"] if p is not None else lyr.w_scale
                bias = p["bias"] if p is not None else lyr.bias
                return _qconv(_q(t, in_scale), in_scale, wq, w_scale, bias,
                              lyr.strides, lyr.padding)
            w = p["w"] if p is not None else lyr.w_float
            bias = p["bias"] if p is not None else lyr.bias
            y = jax.lax.conv_general_dilated(
                t, w, lyr.strides, lyr.padding, dimension_numbers=_DN)
            return y + bias

        relu = jax.nn.relu
        if self.backbone == "VGG16":
            feats = []
            for bi, (_, n_convs) in enumerate(VGG_WIDTHS):
                for ci in range(n_convs):
                    x = relu(conv(f"block{bi + 1}_conv{ci + 1}", x))
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                feats.append(x)
            return feats

        # ResNet (bottleneck, reference [3,4,5,3] quirk by default)
        x = relu(conv("conv1", x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = [x]
        inplanes = 64
        for stage_idx, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.resnet_layout)):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                down = block_idx == 0 and (s != 1 or inplanes != planes * 4)
                p = f"layer{stage_idx + 1}_block{block_idx}"
                identity = x
                out = relu(conv(f"{p}/conv1", x))
                out = relu(conv(f"{p}/conv2", out))
                out = conv(f"{p}/conv3", out)
                if down:
                    identity = conv(f"{p}/conv_down", x)
                x = relu(out + identity)
                inplanes = planes * 4
            feats.append(x)
        return feats

    def __call__(self, x: jnp.ndarray,
                 qparams: Optional[Dict] = None) -> List[jnp.ndarray]:
        """int8 forward. Inside a jit, pass `qparams` (from `qparams()`) as a
        traced argument so the weights are not baked into the program."""
        return self._forward(x, int8=True, params=qparams)

    def float_forward(self, x: jnp.ndarray,
                      fparams: Optional[Dict] = None) -> List[jnp.ndarray]:
        return self._forward(x, int8=False, params=fparams)

    # --------------------------------------------------------- calibration
    def calibrate(self, batches: Iterable[jnp.ndarray]) -> None:
        """Set per-layer activation scales from absmax over `batches`."""
        amax: Dict[str, float] = {}

        def fwd_with_amax(fp, x):
            a: Dict[str, jnp.ndarray] = {}
            self._forward(x, int8=False, amax=a, params=fp)
            return a

        fwd_with_amax = jax.jit(fwd_with_amax)
        fp = self.fparams()
        for b in batches:
            a = fwd_with_amax(fp, jnp.asarray(b))
            for k, v in a.items():
                prev = amax.get(k)
                v = float(v)
                amax[k] = v if prev is None else max(prev, v)
        for name, lyr in self.layers.items():
            lyr.in_scale = max(amax[name], 1e-12) / 127.0


def quantize_fpn_backbone(back_bone: str, variables: Dict,
                          calib_batches: Iterable[Any],
                          resnet_layout: Sequence[int] = (3, 4, 5, 3)
                          ) -> QuantizedBackbone:
    """Quantize a trained FPN's backbone from its flax `variables`
    ({'params', 'batch_stats'}); calibrate activation scales on
    `calib_batches` (an iterable of (B, H, W, C_in) arrays)."""
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    layers: Dict[str, _QConv] = {}

    if back_bone == "VGG16":
        for bi, (_, n_convs) in enumerate(VGG_WIDTHS):
            for ci in range(n_convs):
                name = f"block{bi + 1}_conv{ci + 1}"
                layers[name] = _fold_quant(params, stats, name, None)
        qb = QuantizedBackbone("VGG16", layers)
    elif back_bone == "resnet":
        layers["conv1"] = _fold_quant(
            params, stats, "conv1", "bn1", strides=(2, 2),
            padding=[(3, 3), (3, 3)])
        inplanes = 64
        for stage_idx, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), resnet_layout)):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                down = block_idx == 0 and (s != 1 or inplanes != planes * 4)
                bname = f"layer{stage_idx + 1}_block{block_idx}"
                bp, bst = params[bname], stats[bname]
                layers[f"{bname}/conv1"] = _fold_quant(bp, bst, "conv1", "bn1")
                # explicit (1,1): torch `padding=1` semantics — at stride 2
                # XLA "SAME" would pad (0,1) (see models/backbones.py)
                layers[f"{bname}/conv2"] = _fold_quant(
                    bp, bst, "conv2", "bn2", strides=(s, s),
                    padding=[(1, 1), (1, 1)])
                layers[f"{bname}/conv3"] = _fold_quant(bp, bst, "conv3", "bn3")
                if down:
                    layers[f"{bname}/conv_down"] = _fold_quant(
                        bp, bst, "conv_down", "bn_down", strides=(s, s))
                inplanes = planes * 4
        qb = QuantizedBackbone("resnet", layers, resnet_layout)
    else:
        raise ValueError(f"unknown backbone {back_bone!r}")

    qb.calibrate(calib_batches)
    return qb


def make_quantized_infer(fpn, qb: QuantizedBackbone,
                         threshold: float = 0.5,
                         bf16_features: bool = False
                         ) -> Callable[[Dict, Dict, jnp.ndarray], jnp.ndarray]:
    """Jittable end-to-end inference: int8 backbone -> float FPN head ->
    sigmoid>threshold masks (the reference validation contract,
    `train_cardiac_uda.py:376-426`). `bf16_features` casts the dequantized
    backbone features to bf16 before the head (the serving configuration).

    Returns `infer(head_vars, qparams, x)` — both parameter pytrees are
    ARGUMENTS so jit does not const-fold ~25M weights into the HLO (the
    known remote-compile stall mode on this target)."""
    from graphecho_tpu.models.fpn import FPN

    def infer(head_vars, qparams, x):
        feats = qb(x, qparams=qparams)
        if bf16_features:
            feats = [f.astype(jnp.bfloat16) for f in feats]
        logits, _ = fpn.apply(head_vars, feats, method=FPN.head)
        return (jax.nn.sigmoid(logits) > threshold).astype(jnp.int8)

    return infer
