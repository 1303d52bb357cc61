"""ViG (Vision GNN) graph primitives and the standalone DeepGCN backbone.

TPU re-design of the reference `models/vig.py` (credited to ViG /
Efficient-AI-Backbones in the reference README): graph convolutions over dense
kNN graphs, the `Grapher` block, FFN, Stem/Downsample, and the `pvig_*`
classifier factories.

Layout: nodes are (B, N, C) channel-last (the reference uses (B, C, N, 1)).
1x1 grouped convs become grouped Dense layers; kNN graph construction lives in
`graphecho_tpu.ops.knn` (MXU matmul + top_k; Pallas kernel for large N).

MRConv channel interleaving: the reference concatenates x and the aggregated
neighbour tensor along a new dim then reshapes to 2C channels
(`vig.py:104`), producing [x_c0, agg_c0, x_c1, agg_c1, ...] interleaved
channel order — reproduced here exactly since the following conv is grouped.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from graphecho_tpu.ops.knn import dilated_knn_graph, gather_neighbors

Dtype = Any


# ------------------------------------------------------------ pos embeddings
def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size², embed_dim) sin-cos embedding (`vig.py:38-85`)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_relative_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(N, N) relative position bias from sincos embeddings (`vig.py:21-29`)."""
    pos = get_2d_sincos_pos_embed(embed_dim, grid_size)
    return 2 * (pos @ pos.T) / pos.shape[1]


def _torch_cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel with torch's a=-0.75 (jax.image uses the Keys
    a=-0.5 spline — numerically different near ties)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0))


def _torch_bicubic_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) 1-D resize matrix reproducing torch
    `F.interpolate(mode='bicubic', align_corners=False)`: half-pixel source
    coords, 4 taps, indices clamped to the border (weights accumulate there).
    """
    scale = n_in / n_out
    w = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        x = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for t in range(-1, 3):
            idx = min(max(x0 + t, 0), n_in - 1)
            w[o, idx] += _torch_cubic_weight(np.float64(x - (x0 + t)))
    return w


@functools.lru_cache(maxsize=None)
def _relative_pos_const(channels: int, n: int, n_reduced: int) -> np.ndarray:
    """Precompute -relative_pos interpolated to (n, n_reduced) with
    torch-exact bicubic, matching the Grapher buffer (`vig.py:406-412`).
    Separable matmul weights rather than gather-resize (TPU-friendly and
    reproduces torch's a=-0.75 kernel, which `jax.image.resize` does not)."""
    rel = get_2d_relative_pos_embed(channels, int(n**0.5)).astype(np.float32)
    wr = _torch_bicubic_matrix(n, rel.shape[0])
    wc = _torch_bicubic_matrix(n_reduced, rel.shape[1])
    return np.asarray(-(wr @ rel @ wc.T), np.float32)


# ------------------------------------------------------------- basic layers
class BasicConv(nn.Module):
    """Stack of grouped 1x1 convs + optional norm + act (`vig.py:476-500`).
    Operates on (B, N, C) node tensors."""

    channels: Sequence[int]
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    groups: int = 4
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (1,), use_bias=self.bias,
                        feature_group_count=self.groups, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"conv_{i}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 axis_name=self.bn_axis_name, name=f"bn_{i}")(x)
            if self.act:
                x = _act(self.act)(x)
        return x


def _act(name: str):
    return {"relu": nn.relu, "gelu": nn.gelu,
            "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
            "hswish": nn.hard_swish}[name.lower()]


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng: Optional[jax.Array]) -> jnp.ndarray:
    """Stochastic depth on the batch dim (timm DropPath equivalent)."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0)


# ------------------------------------------------------------- graph convs
class MRConv(nn.Module):
    """Max-Relative graph conv (`vig.py:88-105`)."""

    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, nn_idx, y=None, train: bool = False):
        """x: (B, N, C); nn_idx: (B, N, k) into y (defaults to x)."""
        src = x if y is None else y
        x_j = gather_neighbors(src, nn_idx)  # (B, N, k, C)
        agg = jnp.max(x_j - x[:, :, None, :], axis=2)  # (B, N, C)
        # interleave channels [x_c0, agg_c0, x_c1, agg_c1, ...] (`vig.py:104`)
        b, n, c = x.shape
        mixed = jnp.stack([x, agg], axis=-1).reshape(b, n, 2 * c)
        return BasicConv([self.out_channels], self.act, self.norm, self.bias,
                         dtype=self.dtype, name="nn")(mixed, train)


class EdgeConv(nn.Module):
    """Edge conv with max aggregation (`vig.py:108-123`)."""

    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, nn_idx, y=None, train: bool = False):
        src = x if y is None else y
        x_j = gather_neighbors(src, nn_idx)  # (B, N, k, C)
        x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
        h = jnp.concatenate([x_i, x_j - x_i], axis=-1)  # (B, N, k, 2C)
        b, n, k, c2 = h.shape
        h = BasicConv([self.out_channels], self.act, self.norm, self.bias,
                      dtype=self.dtype, name="nn")(h.reshape(b, n * k, c2), train)
        return jnp.max(h.reshape(b, n, k, -1), axis=2)


class GraphSAGE(nn.Module):
    """GraphSAGE conv (`vig.py:126-141`)."""

    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, nn_idx, y=None, train: bool = False):
        src = x if y is None else y
        x_j = gather_neighbors(src, nn_idx)
        b, n, k, c = x_j.shape
        h = BasicConv([c], self.act, self.norm, self.bias, dtype=self.dtype,
                      name="nn1")(x_j.reshape(b, n * k, c), train)
        h = jnp.max(h.reshape(b, n, k, -1), axis=2)
        return BasicConv([self.out_channels], self.act, self.norm, self.bias,
                         dtype=self.dtype, name="nn2")(
            jnp.concatenate([x, h], axis=-1), train)


class GINConv(nn.Module):
    """GIN conv (`vig.py:144-160`)."""

    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, nn_idx, y=None, train: bool = False):
        src = x if y is None else y
        x_j = jnp.sum(gather_neighbors(src, nn_idx), axis=2)
        eps = self.param("eps", nn.initializers.zeros, (1,))
        return BasicConv([self.out_channels], self.act, self.norm, self.bias,
                         dtype=self.dtype, name="nn")((1 + eps) * x + x_j, train)


_GRAPH_CONVS = {"mr": MRConv, "edge": EdgeConv, "sage": GraphSAGE, "gin": GINConv}


class GraphConv(nn.Module):
    """Dispatcher (`vig.py:163-181`)."""

    out_channels: int
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, nn_idx, y=None, train: bool = False):
        return _GRAPH_CONVS[self.conv](self.out_channels, self.act, self.norm,
                                       self.bias, dtype=self.dtype,
                                       name="gconv")(x, nn_idx, y, train)


class DyGraphConv(nn.Module):
    """Dynamic graph conv with optional r-pooled key set (`vig.py:184-206`).
    Input/output are NHWC feature maps."""

    out_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    r: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, relative_pos=None, train: bool = False):
        b, h, w, c = x.shape
        y = None
        if self.r > 1:
            y = nn.avg_pool(x, (self.r, self.r), (self.r, self.r))
            y = y.reshape(b, -1, c)
        nodes = x.reshape(b, -1, c)
        rng = None
        use_stoch = self.stochastic and train
        if use_stoch:
            rng = self.make_rng("dropout")
        nn_idx = dilated_knn_graph(nodes, y, self.kernel_size, self.dilation,
                                   relative_pos, stochastic=use_stoch, rng=rng)
        out = GraphConv(self.out_channels, self.conv, self.act, self.norm,
                        self.bias, dtype=self.dtype, name="gc")(
            nodes, nn_idx, y, train)
        return out.reshape(b, h, w, -1)


class Grapher(nn.Module):
    """fc1 -> graph conv -> fc2 with drop-path residual (`vig.py:384-430`)."""

    in_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    r: int = 1
    n: int = 196
    drop_path_rate: float = 0.0
    relative_pos: bool = False
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype,
                                       axis_name=self.bn_axis_name, name=name)
        x = bn("bn1")(nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                              name="fc1")(x))
        rel = None
        if self.relative_pos:
            n = x.shape[1] * x.shape[2]
            rel = jnp.asarray(_relative_pos_const(
                self.in_channels, n, n // (self.r * self.r)))[None]
        x = DyGraphConv(self.in_channels * 2, self.kernel_size, self.dilation,
                        self.conv, self.act, self.norm, self.bias,
                        self.stochastic, self.epsilon, self.r,
                        dtype=self.dtype, name="graph_conv")(x, rel, train)
        x = bn("bn2")(nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                              name="fc2")(x))
        rng = self.make_rng("dropout") if (train and self.drop_path_rate > 0) else None
        return drop_path(x, self.drop_path_rate, not train, rng) + shortcut


class FFN(nn.Module):
    """conv1x1 MLP with drop-path residual (`vig.py:524-546`)."""

    hidden: int
    out: int
    act: str = "relu"
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype,
                                       axis_name=self.bn_axis_name, name=name)
        x = bn("bn1")(nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x))
        x = _act(self.act)(x)
        x = bn("bn2")(nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(x))
        rng = self.make_rng("dropout") if (train and self.drop_path_rate > 0) else None
        return drop_path(x, self.drop_path_rate, not train, rng) + shortcut


class Stem(nn.Module):
    """2x stride-2 conv patch embed (`vig.py:549-568`)."""

    out_dim: int
    act: str = "relu"
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype,
                                       axis_name=self.bn_axis_name, name=name)
        # explicit (1,1) padding: XLA "SAME" at stride 2 pads (0,1), a shifted
        # sampling grid vs the reference's `padding=1` (`vig.py:553-566`)
        pad1 = [(1, 1), (1, 1)]
        x = _act(self.act)(bn("bn1")(nn.Conv(self.out_dim // 2, (3, 3), (2, 2),
                                             padding=pad1, dtype=self.dtype,
                                             name="conv1")(x)))
        x = _act(self.act)(bn("bn2")(nn.Conv(self.out_dim, (3, 3), (2, 2),
                                             padding=pad1, dtype=self.dtype,
                                             name="conv2")(x)))
        return bn("bn3")(nn.Conv(self.out_dim, (3, 3), padding="SAME",
                                 dtype=self.dtype, name="conv3")(x))


class Downsample(nn.Module):
    """stride-2 conv downsample (`vig.py:571-583`)."""

    out_dim: int
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit (1,1): torch `padding=1` semantics at stride 2 (`vig.py:577`)
        x = nn.Conv(self.out_dim, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            axis_name=self.bn_axis_name, name="bn")(x)


class DeepGCN(nn.Module):
    """Pyramid ViG classifier (`vig.py:586-651`)."""

    blocks: Sequence[int] = (2, 2, 6, 2)
    channels: Sequence[int] = (48, 96, 240, 384)
    k: int = 9
    conv: str = "mr"
    act: str = "gelu"
    norm: str = "batch"
    bias: bool = True
    epsilon: float = 0.2
    stochastic: bool = False
    drop_path_rate: float = 0.0
    dropout: float = 0.0
    n_classes: int = 1000
    img_size: int = 224
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_blocks = sum(self.blocks)
        dpr = np.linspace(0, self.drop_path_rate, n_blocks)
        max_dilation = 49 // self.k
        reduce_ratios = [4, 2, 1, 1]

        x = Stem(self.channels[0], self.act, dtype=self.dtype,
                 bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        hw = self.img_size // 4
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, hw, hw, self.channels[0]))
        x = x + pos
        n = hw * hw

        idx = 0
        for i, (n_blk, ch) in enumerate(zip(self.blocks, self.channels)):
            if i > 0:
                x = Downsample(ch, dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name=f"down_{i}")(x, train)
                n = n // 4
            for j in range(n_blk):
                x = Grapher(ch, self.k, min(idx // 4 + 1, max_dilation),
                            self.conv, self.act, self.norm, self.bias,
                            self.stochastic, self.epsilon, reduce_ratios[i],
                            n=n, drop_path_rate=float(dpr[idx]),
                            relative_pos=True, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name,
                            name=f"grapher_{idx}")(x, train)
                x = FFN(ch * 4, ch, self.act, float(dpr[idx]),
                        dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                        name=f"ffn_{idx}")(x, train)
                idx += 1

        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name="pred_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.bn_axis_name, name="pred_bn")(x)
        x = _act(self.act)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="pred_conv2")(x)
        return x[:, 0, 0, :]


def pvig_ti(**kw) -> DeepGCN:
    """`pvig_ti_224_gelu` (`vig.py:655-676`)."""
    return DeepGCN(blocks=(2, 2, 6, 2), channels=(48, 96, 240, 384), **kw)


def pvig_s(**kw) -> DeepGCN:
    """`pvig_s_224_gelu` (`vig.py:680-701`)."""
    return DeepGCN(blocks=(2, 2, 6, 2), channels=(80, 160, 400, 640), **kw)


def pvig_m(**kw) -> DeepGCN:
    """`pvig_m_224_gelu` (`vig.py:705-726`)."""
    return DeepGCN(blocks=(2, 2, 16, 2), channels=(96, 192, 384, 768), **kw)


def pvig_b(**kw) -> DeepGCN:
    """`pvig_b_224_gelu` (`vig.py:730-751`)."""
    return DeepGCN(blocks=(2, 2, 18, 2), channels=(128, 256, 512, 1024), **kw)
