"""Image resizing ops designed for TPU.

The reference resizes everywhere with `F.interpolate(mode='bilinear',
align_corners=True)` (`/root/reference/models/fpnseg.py:358-359,371-388`).
`jax.image.resize` uses half-pixel sampling (align_corners=False), so we
implement align-corners bilinear as two separable 2-tap interpolations with
*compile-time-constant* gather indices and weights: under jit the indices fold
into static gathers XLA lowers efficiently, there is no MXU involvement (so no
bf16 accumulation error — bit-exact parity with torch), and the per-axis cost
is O(out) rather than the O(out·in) a dense interpolation-matrix matmul pays.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _linear_taps_align_corners(out_size: int, in_size: int
                               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo_idx, hi_idx, frac) for 1-D align-corners linear interpolation:
    out[i] = in[lo[i]] * (1-frac[i]) + in[hi[i]] * frac[i]."""
    if in_size == 1 or out_size == 1:
        lo = np.zeros(out_size, np.int64)
        return lo, lo, np.zeros(out_size, np.float32)
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size, dtype=np.float64) * scale
    lo = np.clip(np.floor(pos).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    return lo, hi, frac


@functools.lru_cache(maxsize=None)
def _nearest_index(out_size: int, in_size: int) -> np.ndarray:
    """Nearest-neighbour source indices matching torch's
    `F.interpolate(mode='nearest')`: src = floor(i * in/out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def _interp_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    lo, hi, frac = _linear_taps_align_corners(out_size, in_size)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac, x.dtype).reshape(shape)
    return x_lo * (1 - f) + x_hi * f


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear align-corners resize of an NHWC tensor (torch parity)."""
    x = _interp_axis(x, 1, out_h)
    x = _interp_axis(x, 2, out_w)
    return x


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor (torch 'nearest' semantics)."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    ih = jnp.asarray(_nearest_index(out_h, h))
    iw = jnp.asarray(_nearest_index(out_w, w))
    return x[:, ih][:, :, iw]


def upsample_add(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Upsample `x` (NHWC) to `y`'s spatial size (bilinear, align-corners) and
    add — the FPN top-down merge (`fpnseg.py:371-388`)."""
    _, h, w, _ = y.shape
    return resize_bilinear_align_corners(x, h, w) + y
