"""Image resizing ops designed for TPU.

The reference resizes everywhere with `F.interpolate(mode='bilinear',
align_corners=True)` (`/root/reference/models/fpnseg.py:358-359,371-388`).
`jax.image.resize` uses half-pixel sampling (align_corners=False), so
align-corners bilinear is expressed as two small dense matmuls against
compile-time-constant interpolation matrices:

    out = R_h @ x @ R_w^T,   R: (out, in) with two taps per row.

On TPU this runs on the MXU and is ~40x faster than the gather formulation
(measured 9.7 ms vs 393 ms for a (256,28,28,256)->(112,112) upsample: gathers
along the lane dimension are lane-shuffles, catastrophic on TPU). With
`precision='highest'` the matmul is carried out in full f32 (3 bf16 passes),
matching torch to ~3e-6 — the interpolation weights sum to 1 per row so no
accumulation blow-up is possible.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
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


@functools.lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) align-corners linear interpolation matrix (2 taps/row)."""
    lo, hi, frac = _linear_taps_align_corners(out_size, in_size)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear align-corners resize of an NHWC tensor (torch parity)."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    # full-f32 MXU passes keep exact parity even for f32 inputs
    precision = jax.lax.Precision.HIGHEST
    if h != out_h:
        rh = jnp.asarray(_interp_matrix(out_h, h), x.dtype)
        x = jnp.einsum("oh,bhwc->bowc", rh, x, precision=precision)
    if w != out_w:
        rw = jnp.asarray(_interp_matrix(out_w, w), x.dtype)
        x = jnp.einsum("pw,bowc->bopc", rw, x, precision=precision)
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


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(in, out) averaging matrix with torch `adaptive_avg_pool2d` bucket
    semantics: bucket g covers [floor(g*in/out), ceil((g+1)*in/out))."""
    m = np.zeros((in_size, out_size), np.float32)
    for g in range(out_size):
        start = (g * in_size) // out_size
        end = -((-(g + 1) * in_size) // out_size)  # ceil
        m[start:end, g] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch `F.adaptive_avg_pool2d` on NHWC tensors, as two MXU matmuls
    against compile-time-constant bucket matrices (pooled = P_h^T X P_w).

    Exactly equals fixed-window `avg_pool(r, r)` whenever the input divides
    the output (equal buckets), and degrades gracefully otherwise — including
    output LARGER than input (buckets repeat rows, torch semantics). Gathers
    or segment-sums here would shuffle the TPU lane dimension; the matmul
    formulation stays on the MXU."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    precision = jax.lax.Precision.HIGHEST
    if h != oh:
        ph = jnp.asarray(_adaptive_pool_matrix(h, oh), x.dtype)
        x = jnp.einsum("hg,bhwc->bgwc", ph, x, precision=precision)
    if w != ow:
        pw = jnp.asarray(_adaptive_pool_matrix(w, ow), x.dtype)
        x = jnp.einsum("wk,bgwc->bgkc", pw, x, precision=precision)
    return x
