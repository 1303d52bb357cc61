"""Host-side image transforms matching the reference's MONAI pipeline.

The reference composes AddChannel → Resized(mode='nearest') →
RandSpatialCrop/CenterSpatialCrop → EnsureType (`datasets/camus.py:142-158`,
`cardiac_uda.py:269-285`; the RandFlips it constructs are never added to the
Compose). These are re-implemented in numpy with torch-'nearest' resize
semantics (src = floor(i*in/out)) and accelerated by the native C++ dataops
library when present (`graphecho_tpu.data.native`).

`polygon_mask` replaces `skimage.draw.polygon` for the EchoNet LV-trace
rasterization (`datasets/echo.py:243-255`): even-odd scanline fill.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def nearest_resize(arr: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest resize of the LEADING two spatial dims (H, W, ...) with torch
    'nearest' semantics."""
    from graphecho_tpu.data import native

    h, w = arr.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return arr
    out = native.nearest_resize(arr, oh, ow)
    if out is not None:
        return out
    iy = np.floor(np.arange(oh) * (h / oh)).astype(np.int64)
    ix = np.floor(np.arange(ow) * (w / ow)).astype(np.int64)
    return arr[np.clip(iy, 0, h - 1)][:, np.clip(ix, 0, w - 1)]


def center_crop(arr: np.ndarray, crop_hw: Tuple[int, int]) -> np.ndarray:
    h, w = arr.shape[:2]
    ch, cw = crop_hw
    y0 = max((h - ch) // 2, 0)
    x0 = max((w - cw) // 2, 0)
    return arr[y0:y0 + ch, x0:x0 + cw]


def rand_crop(arr: np.ndarray, crop_hw: Tuple[int, int],
              rng: np.random.RandomState) -> np.ndarray:
    h, w = arr.shape[:2]
    ch, cw = crop_hw
    y0 = rng.randint(0, max(h - ch, 0) + 1)
    x0 = rng.randint(0, max(w - cw, 0) + 1)
    return arr[y0:y0 + ch, x0:x0 + cw]


def resize_and_crop(images: np.ndarray, masks: Optional[np.ndarray],
                    spatial: Tuple[int, int], crop: Tuple[int, int],
                    train: bool, rng: Optional[np.random.RandomState] = None
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """The reference transform pipeline on (H, W, ...) arrays. Images and
    masks share the same random crop (MONAI dict-transform semantics)."""
    images = nearest_resize(images, spatial)
    if masks is not None:
        masks = nearest_resize(masks, spatial)
    if train:
        rng = rng or np.random.RandomState()
        h, w = images.shape[:2]
        ch, cw = crop
        y0 = rng.randint(0, max(h - ch, 0) + 1)
        x0 = rng.randint(0, max(w - cw, 0) + 1)
        images = images[y0:y0 + ch, x0:x0 + cw]
        if masks is not None:
            masks = masks[y0:y0 + ch, x0:x0 + cw]
    else:
        images = center_crop(images, crop)
        if masks is not None:
            masks = center_crop(masks, crop)
    return images, masks


def polygon_mask(ys: Sequence[float], xs: Sequence[float],
                 shape: Tuple[int, int]) -> np.ndarray:
    """Rasterize a polygon to a float32 {0,1} mask (even-odd scanline fill;
    replaces `skimage.draw.polygon` in the EchoNet trace pipeline)."""
    from graphecho_tpu.data import native

    out = native.polygon_mask(ys, xs, shape)
    if out is not None:
        return out
    h, w = shape
    mask = np.zeros((h, w), np.float32)
    ys = np.asarray(ys, np.float64)
    xs = np.asarray(xs, np.float64)
    n = len(ys)
    if n < 3:
        return mask
    for row in range(h):
        y = row + 0.0
        nodes = []
        j = n - 1
        for i in range(n):
            if (ys[i] <= y < ys[j]) or (ys[j] <= y < ys[i]):
                t = (y - ys[i]) / (ys[j] - ys[i])
                nodes.append(xs[i] + t * (xs[j] - xs[i]))
            j = i
        nodes.sort()
        for k in range(0, len(nodes) - 1, 2):
            x0 = int(np.ceil(nodes[k]))
            x1 = int(np.floor(nodes[k + 1]))
            if x1 >= x0:
                mask[row, max(x0, 0):min(x1 + 1, w)] = 1.0
    return mask
