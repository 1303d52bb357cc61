"""Static-shape FCOS-style node sampling for the graph-matching head.

TPU re-design of the reference `PrototypeComputation`
(`/root/reference/models/graph_matching.py:861-1065`) and its helpers
`compute_locations` (`:609-635`) / `masks_to_boxes` (`:702-746`).

The reference produces a data-dependent number of nodes via boolean indexing —
impossible under XLA's static-shape model. Here every level contributes a FIXED
budget of positive and background node slots plus a validity mask:

  * positives: up to `pos_budget_per_level` evenly-spaced positives in flat
    (B·H·W) order — the static analogue of the reference's stride subsample
    (`:985-991`; the reference can keep up to 2x the budget when
    `budget < num_pos < 2*budget`, we cap at the budget);
  * background: `taken_pos // bg_ratio` linspace-spaced negatives (`:1001`).

Note on the reference's two sampler branches: in the shipped configuration
(`head_in_cfg == 'LN'`), BOTH domains go through the box/FCOS branch — the
target's "boxes" are derived from thresholded score maps by the caller
(`graph_matching.py:254-256`), so source and target labels share one space
(box index). The act-map branch (`:1016-1065`) is only reachable from the dead
`head_in_cfg != 'LN'` path.

All functions are pure and jit-compatible (static shapes everywhere).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from graphecho_tpu.config import NodeSamplerConfig

INF = 1e8
# NOTE: keep this a Python int. A module-level device array captured as a jit
# constant stalls the axon remote-compile service for minutes (observed 78s+
# vs ~1s compile for the identical graph with an inline literal).
_BIG = 2**30


class NodeSet(NamedTuple):
    """A fixed-size set of sampled nodes with validity mask."""

    points: jnp.ndarray  # (N, C) node features
    labels: jnp.ndarray  # (N,) int32 class labels (0 = background)
    weights: jnp.ndarray  # (N,) float loss weights
    valid: jnp.ndarray  # (N,) bool


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes of per-channel binary masks.

    masks: (B, H, W, C) -> boxes (B, C, 4) in (x1, y1, x2, y2); a channel with
    no foreground maps to the full-image box [0, 0, W, H] — reproducing the
    reference's empty-mask fallback (`graph_matching.py:728-733`).
    """
    b, h, w, c = masks.shape
    nz = masks != 0
    any_x = jnp.any(nz, axis=1)  # (B, W, C) column has fg
    any_y = jnp.any(nz, axis=2)  # (B, H, C) row has fg
    xs = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x1 = jnp.min(jnp.where(any_x, xs, INF), axis=1)
    x2 = jnp.max(jnp.where(any_x, xs, -INF), axis=1)
    y1 = jnp.min(jnp.where(any_y, ys, INF), axis=1)
    y2 = jnp.max(jnp.where(any_y, ys, -INF), axis=1)
    empty = ~jnp.any(any_x, axis=1)
    x1 = jnp.where(empty, 0.0, x1)
    y1 = jnp.where(empty, 0.0, y1)
    x2 = jnp.where(empty, float(w), x2)
    y2 = jnp.where(empty, float(h), y2)
    return jnp.stack([x1, y1, x2, y2], axis=-1)  # (B, C, 4)


def compute_locations(shapes: Sequence[Tuple[int, int]],
                      strides: Sequence[int]) -> List[jnp.ndarray]:
    """Per-level (H*W, 2) location grids: (x, y) = index*stride + stride//2
    (`graph_matching.py:621-635`). Uses the reference's stride table even
    though the actual FPN strides differ (reference quirk, SURVEY §3.3)."""
    out = []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) * s + s // 2
        sy = jnp.arange(h, dtype=jnp.float32) * s + s // 2
        gx, gy = jnp.meshgrid(sx, sy)  # gy rows vary y
        out.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1))
    return out


def fcos_labels(locations: jnp.ndarray, boxes: jnp.ndarray,
                soi: Tuple[float, float]) -> jnp.ndarray:
    """FCOS assignment of one level's locations to per-image boxes.

    locations: (HW, 2); boxes: (B, K, 4). Returns (B, HW) int32 labels where
    label = index of the min-area containing box whose max regression distance
    falls in this level's size-of-interest range, else 0
    (`graph_matching.py:913-959`; box k gets label k, `:923`).
    """
    xs = locations[:, 0][None, :, None]  # (1, HW, 1)
    ys = locations[:, 1][None, :, None]
    x1 = boxes[:, None, :, 0]
    y1 = boxes[:, None, :, 1]
    x2 = boxes[:, None, :, 2]
    y2 = boxes[:, None, :, 3]
    l = xs - x1
    t = ys - y1
    r = x2 - xs
    b = y2 - ys
    reg = jnp.stack([l, t, r, b], axis=-1)  # (B, HW, K, 4)
    in_box = jnp.min(reg, axis=-1) > 0
    max_reg = jnp.max(reg, axis=-1)
    cared = (max_reg >= soi[0]) & (max_reg <= soi[1])
    area = ((y2 - y1) * (x2 - x1))  # (B, 1, K)
    area = jnp.broadcast_to(area, in_box.shape)
    area = jnp.where(in_box & cared, area, INF)
    min_area = jnp.min(area, axis=-1)
    label = jnp.argmin(area, axis=-1).astype(jnp.int32)
    return jnp.where(min_area >= INF, 0, label)


def _evenly_spaced_select(mask_flat: jnp.ndarray, budget: int,
                          count_override: jnp.ndarray | None = None,
                          linspace_mode: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to `budget` evenly-spaced True positions of `mask_flat`
    (preserving flat order). Returns (indices (budget,), valid (budget,)).

    linspace_mode=False: ranks floor(k * n / budget) (stride subsample);
    linspace_mode=True: ranks floor(k * (n-2) / (count-1)) (reference's
    np.linspace background sampling, `graph_matching.py:1001`).
    `count_override` caps the number of valid slots (e.g. num_pos // 8).
    """
    n_total = mask_flat.shape[0]
    counts = jnp.cumsum(mask_flat.astype(jnp.int32))  # nondecreasing
    n = counts[-1]

    k = jnp.arange(budget, dtype=jnp.int32)
    count = jnp.minimum(n, budget)
    if count_override is not None:
        count = jnp.minimum(count, count_override)
    if linspace_mode:
        denom = jnp.maximum(count - 1, 1)
        ranks = jnp.floor(k * jnp.maximum(n - 2, 0) / denom).astype(jnp.int32)
    else:
        ranks = jnp.where(n > budget, (k * n) // budget, k)
    ranks = jnp.clip(ranks, 0, jnp.maximum(n - 1, 0))
    # position of the (rank+1)-th True = first index where cumsum hits rank+1.
    # Binary search over the cumsum replaces a full argsort of B*H*W keys —
    # identical selection, O(budget*log n) instead of O(n log n) sort.
    idx = jnp.searchsorted(counts, ranks + 1, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, n_total - 1)  # n==0: all slots invalid anyway
    valid = k < count
    return idx, valid


def sample_nodes(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                 cfg: NodeSamplerConfig) -> NodeSet:
    """Sample a fixed-budget node set from FPN features.

    features: list of NHWC (B, H_l, W_l, C) maps (pre-smooth p2..p5).
    boxes: (B, K, 4) per-image boxes (from GT masks or thresholded score maps).

    Returns a NodeSet with N = n_levels * (pos_budget + bg_budget) slots.
    """
    P = cfg.pos_budget_per_level
    NB = cfg.bg_budget_per_level
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    locations = compute_locations(shapes, cfg.fpn_strides)

    pts, labs, vals = [], [], []
    for lvl, (feat, locs) in enumerate(zip(features, locations)):
        b, h, w, c = feat.shape
        labels = fcos_labels(locs, boxes, cfg.sizes_of_interest[lvl])  # (B, HW)
        flat_feat = feat.reshape(b * h * w, c)
        flat_lab = labels.reshape(-1)

        pos_mask = flat_lab > 0
        pos_idx, pos_valid = _evenly_spaced_select(pos_mask, P)
        n_pos_taken = jnp.sum(pos_valid.astype(jnp.int32))

        neg_mask = flat_lab == 0
        bg_count = n_pos_taken // cfg.bg_ratio
        bg_idx, bg_valid = _evenly_spaced_select(
            neg_mask, NB, count_override=bg_count, linspace_mode=True)

        # background first, then positives — reference concat order (`:1010`)
        idx = jnp.concatenate([bg_idx, pos_idx])
        valid = jnp.concatenate([bg_valid, pos_valid])
        lab = jnp.concatenate([jnp.zeros_like(bg_idx),
                               flat_lab[pos_idx] * pos_valid])
        pts.append(flat_feat[idx])
        labs.append(lab)
        vals.append(valid)

    points = jnp.concatenate(pts, axis=0)
    labels = jnp.concatenate(labs, axis=0).astype(jnp.int32)
    valid = jnp.concatenate(vals, axis=0)
    points = points * valid[:, None]  # zero padded slots
    weights = valid.astype(jnp.float32)  # source branch: all-ones (`:1013`)
    return NodeSet(points=points, labels=labels, weights=weights, valid=valid)
