"""Fused kNN-graph Pallas kernel.

The ViG graph builders (`/root/reference/models/vig.py:277-329`) materialize a
full (N, N) distance matrix in HBM and then run top-k over it. At DeepGCN
sizes (N = 3136 nodes, f32) that is ~39 MB of HBM written + re-read per
Grapher block. This kernel fuses L2-normalize → distance (MXU) → k-smallest
selection per query tile entirely in VMEM, writing only the (N, k) index
matrix.

Selection uses k passes of (min, first-arg-min, mask) over the (BQ, M) tile —
k is small (<= 32) and the passes are VPU reductions. Deterministic ties:
lowest column index wins, matching `jax.lax.top_k`'s tie order on negated
distances only up to ties (documented).

Layout: x (B, N, C), y (B, M, C); C padded to 128 lanes by the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _knn_kernel(*refs, k: int, normalize: bool, has_rel: bool):
    if has_rel:
        x_ref, y_ref, rel_ref, out_ref = refs
    else:
        x_ref, y_ref, out_ref = refs
        rel_ref = None
    q = x_ref[0]  # (BQ, C)
    kv = y_ref[0]  # (M, C)
    if normalize:
        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True),
                                          1e-24))
        kv = kv * jax.lax.rsqrt(jnp.maximum(jnp.sum(kv * kv, -1, keepdims=True),
                                            1e-24))
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # (BQ, 1)
    k_sq = jnp.sum(kv * kv, axis=-1, keepdims=True)  # (M, 1)
    d = q_sq - 2.0 * jnp.dot(q, kv.T, preferred_element_type=jnp.float32) \
        + k_sq.T  # (BQ, M)
    if rel_ref is not None:
        d = d + rel_ref[0]

    bq, m = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, m), 1)

    picked = []
    for _ in range(k):  # k is small and static: unrolled min/argmin passes
        row_min = jnp.min(d, axis=1, keepdims=True)
        hit = d <= row_min
        idx = jnp.min(jnp.where(hit, cols, jnp.int32(2**30)), axis=1)
        picked.append(idx)
        d = jnp.where(cols == idx[:, None], 1e30, d)
    out_ref[0] = jnp.stack(picked, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "normalize", "block_q",
                                             "interpret"))
def pallas_knn(x: jnp.ndarray, y: Optional[jnp.ndarray] = None, k: int = 9,
               normalize: bool = True,
               relative_pos: Optional[jnp.ndarray] = None,
               block_q: int = 256, interpret: bool = False) -> jnp.ndarray:
    """x: (B, N, C), y: (B, M, C) or None (self) -> (B, N, k) int32 neighbour
    indices (smallest squared Euclidean distance, optional L2-normalization
    first like `DenseDilatedKnnGraph`). `relative_pos`: optional (1|B, N, M)
    additive distance bias (the Grapher's relative position term)."""
    if y is None:
        y = x
    b, n, c = x.shape
    m = y.shape[1]
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    y = jax.lax.stop_gradient(y).astype(jnp.float32)

    # pad channels to the 128-lane tile and queries to the block size
    c_pad = (-c) % 128
    if c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad)))
        y = jnp.pad(y, ((0, 0), (0, 0), (0, c_pad)))
    n_pad = (-n) % block_q
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

    has_rel = relative_pos is not None
    operands = [x, y]
    in_specs = [
        pl.BlockSpec((1, block_q, x.shape[-1]), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, y.shape[-1]), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_rel:
        rel = jnp.broadcast_to(relative_pos.astype(jnp.float32), (b, n, m))
        if n_pad:
            rel = jnp.pad(rel, ((0, 0), (0, n_pad), (0, 0)))
        operands.append(rel)
        in_specs.append(pl.BlockSpec((1, block_q, m), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM))

    grid = (b, (n + n_pad) // block_q)
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, normalize=normalize,
                          has_rel=has_rel),
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, k), jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
    return out[:, :n]


def knn_vmem_ok(n: int, m: int, c: int, block_q: int = 256,
                has_rel: bool = False) -> bool:
    """Conservative VMEM feasibility check for the fused kernel."""
    c_pad = c + ((-c) % 128)
    vmem = (block_q * c_pad + m * c_pad + block_q * m * (2 if has_rel else 1)) * 4
    return vmem < 12 * 1024 * 1024
