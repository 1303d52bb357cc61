"""Dense kNN graph construction on TPU.

Re-implements the reference ViG graph builders
(`/root/reference/models/vig.py:232-381`): pairwise squared-distance matrices
computed under stop-gradient, top-k neighbour selection, optional dilation.

TPU mapping: the distance matrix is one MXU matmul (-2 x·yᵀ) plus rank-1
corrections; neighbour selection is `jax.lax.top_k` (TPU sort). Unlike the
reference there is no >10k chunked path — at ViG node counts (≤ 4096) the full
(N, N) matrix is small; the Pallas fused kernel in
`graphecho_tpu.ops.pallas.knn_kernel` covers larger N without materializing
the full matrix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sq_distance(x: jnp.ndarray, y: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """x: (B, N, C), y: (B, M, C) -> (B, N, M) squared Euclidean distances.
    Computed under stop_gradient like the reference's `with torch.no_grad()`
    (`vig.py:240,270`)."""
    x = jax.lax.stop_gradient(x)
    y = x if y is None else jax.lax.stop_gradient(y)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (B, N, 1)
    y_sq = jnp.sum(y * y, axis=-1, keepdims=True)  # (B, M, 1)
    inner = jnp.einsum("bnc,bmc->bnm", x, y, preferred_element_type=jnp.float32)
    return x_sq - 2.0 * inner + jnp.swapaxes(y_sq, -2, -1)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def dense_knn(x: jnp.ndarray, y: Optional[jnp.ndarray] = None, k: int = 16,
              relative_pos: Optional[jnp.ndarray] = None,
              n_part: int = 10000) -> jnp.ndarray:
    """kNN indices of each x-node among y-nodes (y defaults to x).

    x: (B, N, C), y: (B, M, C) -> nn_idx (B, N, k) int32.
    Mirrors `dense_knn_matrix`/`xy_dense_knn_matrix` (`vig.py:277-329`); the
    reference also returns a center-index tensor which is just broadcast
    arange — callers here use implicit centers. Beyond `n_part` query points
    the distance matrix is computed in query chunks (the reference's
    `part_pairwise_distance` memory-efficient path, `vig.py:288-301`).
    """
    n = x.shape[1]
    if n > n_part:
        yy = x if y is None else y
        b, m = x.shape[0], yy.shape[1]
        pad = (-n) % n_part
        xq = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        chunks = jnp.swapaxes(
            xq.reshape(b, -1, n_part, x.shape[-1]), 0, 1)

        if relative_pos is not None:
            # per-chunk bias slice, like the reference's
            # `relative_pos[:, start:end]` (`vig.py:297-298`). The bias keeps
            # its own leading dim (usually 1) — broadcasting it to the batch
            # here would materialize b*(N,M) floats, defeating the chunked
            # path's memory purpose; the add inside the chunk broadcasts.
            rp = relative_pos[None] if relative_pos.ndim == 2 else relative_pos
            rb = rp.shape[0]
            if pad:
                rp = jnp.pad(rp, ((0, 0), (0, pad), (0, 0)))
            rp_chunks = jnp.swapaxes(rp.reshape(rb, -1, n_part, m), 0, 1)

            def one_chunk_rp(args):
                q, r = args
                _, idx = jax.lax.top_k(-(pairwise_sq_distance(q, yy) + r), k)
                return idx.astype(jnp.int32)

            idx = jax.lax.map(one_chunk_rp, (chunks, rp_chunks))
        else:
            def one_chunk(q):
                _, idx = jax.lax.top_k(-pairwise_sq_distance(q, yy), k)
                return idx.astype(jnp.int32)

            idx = jax.lax.map(one_chunk, chunks)
        idx = jnp.swapaxes(idx, 0, 1).reshape(b, -1, k)
        return idx[:, :n]
    dist = pairwise_sq_distance(x, y)
    if relative_pos is not None:
        dist = dist + relative_pos
    _, nn_idx = jax.lax.top_k(-dist, k)
    return nn_idx.astype(jnp.int32)


def _use_pallas_knn(x: jnp.ndarray, y: Optional[jnp.ndarray],
                    has_rel: bool) -> bool:
    """Use the fused Pallas kernel on TPU when the problem is big enough for
    the HBM saving to matter and the key set fits VMEM (measured 10x vs the
    XLA dist+top_k path at DeepGCN sizes)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except RuntimeError:  # pragma: no cover
        return False
    from graphecho_tpu.ops.pallas.knn_kernel import knn_vmem_ok

    n = x.shape[1]
    m = (y if y is not None else x).shape[1]
    return n * m >= 256 * 256 and knn_vmem_ok(n, m, x.shape[-1],
                                              has_rel=has_rel)


def dilated_knn_graph(x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                      k: int = 9, dilation: int = 1,
                      relative_pos: Optional[jnp.ndarray] = None,
                      stochastic: bool = False,
                      rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """L2-normalize then kNN over k*dilation neighbours, take every
    `dilation`-th (`DenseDilatedKnnGraph`, `vig.py:357-381`). With
    `stochastic` and an rng, sample k of the k*d candidates instead
    (`DenseDilated`, `:344-351`). Dispatches to the fused Pallas kernel on
    TPU for large node sets."""
    if _use_pallas_knn(x, y, relative_pos is not None):
        from graphecho_tpu.ops.pallas.knn_kernel import pallas_knn

        idx = pallas_knn(x, y, k=k * dilation, normalize=True,
                         relative_pos=relative_pos)
    else:
        xn = l2_normalize(x, axis=-1)
        yn = l2_normalize(y, axis=-1) if y is not None else None
        idx = dense_knn(xn, yn, k * dilation, relative_pos)
    if stochastic and rng is not None:
        perm = jax.random.permutation(rng, k * dilation)[:k]
        return idx[..., perm]
    return idx[..., ::dilation]


def gather_neighbors(y: jnp.ndarray, nn_idx: jnp.ndarray) -> jnp.ndarray:
    """y: (B, M, C), nn_idx: (B, N, k) -> (B, N, k, C) neighbour features
    (`batched_index_select`, `vig.py:209-229`).

    Implemented as a flat row-gather over the (B*M, C) view — measured 1.5x
    faster on v5e than the equivalent take_along_axis (2.17 vs 3.24 ms at
    B=4, N=M=3136, k=9, C=192)."""
    b, m, c = y.shape
    _, n, k = nn_idx.shape
    yf = y.reshape(b * m, c)
    base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None, None]
    flat_idx = (nn_idx.astype(jnp.int32) + base).reshape(-1)
    return jnp.take(yf, flat_idx, axis=0).reshape(b, n, k, c)


def knn_edges_reference_format(x: jnp.ndarray, y: Optional[jnp.ndarray],
                               k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (nn_idx, center_idx) like the reference stack layout
    (`vig.py:308-309`) — for parity tests."""
    nn_idx = dense_knn(x, y, k)
    b, n, _ = nn_idx.shape
    center = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None],
                              (b, n, k))
    return nn_idx, center
