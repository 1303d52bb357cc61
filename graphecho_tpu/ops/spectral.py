"""On-device spectral clustering for the seed memory bank.

The reference calls sklearn's `SpectralClustering(2,
affinity='nearest_neighbors', n_neighbors=n//2, assign_labels='kmeans')` on
CPU inside the train step (`/root/reference/models/graph_matching.py:539-543`)
— a host sync every step. This module re-implements the same algorithmic
pipeline fully on-device with static shapes:

  1. kNN connectivity graph (k = n_valid // 2) from pairwise Euclidean
     distances, symmetrized 0.5*(A + A^T) like sklearn;
  2. symmetric normalized Laplacian;
  3. Fiedler vector via `jnp.linalg.eigh` (matrices here are <= ~130x130);
  4. 1-D k-means (2 clusters) on the Fiedler embedding, Lloyd iterations
     under `lax.fori_loop`.

Padded (invalid) rows are isolated from the graph and pushed to high
eigenvalues with a diagonal penalty so they never enter the Fiedler vector.
Numerics differ from sklearn (LOBPCG vs full eigh, k-means init) but the
clustering semantics — split the class's nodes in two, keep the subcluster
containing the seed — are preserved.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=-1)
    d = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    return jnp.maximum(d, 0.0)


def spectral_bipartition(points: jnp.ndarray, valid: jnp.ndarray,
                         kmeans_iters: int = 10) -> jnp.ndarray:
    """Split `points` (N, C) into 2 clusters; returns (N,) int32 in {0, 1}.

    `valid` (N,) masks real rows; invalid rows get cluster -1. k for the kNN
    graph is n_valid // 2, matching the reference's `n_neighbors=len(bs)//2`.
    """
    points = points.astype(jnp.float32)  # eigh/k-means need full precision
    n = points.shape[0]
    fvalid = valid.astype(points.dtype)
    n_valid = jnp.sum(fvalid).astype(jnp.int32)
    k = jnp.maximum(n_valid // 2, 1)

    d = _pairwise_sq_dists(points)
    big = jnp.asarray(1e9, d.dtype)
    pair_valid = valid[:, None] & valid[None, :]
    d = jnp.where(pair_valid, d, big)
    d = jnp.where(jnp.eye(n, dtype=bool), big, d)  # exclude self from kNN

    # rank-based kNN via double argsort (O(N² log N), vmap-friendly — an
    # (N,N,N) comparison tensor would dominate compile and memory)
    order = jnp.argsort(d, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    a = (rank < k) & pair_valid
    a = 0.5 * (a.astype(points.dtype) + a.T.astype(points.dtype))

    deg = jnp.sum(a, axis=-1)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    lap = jnp.eye(n, dtype=points.dtype) - inv_sqrt[:, None] * a * inv_sqrt[None, :]
    # push invalid rows out of the low spectrum
    lap = lap + jnp.diag(10.0 * (1.0 - fvalid))

    _, vecs = jnp.linalg.eigh(lap)
    fiedler = vecs[:, 1]  # second-smallest eigenvector

    # 1-D 2-means on the Fiedler values (valid entries only)
    vmin = jnp.min(jnp.where(valid, fiedler, jnp.inf))
    vmax = jnp.max(jnp.where(valid, fiedler, -jnp.inf))
    centers0 = jnp.stack([vmin, vmax])

    def lloyd(_, centers):
        assign = (jnp.abs(fiedler[:, None] - centers[None, :])).argmin(axis=-1)
        sums = jnp.array([
            jnp.sum(jnp.where((assign == c) & valid, fiedler, 0.0)) for c in (0, 1)
        ])
        cnts = jnp.array([
            jnp.sum(((assign == c) & valid).astype(points.dtype)) for c in (0, 1)
        ])
        return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), centers)

    centers = jax.lax.fori_loop(0, kmeans_iters, lloyd, centers0)
    assign = (jnp.abs(fiedler[:, None] - centers[None, :])).argmin(axis=-1)
    return jnp.where(valid, assign.astype(jnp.int32), -1)


def seed_consistent_mean(seed: jnp.ndarray, nodes: jnp.ndarray,
                         valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster [seed; nodes] in two; mean of the nodes landing in the seed's
    cluster (reference `update_seed`, `graph_matching.py:539-545`).

    Returns (mean (C,), ok scalar bool — False if the seed's subcluster is
    empty, in which case the caller should fall back to the plain mean).
    """
    seed = seed.astype(jnp.float32)
    nodes = nodes.astype(jnp.float32)
    pts = jnp.concatenate([seed[None, :], nodes], axis=0)
    val = jnp.concatenate([jnp.ones((1,), bool), valid], axis=0)
    assign = spectral_bipartition(pts, val)
    keep = (assign[1:] == assign[0]) & valid
    cnt = jnp.sum(keep.astype(nodes.dtype))
    mean = jnp.sum(jnp.where(keep[:, None], nodes, 0.0), axis=0) / jnp.maximum(cnt, 1.0)
    return mean, cnt > 0
