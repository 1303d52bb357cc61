"""On-device spectral clustering for the seed memory bank.

The reference calls sklearn's `SpectralClustering(2,
affinity='nearest_neighbors', n_neighbors=n//2, assign_labels='kmeans')` on
CPU inside the train step (`/root/reference/models/graph_matching.py:539-543`)
— a host sync every step. This module re-implements the same algorithmic
pipeline fully on-device with static shapes:

  1. kNN connectivity graph (k = n_valid // 2) from pairwise Euclidean
     distances, symmetrized 0.5*(A + A^T) like sklearn;
  2. symmetric normalized Laplacian;
  3. Fiedler vector — either a deflated Lanczos solve (`solver="lanczos"`,
     the default: the seed update runs under stop_gradient, so a
     non-differentiable iterative solver is fine and ~6x faster than TPU
     eigh at these sizes) or full `jnp.linalg.eigh` (`solver="eigh"`);
  4. 1-D k-means (2 clusters) on the Fiedler embedding, Lloyd iterations
     under `lax.fori_loop`.

The Lanczos path exploits that the symmetric normalized Laplacian's null
vector is known analytically (D^{1/2}·1 on the valid subgraph): the Krylov
space is kept orthogonal to it, so the SMALLEST Ritz pair approximates the
Fiedler pair directly. Exhausted Krylov directions (beta -> 0, e.g. small
valid blocks) are pushed to the top of the Ritz spectrum so they are never
selected.

Padded (invalid) rows are isolated from the graph and pushed to high
eigenvalues with a diagonal penalty so they never enter the Fiedler vector.
Numerics differ from sklearn (LOBPCG vs Lanczos/eigh, k-means init) but the
clustering semantics — split the class's nodes in two, keep the subcluster
containing the seed — are preserved.

NOTE: the Lanczos solve is iterative, but at the production operating point
(k = n/2 dense kNN graphs, n <= 113, m = 24 with full reorthogonalization)
the Krylov space typically EXHAUSTS (beta -> 0), making the Ritz pair exact
within an invariant subspace — measured residual 0.0 and bipartitions
identical to `eigh` across blob/separated/near-degenerate probes (see
`test_spectral_quality_flags_near_degenerate`). For the cases where it does
not converge, the solve now carries a runtime signal: the Paige residual
bound |β_m·s_m| of the selected Ritz pair is checked against `ritz_tol`
and an unconverged solve reports not-ok, routing `seed_consistent_mean`
callers to the plain-mean fallback (the reference's own fallback for
swallowed sklearn failures, `graph_matching.py:544-546`). Parity-sensitive
reproduction runs can still set `GModuleConfig.spectral_solver="eigh"`
(exact dense solve; ~6x slower at these sizes but still fully on-device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=-1)
    d = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    return jnp.maximum(d, 0.0)


def _fiedler_lanczos(lap: jnp.ndarray, deg: jnp.ndarray, fvalid: jnp.ndarray,
                     m: int = 24, probe_margin: float = 0.05
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fiedler vector of a symmetric normalized Laplacian via m-step Lanczos
    with deflation of the analytic null vector v0 = D^{1/2}·1 (L_sym·v0 = 0
    exactly wherever deg > 0). Returns (fiedler (N,), residual scalar,
    missed_lower bool) where residual = |beta_m · s_m| is the standard
    Lanczos bound on ||L·y − θ·y|| for the selected Ritz pair — large when
    the Krylov space has not isolated the Fiedler direction
    (ambiguous/near-degenerate clusters), letting callers fall back instead
    of drifting silently.

    CAVEAT (r4 advisor): the Paige residual certifies convergence to SOME
    eigenpair within the explored Krylov subspace — if the deterministic
    start vector is (near-)orthogonal to the Fiedler direction (possible on
    highly structured/symmetric node sets), the space exhausts (beta -> 0),
    residual is 0, and the certified pair is not the Fiedler pair. The
    `missed_lower` flag is the secondary check for exactly that: a short
    restarted Lanczos from a SECOND deterministic start vector, confined to
    the orthogonal complement of the explored space (reorthogonalized
    against v0 and the full primary basis each step), reports True when it
    finds a Ritz value below the accepted one — proof the primary solve
    missed a lower eigenpair. Callers should treat missed_lower=True as
    solve-not-ok (plain-mean fallback). The probe is ~m2/m of the primary
    solve's cost; it is a detector, not a complete certificate (a complement
    direction mixing high modes can hide a low eigenvalue from a short
    probe), which is why it gates quality rather than replacing the solve.
    `probe_margin` is how far BELOW theta the probe's Ritz value must land
    to count as "missed" — callers pass their residual tolerance so the two
    quality checks share one resolution scale (a missed eigenvalue within
    `probe_margin` of theta is by the same token within the tolerance the
    caller already accepts on the residual side)."""
    n = lap.shape[0]
    v0 = jnp.sqrt(jnp.maximum(deg, 0.0)) * fvalid
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-12)

    # deterministic hash-noise start vector confined to the valid block
    # (invalid rows are decoupled, diag ~11 — keep Krylov out of them)
    i = jnp.arange(n, dtype=lap.dtype)
    x = jnp.sin(i * 12.9898 + 78.233) * 43758.5453
    x = (x - jnp.floor(x) - 0.5) * fvalid
    x = x - jnp.dot(v0, x) * v0

    big_ritz = jnp.asarray(1e3, lap.dtype)  # park dead slots above the spectrum

    def body(j, carry):
        q_mat, alphas, betas, q, q_prev, beta_prev, alive = carry
        q_mat = q_mat.at[j].set(q)
        w = lap @ q
        alpha = jnp.dot(q, w)
        w = w - alpha * q - beta_prev * q_prev
        # full reorthogonalization: against v0 and all previous q's
        w = w - jnp.dot(v0, w) * v0
        w = w - q_mat.T @ (q_mat @ w)
        beta = jnp.linalg.norm(w)
        next_alive = alive & (beta > 1e-6)
        alphas = alphas.at[j].set(jnp.where(alive, alpha, big_ritz))
        betas = betas.at[j].set(jnp.where(next_alive, beta, 0.0))
        q_next = jnp.where(next_alive, w / jnp.maximum(beta, 1e-12),
                           jnp.zeros_like(w))
        return (q_mat, alphas, betas, q_next, q, jnp.where(next_alive, beta, 0.0),
                next_alive)

    norm0 = jnp.linalg.norm(x)
    q1 = jnp.where(norm0 > 1e-12, x / jnp.maximum(norm0, 1e-12),
                   jnp.zeros_like(x))
    carry = (jnp.zeros((m, n), lap.dtype), jnp.full((m,), big_ritz, lap.dtype),
             jnp.zeros((m,), lap.dtype), q1, jnp.zeros_like(q1),
             jnp.asarray(0.0, lap.dtype), norm0 > 1e-12)
    # unroll: the body is ~15 tiny ops on (m,n)/(n,)-sized operands whose TPU
    # cost is per-op dispatch, not FLOPs — unrolling lets XLA fuse across
    # iterations (the matvec chain stays sequential either way)
    q_mat, alphas, betas, *_ = jax.lax.fori_loop(0, m, body, carry, unroll=4)

    # Ritz problem on the tridiagonal (m x m — cheap even as dense eigh)
    t = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1))
    vals, s = jnp.linalg.eigh(t)
    # residual bound for the smallest (= Fiedler, v0 deflated) Ritz pair:
    # ||L·y − θ·y|| = |β_m| · |s[m-1, 0]| (Paige); β_m is the would-be next
    # off-diagonal. A dead Krylov space (beta -> 0) means exact convergence
    # within the explored subspace — residual 0 by construction.
    residual = jnp.abs(betas[m - 1]) * jnp.abs(s[m - 1, 0])
    theta = vals[0]  # dead slots are parked at big_ritz, never selected

    # Secondary probe (see CAVEAT above): short Lanczos from a second
    # deterministic start, kept orthogonal to v0 AND the primary basis, so it
    # explores only directions the primary solve never saw. Finding a Ritz
    # value below theta there proves the primary pair is not the lowest.
    m2 = 6
    z = jnp.sin(i * 7.5625 + 17.341) * 24681.357
    z = (z - jnp.floor(z) - 0.5) * fvalid
    z = z - jnp.dot(v0, z) * v0
    z = z - q_mat.T @ (q_mat @ z)
    nz = jnp.linalg.norm(z)
    # an (near-)empty complement means the primary space is invariant and
    # complete — nothing to miss
    probe_live = nz > 1e-6

    def body2(j, carry):
        p_mat, alphas2, betas2, q, q_prev, beta_prev, alive = carry
        p_mat = p_mat.at[j].set(q)
        w = lap @ q
        alpha = jnp.dot(q, w)
        w = w - alpha * q - beta_prev * q_prev
        w = w - jnp.dot(v0, w) * v0
        w = w - q_mat.T @ (q_mat @ w)   # stay out of the explored space
        w = w - p_mat.T @ (p_mat @ w)
        beta = jnp.linalg.norm(w)
        next_alive = alive & (beta > 1e-6)
        alphas2 = alphas2.at[j].set(jnp.where(alive, alpha, big_ritz))
        betas2 = betas2.at[j].set(jnp.where(next_alive, beta, 0.0))
        q_next = jnp.where(next_alive, w / jnp.maximum(beta, 1e-12),
                           jnp.zeros_like(w))
        return (p_mat, alphas2, betas2, q_next, q,
                jnp.where(next_alive, beta, 0.0), next_alive)

    z1 = jnp.where(probe_live, z / jnp.maximum(nz, 1e-12), jnp.zeros_like(z))
    carry2 = (jnp.zeros((m2, n), lap.dtype),
              jnp.full((m2,), big_ritz, lap.dtype),
              jnp.zeros((m2,), lap.dtype), z1, jnp.zeros_like(z1),
              jnp.asarray(0.0, lap.dtype), probe_live)
    _, alphas2, betas2, *_ = jax.lax.fori_loop(0, m2, body2, carry2, unroll=3)
    t2 = (jnp.diag(alphas2) + jnp.diag(betas2[:-1], 1)
          + jnp.diag(betas2[:-1], -1))
    theta2 = jnp.linalg.eigh(t2)[0][0]
    missed_lower = probe_live & (theta2 < theta - probe_margin)
    return q_mat.T @ s[:, 0], residual, missed_lower


def spectral_bipartition(points: jnp.ndarray, valid: jnp.ndarray,
                         kmeans_iters: int = 10,
                         solver: str = "lanczos",
                         k: Optional[jnp.ndarray] = None,
                         with_quality: bool = False,
                         ritz_tol: float = 0.05,
                         lanczos_steps: int = 24):
    """Split `points` (N, C) into 2 clusters; returns (N,) int32 in {0, 1}.

    `valid` (N,) masks real rows; invalid rows get cluster -1. `k` is the kNN
    graph's neighbor count; defaults to n_valid // 2. (`seed_consistent_mean`
    passes the reference's `n_neighbors=len(bs)//2` where `bs` EXCLUDES the
    prepended seed row, `graph_matching.py:538-540`.)
    `solver`: 'lanczos' (fast, default) | 'eigh' (exact dense solve).
    `with_quality`: also return a scalar bool — True when the Fiedler solve is
    trustworthy (always for 'eigh'; for Lanczos: Ritz residual <= `ritz_tol` —
    the spectrum of L_sym lives in [0, 2], so 0.05 is a tight relative bound —
    AND the restarted complement probe found no lower eigenpair the primary
    start vector missed, with `ritz_tol` doubling as the probe's eigenvalue
    margin; see `_fiedler_lanczos`).
    The reference's own failure mode here is an sklearn exception swallowed
    into the plain-mean fallback (`graph_matching.py:544-546`); the quality
    bit routes ambiguous solves to the same fallback instead of drifting
    silently (r3 review item 5).
    """
    points = points.astype(jnp.float32)  # eigensolve/k-means need full precision
    n = points.shape[0]
    fvalid = valid.astype(points.dtype)
    n_valid = jnp.sum(fvalid).astype(jnp.int32)
    if k is None:
        k = n_valid // 2
    k = jnp.maximum(k, 1)

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

    if solver == "lanczos":
        fiedler, residual, missed_lower = _fiedler_lanczos(
            lap, deg, fvalid, m=min(lanczos_steps, max(n - 1, 1)),
            probe_margin=ritz_tol)
        solve_ok = (residual <= ritz_tol) & ~missed_lower
    else:
        _, vecs = jnp.linalg.eigh(lap)
        fiedler = vecs[:, 1]  # second-smallest eigenvector
        solve_ok = jnp.asarray(True)

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

    centers = jax.lax.fori_loop(0, kmeans_iters, lloyd, centers0, unroll=5)
    assign = (jnp.abs(fiedler[:, None] - centers[None, :])).argmin(axis=-1)
    assign = jnp.where(valid, assign.astype(jnp.int32), -1)
    return (assign, solve_ok) if with_quality else assign


def seed_consistent_mean(seed: jnp.ndarray, nodes: jnp.ndarray,
                         valid: jnp.ndarray, solver: str = "lanczos",
                         lanczos_steps: int = 24
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster [seed; nodes] in two; mean of the nodes landing in the seed's
    cluster (reference `update_seed`, `graph_matching.py:539-545`).

    Returns (mean (C,), ok scalar bool — False if the seed's subcluster is
    empty OR the Lanczos Fiedler solve did not converge (large Ritz
    residual); either way the caller should fall back to the plain mean,
    mirroring the reference's swallowed-sklearn-exception fallback
    (`graph_matching.py:544-546`)).
    """
    seed = seed.astype(jnp.float32)
    nodes = nodes.astype(jnp.float32)
    pts = jnp.concatenate([seed[None, :], nodes], axis=0)
    val = jnp.concatenate([jnp.ones((1,), bool), valid], axis=0)
    # n_neighbors counts the class NODES only, not the prepended seed row
    # (reference `n_neighbors=len(bs)//2` with `bs` = nodes, `:538-540`)
    k = jnp.sum(valid.astype(jnp.int32)) // 2
    assign, solve_ok = spectral_bipartition(pts, val, solver=solver, k=k,
                                            with_quality=True,
                                            lanczos_steps=lanczos_steps)
    keep = (assign[1:] == assign[0]) & valid
    cnt = jnp.sum(keep.astype(nodes.dtype))
    mean = jnp.sum(jnp.where(keep[:, None], nodes, 0.0), axis=0) / jnp.maximum(cnt, 1.0)
    return mean, (cnt > 0) & solve_ok
