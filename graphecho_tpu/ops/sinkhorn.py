"""Sinkhorn normalization / optimal-transport ops as lax.scan loops.

TPU-native re-implementations of:
  * `sinkhorn_rpm` — slack-padded log-domain Sinkhorn used by the graph-matching
    affinity head (`/root/reference/models/graph_matching.py:637-689`);
  * `sinkhorn_distance` — entropic OT between point clouds
    (`/root/reference/utils/sinkhorn_distance.py:5-91`).

Both run a fixed number of iterations under `lax.scan` (fully differentiable,
static shapes). The reference's optional early-stopping is a CPU-side
`.item()` sync per iteration; on TPU a handful of fixed extra iterations is
cheaper than the host round-trip, and the reference default (`eps=-1`
for sinkhorn_rpm) disables early-stop anyway.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sinkhorn_rpm(log_alpha: jnp.ndarray, n_iters: int = 5, slack: bool = True,
                 row_mask: Optional[jnp.ndarray] = None,
                 col_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Log-domain Sinkhorn with optional slack row/column.

    Args:
      log_alpha: (B, J, K) log of a positive matrix.
      n_iters: number of row/col normalization rounds.
      slack: pad one slack row and column that are never normalized, so each
        real row/column sums to <= 1 (reference `graph_matching.py:654-676`).
      row_mask/col_mask: optional (B, J)/(B, K) boolean validity masks; invalid
        rows/columns are excluded from the normalization (their entries are
        pushed to -inf) so padded node slots don't absorb transport mass.

    Returns:
      (B, J, K) log of the (near) doubly-stochastic matrix.
    """
    log_alpha = log_alpha.astype(jnp.float32)  # log-domain iters need f32
    neg_inf = jnp.asarray(-1e9, log_alpha.dtype)
    if row_mask is not None:
        log_alpha = jnp.where(row_mask[:, :, None], log_alpha, neg_inf)
    if col_mask is not None:
        log_alpha = jnp.where(col_mask[:, None, :], log_alpha, neg_inf)

    if slack:
        # Pad a zero slack row + column (reference uses ZeroPad2d).
        padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))

        def body(carry, _):
            a = carry
            # Row normalization over real rows (keep slack row untouched).
            row_lse = jax.nn.logsumexp(a[:, :-1, :], axis=2, keepdims=True)
            a = jnp.concatenate([a[:, :-1, :] - row_lse, a[:, -1:, :]], axis=1)
            # Column normalization over real columns.
            col_lse = jax.nn.logsumexp(a[:, :, :-1], axis=1, keepdims=True)
            a = jnp.concatenate([a[:, :, :-1] - col_lse, a[:, :, -1:]], axis=2)
            return a, None

        # unroll: each iteration is 2 logsumexps + 2 concats on a small
        # (B, J+1, K+1) block — per-op overhead dominates on TPU, and
        # unrolling lets XLA fuse across iterations
        padded, _ = jax.lax.scan(body, padded, None, length=n_iters,
                                 unroll=min(4, n_iters))
        out = padded[:, :-1, :-1]
    else:

        def body(carry, _):
            a = carry
            a = a - jax.nn.logsumexp(a, axis=2, keepdims=True)
            a = a - jax.nn.logsumexp(a, axis=1, keepdims=True)
            return a, None

        out, _ = jax.lax.scan(body, log_alpha, None, length=n_iters,
                              unroll=min(4, n_iters))

    if row_mask is not None:
        out = jnp.where(row_mask[:, :, None], out, neg_inf)
    if col_mask is not None:
        out = jnp.where(col_mask[:, None, :], out, neg_inf)
    return out


def _cost_matrix(x: jnp.ndarray, y: jnp.ndarray, p: int = 2) -> jnp.ndarray:
    """|x_i - y_j|^p summed over features (reference `sinkhorn_distance.py:80-86`)."""
    return jnp.sum(jnp.abs(x[..., :, None, :] - y[..., None, :, :]) ** p, axis=-1)


def sinkhorn_distance(x: jnp.ndarray, y: jnp.ndarray, eps: float = 0.1,
                      max_iter: int = 5, reduction: str = "none",
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Entropic-regularized OT cost between point clouds.

    Args:
      x: (..., P1, D), y: (..., P2, D). Uniform marginals.
    Returns:
      (cost, transport plan pi, cost matrix C) — matching the reference's
      return contract (`sinkhorn_distance.py:73`).
    """
    C = _cost_matrix(x, y)
    p1 = x.shape[-2]
    p2 = y.shape[-2]
    log_mu = jnp.log(jnp.full(C.shape[:-1], 1.0 / p1, C.dtype) + 1e-8)
    log_nu = jnp.log(jnp.full(C.shape[:-2] + (p2,), 1.0 / p2, C.dtype) + 1e-8)

    def M(u, v):
        return (-C + u[..., :, None] + v[..., None, :]) / eps

    def body(carry, _):
        u, v = carry
        u = eps * (log_mu - jax.nn.logsumexp(M(u, v), axis=-1)) + u
        v = eps * (log_nu - jax.nn.logsumexp(jnp.swapaxes(M(u, v), -2, -1), axis=-1)) + v
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=max_iter)

    pi = jnp.exp(M(u, v))
    cost = jnp.sum(pi * C, axis=(-2, -1))
    if reduction == "mean":
        cost = jnp.mean(cost)
    elif reduction == "sum":
        cost = jnp.sum(cost)
    return cost, pi, C
