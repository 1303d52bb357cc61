"""GRU-style temporal graph convolution cells + Laplacian utilities.

Re-implements the reference's `TGCNGraphConvolution` / `TGCNCell`
(`/root/reference/models/TGCN.py:81-165`) and the Laplacian helpers
(`:11-38`). These are defined-but-unused by the reference's `TGCN.forward`
(SURVEY §3.5 "dead-but-present") — provided for API completeness and usable as
an alternative recurrence.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def laplacian_with_self_loop(matrix: jnp.ndarray) -> jnp.ndarray:
    """Reference formula ((A+I) D^-1/2)^T D^-1/2 per batch item
    (`TGCN.py:11-23`) — note the transpose, which matters because the
    reference feeds non-symmetric matrices. matrix: (..., N, N)."""
    n = matrix.shape[-1]
    a = matrix + jnp.eye(n, dtype=matrix.dtype)
    row_sum = jnp.sum(a, axis=-1)
    d_inv_sqrt = jnp.where(jnp.isfinite(row_sum**-0.5), row_sum**-0.5, 0.0)
    scaled = a * d_inv_sqrt[..., None, :]  # (A+I) D^-1/2
    return jnp.swapaxes(scaled, -2, -1) * d_inv_sqrt[..., None, :]


def laplacian_without_self_loop(graph: jnp.ndarray,
                                normalize: bool = False) -> jnp.ndarray:
    """(`TGCN.py:25-38`). graph: (N, N)."""
    deg = jnp.sum(graph, axis=-1)
    if normalize:
        d_inv_sqrt = jnp.where(deg > 0, deg**-0.5, 0.0)
        n = graph.shape[-1]
        return jnp.eye(n, dtype=graph.dtype) - (
            d_inv_sqrt[:, None] * graph * d_inv_sqrt[None, :])
    return jnp.diag(deg) - graph


class TGCNGraphConvolution(nn.Module):
    """Graph conv over the per-batch feature Laplacian (`TGCN.py:81-129`)."""

    num_gru_units: int
    output_dim: int
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, hidden_state: jnp.ndarray
                 ) -> jnp.ndarray:
        """inputs: (B, N, F); hidden_state: (B, N*units) -> (B, N*output_dim)."""
        b, n, f = inputs.shape
        lap = laplacian_with_self_loop(inputs)  # (B, N, N) like the reference
        hidden = hidden_state.reshape(b, n, self.num_gru_units)
        concat = jnp.concatenate([inputs, hidden], axis=-1)  # (B, N, F+U)
        ax = jnp.einsum("bnc,bck->bnk", lap, concat)
        w = self.param("weights", nn.initializers.xavier_uniform(),
                       (self.num_gru_units + f, self.output_dim))
        bias = self.param("biases",
                          nn.initializers.constant(self.bias_init_value),
                          (self.output_dim,))
        out = ax.reshape(b * n, -1) @ w + bias
        return out.reshape(b, n * self.output_dim)


class TGCNCell(nn.Module):
    """GRU cell over graph convolutions (`TGCN.py:140-161`)."""

    input_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, hidden_state: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conc = nn.sigmoid(TGCNGraphConvolution(
            self.hidden_dim, self.hidden_dim * 2, 1.0,
            name="graph_conv1")(inputs, hidden_state))
        r, u = jnp.split(conc, 2, axis=1)
        c = nn.tanh(TGCNGraphConvolution(
            self.hidden_dim, self.hidden_dim,
            name="graph_conv2")(inputs, r * hidden_state))
        new_hidden = u * hidden_state + (1.0 - u) * c
        return new_hidden, new_hidden
