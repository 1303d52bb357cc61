"""Graph attention blocks (flax.linen).

TPU re-design of the reference `transformer.py`:
  * `MultiHeadAttention` v2 semantics (`/root/reference/models/transformer.py:25-110`):
    unbatched node sets (N, C); scale = (dim_per_head // num_heads) ** -0.5
    (reference quirk — NOT the usual 1/sqrt(d)); residual is the RAW query
    (pre-projection); post-LN; returns (output, attention matrix). The
    attention matrix doubles as the graph edge matrix for quadratic matching
    (`graph_matching.py:295-296,349`).
  * `CrossGraph` bi-directional message passing (`transformer.py:115-160`) —
    defined-but-unused in the reference; provided for API completeness.

Extension over the reference: an optional boolean `mask` over keys/queries so
statically-padded node slots don't attend or get attended to (our static-shape
node budgets replace the reference's variable-length node lists).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    model_dim: int = 256
    num_heads: int = 1
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, key: jnp.ndarray, value: jnp.ndarray, query: jnp.ndarray,
                 key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """key/value/query: (N, C) node sets. key_mask: (N_k,) bool — False
        entries are excluded from the softmax. Returns ((N_q, C), attn)."""
        dph = self.model_dim // self.num_heads
        residual = query

        k = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_k")(key)
        v = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_v")(value)
        q = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_q")(query)

        # (N, C) -> (heads, N, dph)
        k = k.reshape(k.shape[0], self.num_heads, dph).transpose(1, 0, 2)
        v = v.reshape(v.shape[0], self.num_heads, dph).transpose(1, 0, 2)
        q = q.reshape(q.shape[0], self.num_heads, dph).transpose(1, 0, 2)

        # reference quirk: scale = (dim_per_head // num_heads) ** -0.5
        scale = float(dph // self.num_heads) ** -0.5
        attn = jnp.einsum("hqd,hkd->hqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        if key_mask is not None:
            attn = jnp.where(key_mask[None, None, :], attn, _NEG_INF)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)

        context = jnp.einsum("hqk,hkd->hqd", attn.astype(v.dtype), v)
        context = context.transpose(1, 0, 2).reshape(query.shape[0], self.model_dim)

        out = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_final")(context)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(residual + out)

        attn = attn[0] if self.num_heads == 1 else attn
        return out, attn


class CrossGraph(nn.Module):
    """Bi-directional cross-graph node update (`transformer.py:115-160`)."""

    model_dim: int = 256
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, node_1: jnp.ndarray, node_2: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        linear_edge = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_edge")
        linear_node1 = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_node1")
        linear_final = nn.Dense(self.model_dim, dtype=self.dtype, name="linear_final")
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        edge1 = linear_edge(node_1)
        edge2 = linear_edge(node_2)
        n1p = linear_node1(node_1)
        n2p = linear_node1(node_2)

        attention = edge1 @ edge2.T
        out_1 = nn.softmax(attention, axis=-1) @ n2p
        out_2 = nn.softmax(attention.T, axis=-1) @ n1p

        out_1 = drop(linear_final(out_1))
        out_2 = drop(linear_final(out_2))
        return ln(node_1 + out_1), ln(node_2 + out_2)
