"""Semantic-aware node affinity layer.

TPU re-design of the reference `Affinity`
(`/root/reference/models/affinity_layer.py:8-73`):
M[i,j] = MLP([proj_sr(x_i); proj_tg(y_j)]) with MLP = Linear(512,512) + ReLU +
Linear(512,1). Instead of materializing the (N1,N2,512) concat-expand, the
first Linear is split into its X/Y halves and the pairwise ReLU-reduce is
computed fused (see `graphecho_tpu.ops.pairwise_mlp`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from graphecho_tpu.ops.pairwise_mlp import pairwise_mlp_auto


class Affinity(nn.Module):
    d: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """X: (N1, d), Y: (N2, d) -> affinity M: (N1, N2)."""
        X = nn.Dense(self.d, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01), name="project_sr")(X)
        Y = nn.Dense(self.d, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01), name="project_tg")(Y)

        hidden = 2 * self.d
        # first MLP layer, split into the X-half and Y-half of the 2d input
        wx = self.param("fc1_wx", nn.initializers.normal(0.01), (self.d, hidden))
        wy = self.param("fc1_wy", nn.initializers.normal(0.01), (self.d, hidden))
        b1 = self.param("fc1_b", nn.initializers.zeros, (hidden,))
        w2 = self.param("fc2_w", nn.initializers.normal(0.01), (hidden,))
        b2 = self.param("fc2_b", nn.initializers.zeros, ())

        a = X @ wx + b1  # (N1, hidden)
        b = Y @ wy  # (N2, hidden); b1 folded into a
        return pairwise_mlp_auto(a, b, w2, b2)
