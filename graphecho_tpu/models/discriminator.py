"""Per-level patch discriminator with gradient reversal.

TPU re-design of the reference `Discriminator`
(`/root/reference/models/fpnseg.py:447-511`): a 4x (conv3x3 + GroupNorm(32) +
ReLU) tower, a 1-channel conv head, GRL (lambda from config) applied to BOTH
domains, and BCE-with-logits against source=1 / target=0. Returns the scalar
`loss_s + loss_t` like the reference forward. The tower weights are shared
between the two domain passes (one set of params, two applications).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from graphecho_tpu.ops.grl import gradient_reversal
from graphecho_tpu.train.losses import bce_with_logits


class Discriminator(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    grad_reverse_lambda: float = 0.02
    grl_applied_domain: str = "both"  # 'both' | 'target'
    dtype: Optional[Any] = None

    def setup(self):
        self.tower = [
            nn.Conv(self.in_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    bias_init=nn.initializers.zeros, name=f"dis_tower_{i}")
            for i in range(self.num_convs)
        ]
        self.norms = [
            nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn_{i}")
            for i in range(self.num_convs)
        ]
        self.cls_logits = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  bias_init=nn.initializers.zeros, name="cls_logits")

    def _logits(self, x):
        for conv, norm in zip(self.tower, self.norms):
            x = nn.relu(norm(conv(x)))
        return self.cls_logits(x)

    def __call__(self, feature: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
        """feature: (source NHWC, target NHWC). Returns scalar adversarial loss.

        Both domains run through the tower as ONE batched apply (conv and
        GroupNorm are per-sample, so the math is identical to two passes —
        the reference's separate calls, `fpnseg.py:496-511` — at half the
        kernel launches)."""
        features_s, features_t = feature
        if self.grl_applied_domain == "both":
            features_s = gradient_reversal(features_s, self.grad_reverse_lambda)
        features_t = gradient_reversal(features_t, self.grad_reverse_lambda)
        bs = features_s.shape[0]
        x = self._logits(jnp.concatenate([features_s, features_t], axis=0))
        x_s, x_t = x[:bs], x[bs:]
        loss_s = bce_with_logits(x_s, jnp.ones_like(x_s))
        loss_t = bce_with_logits(x_t, jnp.zeros_like(x_t))
        return loss_s + loss_t
