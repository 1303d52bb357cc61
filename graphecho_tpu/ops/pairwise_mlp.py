"""Fused pairwise-concat MLP — the affinity-matrix hot op.

The reference Affinity layer (`/root/reference/models/affinity_layer.py:52-73`)
materializes an (N1, N2, 2C) concat-expand tensor and pushes it through
Linear(512,512)+ReLU+Linear(512,1). At N≈10³ nodes that intermediate is
gigabytes — fine for torch's eager allocator, hostile on TPU HBM.

Re-formulation: split the first Linear's weight W into the X-half and Y-half;
then

    M[i, j] = w2 · relu(a_i + b_j) + c      with  a = X Wx + b1,  b = Y Wy

so the O(N²·C) intermediate becomes a broadcast+relu+reduce that XLA fuses
into the reduction loop (never materialized in HBM), and the O(N·C²) matmuls
run once on the MXU. A Pallas kernel for this op exists in
`graphecho_tpu.ops.pallas.pairwise_kernels` for large N; this module provides
the formulation + a blocked XLA path and dispatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_mlp(a: jnp.ndarray, b: jnp.ndarray, w2: jnp.ndarray,
                 b2: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """M[i,j] = sum_k w2[k]*relu(a[i,k]+b[j,k]) + b2.

    a: (N1, K), b: (N2, K), w2: (K,), b2: scalar -> (N1, N2).

    Blocked over rows of `a` with `lax.map` so the transient
    (block, N2, K) broadcast stays fusable and bounded.
    """
    n1 = a.shape[0]
    if n1 <= block:
        return jnp.sum(jax.nn.relu(a[:, None, :] + b[None, :, :]) * w2, axis=-1) + b2

    pad = (-n1) % block
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    blocks = a_pad.reshape(-1, block, a.shape[1])

    def one_block(a_blk):
        return jnp.sum(jax.nn.relu(a_blk[:, None, :] + b[None, :, :]) * w2, axis=-1)

    out = jax.lax.map(one_block, blocks).reshape(-1, b.shape[0])
    return out[:n1] + b2


def pairwise_mlp_auto(a: jnp.ndarray, b: jnp.ndarray, w2: jnp.ndarray,
                      b2: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: fused Pallas custom-VJP kernel on TPU for large problems
    (avoids the blocked XLA path's HBM traffic and gives an exact fused
    backward), XLA fallback elsewhere."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        on_tpu = False
    n1, k = a.shape
    n2 = b.shape[0]
    if on_tpu and n1 * n2 * k >= 128 * 128 * 128:
        from graphecho_tpu.ops.pallas.pairwise_mlp_kernel import pallas_pairwise_mlp

        return pallas_pairwise_mlp(a, b, w2, b2)
    return pairwise_mlp(a, b, w2, b2)
