"""Temporal cycle-consistency loss (pure jnp, static shapes).

Re-implements `Trainer.seg_cycle` (`/root/reference/train_cardiac_uda.py:428-494`):
soft nearest-neighbour cycle alignment on per-frame backbone features of a
64-frame clip. A random chunk of query frames is matched against shifted
windows of the key half; softmax-weighted key windows are matched back against
the query half; BCE on recovering the original start position.

The reference's `np.random.choice` start becomes a traced `jax.random.randint`
and the shifted `torch.gather` index tricks become static index grids +
`take_along_axis` — fully jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphecho_tpu.train.losses import bce_with_logits


def seg_cycle(feat_out: jnp.ndarray, rng: jax.Array, target_region: int = 16,
              cyc_off: int = 2, chunk_size: int = 4,
              temperature: float = 10.0) -> jnp.ndarray:
    """feat_out: (T, F) per-frame features (T > target_region). Returns scalar
    BCE cycle loss. Constants match the reference call site
    (`train_cardiac_uda.py:251`)."""
    feat_dim = feat_out.shape[1]
    # fail loud at trace time: a clip shorter than target_region + one key
    # window leaves the key half empty and the loss silently NaNs (empty
    # softmax). The reference geometry is 64-frame clips, target_region=16.
    assert feat_out.shape[0] >= target_region + chunk_size + cyc_off, (
        f"seg_cycle needs clip_length >= target_region + chunk_size + cyc_off "
        f"({target_region}+{chunk_size}+{cyc_off}), got T={feat_out.shape[0]}")
    fq = feat_out[:target_region]
    fq_cyc = feat_out[cyc_off:target_region]
    fk = feat_out[target_region:]
    key_size = fk.shape[0]

    n_starts = target_region - (chunk_size + cyc_off) + 1
    start = jax.random.randint(rng, (), 0, n_starts)
    onehot = jax.nn.one_hot(start, n_starts, dtype=feat_out.dtype)
    query = jax.lax.dynamic_slice(fq, (start, 0), (chunk_size, feat_dim))

    # forward match: query chunk vs shifted key windows (`:443-454`)
    d = jnp.sum((fk[:, None, :] - query[None, :, :]) ** 2, axis=-1)  # (K, chunk)
    shift = (jnp.arange(key_size)[:, None] + jnp.arange(chunk_size)[None, :]) % key_size
    d_shift = jnp.take_along_axis(d, shift, axis=0)
    d_shift = d_shift[: key_size - (chunk_size + cyc_off) + 1]
    similarity = -jnp.sum(d_shift, axis=1)
    beta = jax.nn.softmax(similarity / feat_dim / chunk_size * temperature)

    # softmax-weighted key windows (`:461-469`)
    fk_windows = fk[shift]  # (K, chunk, F)
    fk_beta = fk_windows[cyc_off: key_size - chunk_size + 1]
    weighted = jnp.sum(beta[:, None, None] * fk_beta, axis=0)  # (chunk, F)

    # cycle back: weighted chunk vs shifted query windows (`:472-487`)
    qd = jnp.sum((fq_cyc[:, None, :] - weighted[None, :, :]) ** 2, axis=-1)
    tq = target_region - cyc_off
    qshift = (jnp.arange(tq)[:, None] + jnp.arange(chunk_size)[None, :]) % tq
    qd_shift = jnp.take_along_axis(qd, qshift, axis=0)[: tq - chunk_size + 1]
    q_similarity = -jnp.sum(qd_shift, axis=1) / feat_dim / chunk_size * temperature

    return bce_with_logits(q_similarity, onehot)
