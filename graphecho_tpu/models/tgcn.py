"""Temporal graph module (TGCN) — TPU re-design.

Re-implements the reference `TGCN` (`/root/reference/models/TGCN.py:168-312`):

  * per frame of an 8-frame clip, the 4 FPN pyramid levels are avg-pooled by
    r=[8,4,2,1] to an 8x8 grid, concatenated (4C channels), projected by a
    conv MLP and summed with a learnable per-frame positional embedding
    (`TGCN.py:62-72,182`);
  * a recurrent kNN graph links each frame's 64 nodes to the previous hidden
    state (`hidden_state = current_graph`, `:230-236`) with a Max-Relative
    graph conv;
  * a prediction head pools the final graph into a clip embedding (`:184-190`);
  * optional clustering loss: momentum queue (K=150 ring, `:192-198,243-251`)
    or linear classifiers (`:200-202,253-256`);
  * joint attention over [clip nodes; GModule source nodes; GModule target
    nodes] (`:258-267`), then a transport loss: GRL node discriminator
    (default, `:272-279`) or Sinkhorn OT (`:281-283`).

The momentum queues are explicit state (passed in / returned), like the
GModule seed banks. The T-step recurrence is a compile-time loop (T=8 is
static and small); node layout is (B, N, C).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphecho_tpu.config import SinkhornConfig, TGCNConfig
from graphecho_tpu.models.attention import MultiHeadAttention
from graphecho_tpu.models.vig import MRConv, _act
from graphecho_tpu.ops.grl import gradient_reversal
from graphecho_tpu.ops.knn import dilated_knn_graph
from graphecho_tpu.ops.resize import adaptive_avg_pool2d
from graphecho_tpu.ops.sinkhorn import sinkhorn_distance
from graphecho_tpu.train.losses import bce_with_logits, cross_entropy


class TGCN(nn.Module):
    cfg: TGCNConfig
    dtype: Optional[Any] = None
    bn_axis_name: Optional[str] = None
    # OT head knobs for transport_method='sinkhorn_distance'
    # (reference `utils/sinkhorn_distance.py:5-91` defaults via `TGCN.py:281`).
    sinkhorn: SinkhornConfig = SinkhornConfig()

    def setup(self):
        cfg = self.cfg
        c = cfg.input_dim
        self.mlp_conv1 = nn.Conv(cfg.hidden_dim, (1, 1), dtype=self.dtype,
                                 name="mlp_conv1")
        self.mlp_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                   axis_name=self.bn_axis_name, name="mlp_bn",
                                   use_running_average=None)
        self.mlp_conv2 = nn.Conv(cfg.hidden_dim, (1, 1), dtype=self.dtype,
                                 name="mlp_conv2")
        self.dropout = nn.Dropout(0.1)
        self.mr_conv = MRConv(cfg.hidden_dim, act="gelu", norm=None,
                              dtype=self.dtype, name="mr_conv")
        self.graph_attention = MultiHeadAttention(c, 1, dropout=0.1,
                                                  dtype=self.dtype,
                                                  name="graph_attention")
        t, h, w = cfg.clip_shape
        self.pos_embed = self.param("pos_embed", nn.initializers.zeros,
                                    (t, 1, h, w, c))
        self.pred_conv = nn.Conv(cfg.hidden_dim, (3, 3), (2, 2), padding="VALID",
                                 dtype=self.dtype, name="pred_conv")
        self.pred_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                    axis_name=self.bn_axis_name, name="pred_bn",
                                    use_running_average=None)

        if cfg.cluster_method == "linear_clustering":
            self.classifier_source = nn.Dense(cfg.source_class, dtype=self.dtype,
                                              name="classifier_source")
            self.classifier_target = nn.Dense(cfg.target_class, dtype=self.dtype,
                                              name="classifier_target")

        if cfg.transport_method == "node_discriminate":
            dense = lambda f, name: nn.Dense(
                f, dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.zeros, name=name)
            ln = lambda name: nn.LayerNorm(epsilon=1e-5, use_bias=False,
                                           use_scale=False, dtype=self.dtype,
                                           name=name)
            self.node_dis_layers = [dense(c, f"node_dis_{i}") for i in range(3)]
            self.node_dis_lns = [ln(f"node_dis_ln_{i}") for i in range(3)]
            self.node_dis_out = dense(1, "node_dis_out")

    def _queue_update(self, queue: jnp.ndarray, feats: jnp.ndarray,
                      labels: jnp.ndarray, m: float) -> jnp.ndarray:
        """EMA dequeue/enqueue (`TGCN.py:296-302`): queue (C, K); feats (B, C);
        labels (B,) column indices. Applied SEQUENTIALLY per batch item like
        the reference's python loop, so a duplicated label composes as two
        EMA steps (m²·q + m(1-m)·f_i + (1-m)·f_j) instead of a corrupting
        summed one-shot write. B is the tiny clip batch — the scan is free."""

        def body(q, fl):
            f, lbl = fl
            col = jax.lax.dynamic_slice_in_dim(q, lbl, 1, axis=1)[:, 0]
            return jax.lax.dynamic_update_slice_in_dim(
                q, (col * m + f * (1 - m))[:, None], lbl, axis=1), None

        queue, _ = jax.lax.scan(body, queue, (feats, labels))
        return queue

    def __call__(self, pyramid_clips: Sequence[jnp.ndarray],
                 source_nodes: jnp.ndarray, source_valid: jnp.ndarray,
                 target_nodes: jnp.ndarray, target_valid: jnp.ndarray,
                 queues: Tuple[jnp.ndarray, jnp.ndarray],
                 update_idx: Tuple[jnp.ndarray, jnp.ndarray],
                 train: bool = True,
                 ) -> Tuple[Dict[str, jnp.ndarray],
                            Tuple[jnp.ndarray, jnp.ndarray]]:
        """pyramid_clips: 4 arrays (B, T, H_l, W_l, C) — first half of the
        batch dim is source clips, second half target (reference concat order,
        `train_camus_echo.py:246`). source/target_nodes: (N, C) GModule node
        sets (caller should stop-gradient, matching `:278`). queues:
        (queue_source, queue_target) each (C, K). update_idx: per-domain
        (B/2,) video indices for the momentum queue / clustering loss.
        """
        cfg = self.cfg
        losses: Dict[str, jnp.ndarray] = {}
        t_len, gh, gw = cfg.clip_shape
        # the 3x3/s2 VALID pred head (`TGCN.py:184-190`) needs >=3 nodes per
        # side or its output is empty (mean over zero elements -> NaN)
        assert gh >= 3 and gw >= 3, (
            f"TGCN node grid {gh}x{gw} too small for the prediction head; "
            "pick img_crop / pool_ratios so each pyramid level pools to >=3 "
            "(reference geometry: 256^2 images -> 8x8 grid)")
        b = pyramid_clips[0].shape[0]

        # Pool every frame of every level to the node grid in ONE batched
        # pass (param-free, so it can leave the recurrence; bigger matmuls
        # for the MXU), then lax.scan the per-frame cell over time. Pooling
        # is adaptive to the (gh, gw) grid (`ops/resize.py`): when each
        # level divides the grid this equals the reference's fixed
        # `avg_pool2d(r)` exactly; otherwise — e.g. the CAMUS 112² config,
        # whose 28/14/7/4 pyramid cannot close an 8x8 grid with fixed
        # ratios and crashes the reference (`TGCN.py:63-72`) — it still
        # produces the grid. In the scan, params are broadcast and
        # batch_stats are carried, so the BN runs on per-frame batch
        # statistics updated sequentially — exactly the reference's
        # unrolled loop semantics (`TGCN.py:230-236`, MLP+pos-embed
        # `:62-72,182`) at a fraction of the HLO size.
        pooled = [
            adaptive_avg_pool2d(
                lvl.reshape(b * t_len, *lvl.shape[2:]), (gh, gw)
            ).reshape(b, t_len, gh, gw, -1)
            for lvl in pyramid_clips
        ]
        frames = jnp.concatenate(pooled, axis=-1)  # (B, T, gh, gw, 4C)
        frames = jnp.moveaxis(frames, 1, 0)        # (T, B, gh, gw, 4C)

        def cell(mdl, hidden, xs):
            frame, pos = xs
            x = mdl.mlp_conv1(frame)
            x = mdl.mlp_bn(x, use_running_average=not train)
            x = _act("gelu")(x)
            x = mdl.dropout(x, deterministic=not train)
            x = mdl.mlp_conv2(x)
            x = (x + pos).reshape(b, gh * gw, -1)
            nn_idx = dilated_knn_graph(x, hidden, cfg.knn_k, 1)
            return mdl.mr_conv(x, nn_idx, hidden, train), None

        scan = nn.scan(cell, variable_broadcast="params",
                       variable_carry="batch_stats",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0)
        # carry dtype must equal the cell's OUTPUT dtype (mr_conv computes in
        # self.dtype), not the input clips' dtype: under bf16 compute with f32
        # inputs the lax.scan carry would otherwise mismatch (f32 in, bf16 out)
        hidden0 = jnp.zeros((b, gh * gw, cfg.hidden_dim),
                            self.dtype or pyramid_clips[0].dtype)
        if self.is_initializing():
            # carried collections must exist BEFORE the scan: prime the
            # cell's params/batch_stats with one unscanned application
            cell(self, hidden0, (frames[0], self.pos_embed[0]))
        current, _ = scan(self, hidden0, (frames, self.pos_embed))

        # prediction head -> clip embedding (B, C)
        grid = current.reshape(b, gh, gw, -1)
        e = self.pred_conv(grid)
        e = self.pred_bn(e, use_running_average=not train)
        e = _act("gelu")(e)
        e = self.dropout(e, deterministic=not train)
        output_f = jnp.mean(e, axis=(1, 2))

        idx_s, idx_t = update_idx
        queue_s, queue_t = queues
        if cfg.cluster_method == "momentum_queue":
            q = output_f / jnp.maximum(
                jnp.linalg.norm(output_f, axis=1, keepdims=True), 1e-12)
            bank = jax.lax.stop_gradient(
                jnp.concatenate([queue_s, queue_t], axis=-1))
            l_pos = q @ bank  # (B, 2K)
            queue_s = self._queue_update(queue_s, jax.lax.stop_gradient(q[: b // 2]),
                                         idx_s, cfg.queue_momentum)
            queue_t = self._queue_update(queue_t, jax.lax.stop_gradient(q[b // 2:]),
                                         idx_t, cfg.queue_momentum)
            labels = jnp.concatenate([idx_s, idx_t + cfg.queue_size])
            losses["clustering_loss"] = cross_entropy(l_pos, labels)
        elif cfg.cluster_method == "linear_clustering":
            losses["clustering_loss"] = (
                cross_entropy(self.classifier_source(output_f[: b // 2]), idx_s)
                + cross_entropy(self.classifier_target(output_f[b // 2:]), idx_t))

        # joint attention over [clip nodes; source nodes; target nodes]
        out_g = current.reshape(b * gh * gw, -1)
        all_nodes = jnp.concatenate([out_g, source_nodes, target_nodes], axis=0)
        key_mask = jnp.concatenate([
            jnp.ones((out_g.shape[0],), bool), source_valid, target_valid])
        attended, _ = self.graph_attention(all_nodes, all_nodes, all_nodes,
                                           key_mask=key_mask,
                                           deterministic=not train)
        nodes_g = attended[: out_g.shape[0]].reshape(b, gh * gw, -1)
        nodes_src = nodes_g[: b // 2].reshape(-1, nodes_g.shape[-1])
        nodes_tgt = nodes_g[b // 2:].reshape(-1, nodes_g.shape[-1])

        if cfg.transport_method == "node_discriminate":
            x = gradient_reversal(
                jnp.concatenate([nodes_src, nodes_tgt], axis=0), 0.02)
            for lyr, lnorm in zip(self.node_dis_layers, self.node_dis_lns):
                x = nn.relu(lnorm(lyr(x)))
            logits = self.node_dis_out(x)[:, 0]
            target = jnp.concatenate([
                jnp.ones((nodes_src.shape[0],), jnp.float32),
                jnp.zeros((nodes_tgt.shape[0],), jnp.float32)])
            losses["node_dis_loss"] = 0.1 * bce_with_logits(logits, target)
        elif cfg.transport_method == "sinkhorn_distance":
            cost, _, _ = sinkhorn_distance(nodes_g[: b // 2], nodes_g[b // 2:],
                                           eps=self.sinkhorn.eps,
                                           max_iter=self.sinkhorn.max_iter,
                                           reduction=self.sinkhorn.reduction)
            losses["sinkhorn_loss"] = cost

        return losses, (queue_s, queue_t)
