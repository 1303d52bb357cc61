"""The jitted train / eval steps.

Where the reference runs ~6 separate module calls + one joint backward per
step (`train_camus_echo.py:206-299`), the TPU design fuses the entire step —
FPN forwards on source/target, node sampling, GModule, per-level
discriminators, optional temporal branch and cycle loss, the joint backward
through the GRLs, and all optimizer updates — into ONE jitted function over
one TrainState pytree. Loss-dict keys match the reference
(`seg_loss`, `dis_loss`, `node_loss`, `mat_loss_aff`, `mat_loss_qu`,
`loss_adv_p2..p5`, `temporal_graph_loss`, `cyc_loss`).

Data layout is NHWC; batches arrive as a dict of device arrays. Under a
`jax.sharding.Mesh` the batch dims are sharded over the `data` axis and XLA
inserts gradient all-reduces automatically (GSPMD) — BatchNorm batch stats are
computed with global semantics, i.e. SyncBN for free.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from graphecho_tpu.config import ExperimentConfig
from graphecho_tpu.models.discriminator import Discriminator
from graphecho_tpu.models.fpn import FPN
from graphecho_tpu.models.graph_matching import GModule
from graphecho_tpu.models.tgcn import TGCN
from graphecho_tpu.ops.sampling import masks_to_boxes, sample_nodes
from graphecho_tpu.train.cycle import seg_cycle
from graphecho_tpu.train.losses import bce_with_logits, dice_loss
from graphecho_tpu.train.metrics import confusion_counts
from graphecho_tpu.train.state import Optimizers, TrainState

DIS_LEVELS = ("p2", "p3", "p4", "p5")


def build_models(cfg: ExperimentConfig, bn_axis_name=None) -> Dict[str, Any]:
    if cfg.train.temporal_graph and not cfg.train.graph_matching:
        # The temporal branch runs the GModule on the clip features; the
        # reference has the same dependency (train_camus_echo.py:271-272 calls
        # self.graph_model, which is only constructed under graph_matching,
        # :69-74 — that config crashes there too). Fail loud and early.
        raise ValueError(
            "temporal_graph=True requires graph_matching=True (the temporal "
            "branch reuses the graph-matching module)")
    if cfg.train.discriminator and not cfg.train.graph_matching:
        # Same class of config error as above — the per-level discriminators
        # consume the target-domain FPN features that only the graph-matching
        # branch computes (reference couples them the same way:
        # train_camus_echo.py:216-241 runs the discriminators inside the
        # target forward that exists only with the graph pipeline). Fail loud
        # instead of silently dropping the discriminator.
        raise ValueError(
            "discriminator=True requires graph_matching=True (the per-level "
            "discriminators run on the target-domain features the "
            "graph-matching branch computes)")
    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[cfg.model.compute_dtype]
    models: Dict[str, Any] = {
        "fpn": FPN(num_classes=cfg.model.num_classes,
                   back_bone=cfg.model.backbone,
                   fpn_channels=cfg.model.fpn_channels,
                   semantic_channels=cfg.model.semantic_channels,
                   dtype=dtype, bn_axis_name=bn_axis_name,
                   vgg_spec=cfg.model.vgg_spec, remat=cfg.model.remat),
    }
    if cfg.train.graph_matching:
        # the graph head stays f32 even under bf16 compute: it is small-matmul
        # + normalization heavy (Sinkhorn/eigh/LayerNorm) where bf16 both
        # hurts numerics and (measured) runs SLOWER than f32 on v5e
        models["gmodule"] = GModule(cfg.gmodule, dtype=None)
    if cfg.train.discriminator:
        # measured 2x SLOWER in bf16 on v5e (GroupNorm-heavy tower) — keep f32
        models["discriminator"] = Discriminator(
            num_convs=cfg.dis.num_convs, in_channels=cfg.dis.in_channels,
            grad_reverse_lambda=cfg.dis.grad_reverse_lambda,
            grl_applied_domain=cfg.dis.grl_applied_domain, dtype=None)
    if cfg.train.temporal_graph:
        models["tgcn"] = TGCN(cfg.tgcn, dtype=dtype, sinkhorn=cfg.sinkhorn)
    return models


def make_train_step(cfg: ExperimentConfig, models: Dict[str, Any],
                    optimizers: Optimizers):
    """Returns `train_step(state, batch) -> (state, metrics)` (pure, jittable).

    batch keys (NHWC):
      imgs_source (B,H,W,1), masks (B,H,W,Cm)           — always
      imgs_target (Bt,H,W,1)                            — if graph_matching
      temp_imgs_source/target (Bc,T,H,W,1),
      temp_masks (Bc,T,H,W,Cm),
      update_idx_source/target (Bc,)                    — if temporal_graph
      cyc_imgs (n_clips*T64,H,W,1)                      — if cyc_loss

    The source/target clip halves arrive as SEPARATE keys (concatenated
    inside the step) so that multi-host global assembly — which interleaves
    per-host row blocks — still yields [all source; all target]. Likewise
    cyc_imgs may carry several whole clips back-to-back (one per host);
    the cycle loss is vmapped per clip so frames never mix across clips.
    """
    t = cfg.train
    fpn = models["fpn"]
    gm = models.get("gmodule")
    dis = models.get("discriminator")
    tgcn = models.get("tgcn")
    is_camus = cfg.model.backbone == "resnet"

    def seg_supervision(pred, masks):
        if is_camus:
            # camus trainer: masks[:, :1], 0.1 * (dice+bce)/2
            # (`train_camus_echo.py:210-213`)
            masks = masks[..., :1]
            pred = pred[..., : masks.shape[-1]]
            return 0.1 * (dice_loss(pred, masks) + bce_with_logits(pred, masks)) / 2
        # cardiac trainer: full channels, dice+bce (`train_cardiac_uda.py:228`)
        return dice_loss(pred, masks) + bce_with_logits(pred, masks)

    def loss_fn(trainable, state: TrainState, batch, rng):
        losses: Dict[str, jnp.ndarray] = {}
        extra_metrics: Dict[str, jnp.ndarray] = {}
        new_state_parts: Dict[str, Any] = {}
        net_params = trainable["net"]
        bs = state.net_batch_stats

        (rng, k_drop, k_gm, k_drop2, k_gm2, k_cyc,
         k_drop_tgcn) = jax.random.split(rng, 7)

        def fpn_apply(x, stats):
            (logits, feats), mut = fpn.apply(
                {"params": net_params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return logits, feats, mut["batch_stats"]

        # Deviation (ModelConfig.fused_fpn_forwards): run the 2-3 full-FPN
        # forwards of the step as ONE batched apply. The reference runs them
        # as separate module calls (`train_camus_echo.py:206-254`), which on
        # TPU means 2-3 small dispatches instead of one MXU-filling batch.
        # BN batch stats are then computed over the union batch — the flag is
        # off by default to preserve exact reference granularity.
        fused = cfg.model.fused_fpn_forwards and t.graph_matching
        fused_out = None
        if fused:
            parts = [batch["imgs_source"], batch["imgs_target"]]
            if t.temporal_graph:
                ts_c, tt_c = batch["temp_imgs_source"], batch["temp_imgs_target"]
                assert ts_c.shape == tt_c.shape, (
                    "temporal source/target clip batches must match "
                    f"({ts_c.shape} vs {tt_c.shape})")
                ti_ = jnp.concatenate([ts_c, tt_c], axis=0)
                parts.append(ti_.reshape(ti_.shape[0] * ti_.shape[1],
                                         *ti_.shape[2:]))
            assert all(p.shape[1:] == parts[0].shape[1:] for p in parts), (
                "fused_fpn_forwards requires same-geometry frames across the "
                f"source/target/temporal branches, got "
                f"{[p.shape for p in parts]}")
            preds_cat, feats_cat, bs = fpn_apply(
                jnp.concatenate(parts, axis=0), bs)
            bounds = [0]
            for p in parts:
                bounds.append(bounds[-1] + p.shape[0])
            fused_out = [
                (preds_cat[lo:hi], [f[lo:hi] for f in feats_cat])
                for lo, hi in zip(bounds[:-1], bounds[1:])
            ]
            pred_s, feats_s = fused_out[0]
        else:
            pred_s, feats_s, bs = fpn_apply(batch["imgs_source"], bs)
        masks = batch["masks"].astype(jnp.float32)
        losses["seg_loss"] = seg_supervision(pred_s, masks)

        grouped = None
        if t.graph_matching:
            if fused:
                pred_t, feats_t = fused_out[1]
            else:
                pred_t, feats_t, bs = fpn_apply(batch["imgs_target"], bs)
            # target pseudo-label threshold (`graph_matching.py:1026` exposes
            # it as class_threshold; the reference's box branch hardcodes 0.5
            # at `train_camus_echo.py:219` — same default here)
            thr = cfg.gmodule.sampler.class_threshold
            score_maps = (jax.nn.sigmoid(pred_t) > thr).astype(jnp.float32)
            boxes_s = masks_to_boxes(masks if not is_camus else masks[..., :1])
            boxes_t = masks_to_boxes(score_maps)
            # head_in_cfg != 'LN': conv-project the maps before sampling
            # (`graph_matching.py:274-276`); identity in the shipped 'LN' mode
            project = (
                (lambda f: gm.apply({"params": trainable["gmn"]}, f,
                                    method=GModule.project_features))
                if cfg.gmodule.head_in_cfg != "LN" else (lambda f: f))
            src = sample_nodes(project(feats_s), boxes_s, cfg.gmodule.sampler)
            tgt = sample_nodes(project(feats_t), boxes_t, cfg.gmodule.sampler)
            gm_losses, new_seeds, grouped = gm.apply(
                {"params": trainable["gmn"]}, src, tgt,
                (state.sr_seed, state.tg_seed), train=True,
                rngs={"gmodule": k_gm, "dropout": k_drop})
            losses.update(gm_losses)
            new_state_parts["sr_seed"] = new_seeds[0]
            new_state_parts["tg_seed"] = new_seeds[1]

            if t.discriminator:
                for i, lvl in enumerate(DIS_LEVELS):
                    losses[f"loss_adv_{lvl}"] = cfg.dis.loss_weight * dis.apply(
                        {"params": trainable["dis"][lvl]},
                        (feats_s[i], feats_t[i]))

        if t.temporal_graph:
            # one big FPN forward over (2Bc*T) frames (`train_camus_echo.py:246-254`).
            # Source/target clips concat INSIDE the jit: under multi-host
            # sharding each key is a clean global array, and the concat gives
            # the reference's source-first layout regardless of host count.
            ts_clips = batch["temp_imgs_source"]
            tt_clips = batch["temp_imgs_target"]
            assert ts_clips.shape == tt_clips.shape, (
                "temporal source/target clip batches must match "
                f"({ts_clips.shape} vs {tt_clips.shape}): the TGCN splits "
                "its batch at the midpoint")
            bc, tl = ts_clips.shape[0], ts_clips.shape[1]
            b2 = bc + tt_clips.shape[0]
            if fused:
                preds_, feats_ = fused_out[2]
            else:
                ti = jnp.concatenate([ts_clips, tt_clips], axis=0)
                flat = ti.reshape(b2 * tl, *ti.shape[2:])
                preds_, feats_, bs = fpn_apply(flat, bs)
            half = bc * tl

            tm = batch["temp_masks"].astype(jnp.float32)
            tm_flat = tm.reshape(half, *tm.shape[2:])
            # frames with enough mask area supervise; others use predictions
            # as pseudo-masks for node sampling (`:253-264`)
            area_ok = jnp.sum(tm_flat, axis=(1, 2, 3)) > 100
            # quirk (bug-compatible): frames without enough GT mask use the
            # RAW logits as pseudo-masks (`train_camus_echo.py:263`), and
            # masks_to_boxes treats any nonzero as foreground (`mask != 0`,
            # `graph_matching.py:726`) — logits are ~never exactly 0, so such
            # frames degenerate to full-image boxes in the reference as well.
            src_masks = jnp.where(area_ok[:, None, None, None], tm_flat,
                                  preds_[:half, ..., : tm_flat.shape[-1]])

            src_feats = [f[:half] for f in feats_]
            tgt_feats = [f[half:] for f in feats_]
            boxes_s2 = masks_to_boxes(src_masks if not is_camus
                                      else src_masks[..., :1])
            # Deviation: the reference passes RAW logits as the temporal
            # target score_maps (`train_camus_echo.py:272`), which — being
            # ~never exactly 0 under `mask != 0` boxing — degenerate every
            # channel to a full-image box. We threshold like the main branch
            # (`:219`) so temporal target boxes carry real geometry.
            boxes_t2 = masks_to_boxes(
                (jax.nn.sigmoid(preds_[half:])
                 > cfg.gmodule.sampler.class_threshold).astype(jnp.float32))
            src2 = sample_nodes(project(src_feats), boxes_s2,
                                cfg.gmodule.sampler)
            tgt2 = sample_nodes(project(tgt_feats), boxes_t2,
                                cfg.gmodule.sampler)
            gm2_losses, new_seeds2, grouped2 = gm.apply(
                {"params": trainable["gmn"]}, src2, tgt2,
                (new_state_parts.get("sr_seed", state.sr_seed),
                 new_state_parts.get("tg_seed", state.tg_seed)), train=True,
                rngs={"gmodule": k_gm2, "dropout": k_drop2})
            new_state_parts["sr_seed"] = new_seeds2[0]
            new_state_parts["tg_seed"] = new_seeds2[1]

            clips = [f.reshape(b2, tl, *f.shape[1:]) for f in feats_]
            g1, g2 = grouped2
            (tg_losses, new_queues), tgcn_mut = tgcn.apply(
                {"params": trainable["tgcn"],
                 "batch_stats": state.tgcn_batch_stats},
                clips,
                jax.lax.stop_gradient(g1.nodes), g1.valid,
                jax.lax.stop_gradient(g2.nodes), g2.valid,
                (state.queue_source, state.queue_target),
                (batch["update_idx_source"], batch["update_idx_target"]),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop_tgcn})
            losses["temporal_graph_loss"] = (sum(tg_losses.values())
                                             + sum(gm2_losses.values()))
            # sub-loss visibility for logging/debugging
            extra_metrics.update({f"tgcn_{k}": v for k, v in tg_losses.items()})
            extra_metrics.update({f"temp_{k}": v for k, v in gm2_losses.items()})
            new_state_parts["queue_source"] = new_queues[0]
            new_state_parts["queue_target"] = new_queues[1]
            new_state_parts["tgcn_batch_stats"] = tgcn_mut["batch_stats"]

        if t.cyc_loss:
            # backbone layer-4 features summed spatially
            # (`train_cardiac_uda.py:245-253`). The network is in train() mode
            # there, so BN uses the 64-frame batch statistics AND updates the
            # running stats from the cyc clip — reproduced via mutable stats.
            c5, cyc_mut = fpn.apply(
                {"params": net_params, "batch_stats": bs},
                batch["cyc_imgs"], train=True,
                method=lambda m, x, train: m.backbone(x, train=train),
                mutable=["batch_stats"])
            bs = cyc_mut["batch_stats"]
            feat_out = jnp.sum(c5[-1], axis=(1, 2))
            # cyc_imgs may hold several whole clips back-to-back (one per
            # host under multi-host loading); the loss is per clip — vmap so
            # cross-frame matching never spans clip boundaries
            n_clips = feat_out.shape[0] // cfg.cycle.clip_length
            feat_clips = feat_out.reshape(n_clips, cfg.cycle.clip_length, -1)
            cyc = jax.vmap(lambda f, k: seg_cycle(
                f, k, cfg.cycle.target_region, cfg.cycle.cyc_off,
                cfg.cycle.chunk_size, cfg.cycle.temperature))(
                feat_clips, jax.random.split(k_cyc, n_clips))
            losses["cyc_loss"] = jnp.mean(cyc)

        new_state_parts["net_batch_stats"] = bs
        total = sum(losses.values())
        return total, ({**losses, **extra_metrics}, new_state_parts, pred_s)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        rng, step_rng = jax.random.split(state.rng)
        trainable = {"net": state.net_params}
        if t.graph_matching:
            trainable["gmn"] = state.gmn_params
            if t.discriminator:
                trainable["dis"] = state.dis_params
        if t.temporal_graph:
            trainable["tgcn"] = state.tgcn_params

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (losses, parts, pred_s)), grads = grad_fn(
            trainable, state, batch, step_rng)

        updates: Dict[str, Any] = {"rng": rng, "step": state.step + 1}
        new_net, net_opt = _apply(optimizers.net, grads["net"],
                                  state.net_opt, state.net_params)
        updates.update(net_params=new_net, net_opt=net_opt)
        if t.graph_matching:
            new_gmn, gmn_opt = _apply(optimizers.gmn, grads["gmn"],
                                      state.gmn_opt, state.gmn_params)
            updates.update(gmn_params=new_gmn, gmn_opt=gmn_opt)
            if t.discriminator:
                new_dis, dis_opt = _apply(optimizers.dis, grads["dis"],
                                          state.dis_opt, state.dis_params)
                updates.update(dis_params=new_dis, dis_opt=dis_opt)
        if t.temporal_graph:
            new_tgcn, tgcn_opt = _apply(optimizers.tgcn, grads["tgcn"],
                                        state.tgcn_opt, state.tgcn_params)
            updates.update(tgcn_params=new_tgcn, tgcn_opt=tgcn_opt)
        updates.update(parts)

        metrics = dict(losses)
        metrics["total_loss"] = total
        return state.replace(**updates), metrics

    return train_step


def _apply(opt, grads, opt_state, params):
    updates, new_opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


def make_eval_step(cfg: ExperimentConfig, models: Dict[str, Any],
                   drop_bg_channel: bool = False):
    """Returns `eval_step(state, imgs, masks) -> (counts, loss)` accumulating
    confusion counts — the reference validation contract
    (`train_camus_echo.py:350-417`; video variant flattens T into the batch
    before calling). With `drop_bg_channel`, channel 0 is excluded like the
    cardiac trainer (`train_cardiac_uda.py:399-400`)."""
    fpn = models["fpn"]
    is_camus = cfg.model.backbone == "resnet"

    def eval_step(state: TrainState, imgs, masks):
        logits, _ = fpn.apply({"params": state.net_params,
                               "batch_stats": state.net_batch_stats},
                              imgs, train=False)
        masks = masks.astype(jnp.float32)
        if is_camus:
            masks = masks[..., :1]
            logits = logits[..., :1]
        loss = bce_with_logits(logits, masks)
        if drop_bg_channel:
            logits = logits[..., 1:]
            masks = masks[..., 1:]
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        counts = confusion_counts(masks, pred)
        # per-channel counts for the per-part dice printout
        per_part = {
            f"part{i}": confusion_counts(masks[..., i], pred[..., i])
            for i in range(logits.shape[-1])
        }
        return counts, per_part, loss

    return eval_step
