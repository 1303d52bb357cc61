"""Host-side Trainer: epochs, validation, checkpointing, logging.

Mirrors the reference `Trainer` contract (`/root/reference/train_camus_echo.py:45-515`,
`train_cardiac_uda.py:57-614`) on top of the fused jitted step:

  * `train()` — epoch loop over a batch iterator, one jitted step per batch,
    per-epoch validation and checkpoint save;
  * `validation(batches, name, is_video)` — eval forward, confusion-count
    accumulation, the reference's exact metric definitions
    (`train_camus_echo.py:402-417`), per-part dice printout, and the cardiac
    variant's BG-channel exclusion;
  * full-TrainState orbax checkpoints (superset of the reference's
    network-only saves).

Data parallel: pass a Mesh; batches are sharded on their leading axis and the
state replicated — XLA inserts the collectives.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphecho_tpu.config import ExperimentConfig
from graphecho_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from graphecho_tpu.train.checkpoint import CheckpointManager
from graphecho_tpu.train.metrics import overlap_metrics_from_counts
from graphecho_tpu.train.state import Optimizers, TrainState, create_train_state
from graphecho_tpu.train.steps import build_models, make_eval_step, make_train_step
from graphecho_tpu.utils.preemption import PreemptionGuard
from graphecho_tpu.utils.profiling import StepTimer
from graphecho_tpu.utils.summary import SummaryWriter


def _logger(name: str, log_path: Optional[str]) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        if log_path:
            fh = logging.FileHandler(log_path)
            fh.setLevel(logging.INFO)
            fh.setFormatter(logging.Formatter(
                "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
            logger.addHandler(fh)
        logger.addHandler(logging.StreamHandler())
    return logger


class Trainer:
    def __init__(self, cfg: ExperimentConfig,
                 steps_per_epoch: int = 1,
                 mesh=None,
                 use_mesh: bool = False,
                 log_path: Optional[str] = None,
                 checkpoint_dir: Optional[str] = None,
                 summary_dir: Optional[str] = None,
                 drop_bg_channel_in_eval: Optional[bool] = None):
        self.cfg = cfg
        self.logger = _logger("graphecho_tpu", log_path)
        if cfg.train.debug_nans:
            # the reference leaves torch detect_anomaly always-on
            # (`train_camus_echo.py:39`); we gate the jax equivalent
            jax.config.update("jax_debug_nans", True)
        self.models = build_models(cfg)
        self.optimizers = Optimizers(cfg, steps_per_epoch=steps_per_epoch)
        self.mesh = mesh if mesh is not None else (
            create_mesh(cfg.train.mesh_data) if use_mesh else None)
        if drop_bg_channel_in_eval is None:
            # cardiac variant drops the BG channel (`train_cardiac_uda.py:399-400`)
            drop_bg_channel_in_eval = cfg.model.backbone == "VGG16"
        self._train_step = jax.jit(
            make_train_step(cfg, self.models, self.optimizers),
            donate_argnums=0)
        self._eval_step = jax.jit(
            make_eval_step(cfg, self.models, drop_bg_channel_in_eval))
        self.ckpt = (CheckpointManager(checkpoint_dir)
                     if checkpoint_dir else None)
        self.summary = SummaryWriter(summary_dir) if summary_dir else None
        self.step_timer = StepTimer()
        self._preemption: Optional[PreemptionGuard] = None
        self.state: Optional[TrainState] = None
        self.last_epoch_metrics: Dict[str, float] = {}

    # ------------------------------------------------------------------ setup
    def init_state(self, sample_batch: Dict[str, Any],
                   seed: Optional[int] = None,
                   torch_init: Optional[str] = None) -> TrainState:
        """torch_init: optional torch .pth — torchvision zoo ResNet weights or
        a reference GraphEcho checkpoint — imported into the FPN (the
        reference's `pretrained` knob, `fpnseg.py:279-287`). An orbax resume
        takes precedence (a restored run already contains trained weights)."""
        rng = jax.random.PRNGKey(self.cfg.train.seed if seed is None else seed)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        state = create_train_state(self.cfg, self.models, self.optimizers,
                                   rng, batch)
        restored = self.ckpt.restore(state) if self.ckpt is not None else None
        if restored is not None:
            self.logger.info("resumed from checkpoint step %s",
                             int(restored.step))
            state = restored
        elif torch_init:
            from graphecho_tpu.utils.torch_import import load_reference_checkpoint

            state, skipped = load_reference_checkpoint(state, torch_init)
            self.logger.info("FPN initialized from torch checkpoint %s "
                             "(%d keys skipped)", torch_init, len(skipped))
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        self.state = state
        return state

    # ------------------------------------------------------------------ train
    def train_epoch(self, batches: Iterable[Dict[str, Any]],
                    epoch: int) -> Dict[str, float]:
        assert self.state is not None, "call init_state first"
        agg: Dict[str, float] = {}
        n = 0
        t0 = time.time()
        # metrics accumulate ON DEVICE; one host fetch per epoch. A per-step
        # `float(loss)` sync would serialize host and device (and on this
        # host's TPU tunnel it is the only thing that forces execution, so
        # the epoch-end fetch below is also the epoch-end barrier).
        device_agg = None
        for batch in batches:
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            with self.step_timer:
                self.state, metrics = self._train_step(self.state, batch)
            device_agg = metrics if device_agg is None else jax.tree_util.tree_map(
                jnp.add, device_agg, metrics)
            n += 1
            if self._preemption is not None and self._preemption.should_stop:
                self.logger.warning("preemption signal: checkpointing + stop")
                if self.ckpt is not None:
                    self.ckpt.save(int(self.state.step), self.state)
                break
        if device_agg is not None:
            # ONE batched device->host transfer (per-scalar float() fetches
            # each round-trip the TPU tunnel at ~30-50 ms)
            agg = {k: float(v) for k, v in jax.device_get(device_agg).items()}
        means = {k: v / max(n, 1) for k, v in agg.items()}
        means["steps"] = n
        means["epoch_seconds"] = time.time() - t0
        means["step_seconds"] = (time.time() - t0) / max(n, 1)
        if self.summary is not None:
            self.summary.add_scalars(means, int(self.state.step), "train/")
            if self.cfg.train.record_params:
                # per-parameter histograms (`train_camus_echo.py:307-310`)
                import jax as _jax

                for path, leaf in _jax.tree_util.tree_leaves_with_path(
                        self.state.net_params):
                    self.summary.add_histogram(
                        "params" + _jax.tree_util.keystr(path),
                        np.asarray(leaf), int(self.state.step))
        self.logger.info(
            "epoch %d | %d steps | loss %.4f | seg %.4f | %.1fs", epoch, n,
            means.get("total_loss", float("nan")),
            means.get("seg_loss", float("nan")), means["epoch_seconds"])
        self.last_epoch_metrics = means
        return means

    def train(self, batch_iter_fn: Callable[[], Iterable[Dict[str, Any]]],
              num_epochs: Optional[int] = None,
              eval_fns: Optional[Dict[str, Any]] = None,
              save_every: int = 1,
              select_metric: Optional[str] = None,
              on_epoch_end: Optional[Callable[[int, Dict[str, float],
                                               Dict[str, float]], None]] = None
              ) -> TrainState:
        """batch_iter_fn: returns a fresh finite batch iterator per epoch.
        eval_fns: name -> fn returning (imgs, masks) eval batches, or a
        (fn, is_video) tuple for video eval sets (flattened like the
        reference, `train_cardiac_uda.py:384-387`).
        select_metric: which eval set's dice tags the checkpoint (the
        reference tags saves with the VIDEO TEST dice specifically,
        `train_cardiac_uda.py:371-372,572-587`); defaults to the last one.
        on_epoch_end(epoch, train_means, dices): observer hook (curve
        recording — e.g. scripts/train_rehearsal.py's JSONL log)."""
        num_epochs = num_epochs or self.cfg.train.num_epochs
        self._preemption = PreemptionGuard()
        try:
            for epoch in range(num_epochs):
                means = self.train_epoch(batch_iter_fn(), epoch)
                if self._preemption.should_stop:
                    break
                dices: Dict[str, float] = {}
                if eval_fns:
                    for name, fn in eval_fns.items():
                        is_video = False
                        if isinstance(fn, tuple):
                            fn, is_video = fn
                        dices[name] = self.validation(fn(), name,
                                                      is_video=is_video)
                if on_epoch_end is not None:
                    on_epoch_end(epoch, means, dices)
                if self.ckpt is not None and epoch % save_every == 0:
                    metrics = None
                    if dices:
                        sel = (select_metric if select_metric in dices
                               else next(reversed(dices)))
                        metrics = {"dice": dices[sel], "dice_metric": sel}
                        metrics.update({f"dice/{k}": v
                                        for k, v in dices.items()})
                    self.ckpt.save(int(self.state.step), self.state,
                                   metrics=metrics)
        finally:
            self._preemption.uninstall()
            self._preemption = None
        return self.state

    # ------------------------------------------------------------- validation
    def validation(self, batches: Iterable[Tuple[Any, Any]], name: str,
                   is_video: bool = False) -> float:
        """Returns dice (the reference returns it for model selection,
        `train_cardiac_uda.py:426`). Video batches (B,T,H,W,C) are flattened
        into the batch dim like the reference (`:384-387`)."""
        assert self.state is not None
        totals: Dict[str, jnp.ndarray] = {}
        part_totals: Dict[str, Dict[str, jnp.ndarray]] = {}
        # losses accumulate ON DEVICE — a per-batch float(loss) would force a
        # host round trip per sample (bs=1 eval loaders!), serializing the
        # whole validation pass against fetch latency
        loss_sum = None
        n_batches = 0
        for imgs, masks in batches:
            imgs = jnp.asarray(imgs)
            masks = jnp.asarray(masks)
            if is_video:
                imgs = imgs.reshape(-1, *imgs.shape[-3:])
                masks = masks.reshape(-1, *masks.shape[-3:])
            counts, per_part, loss = self._eval_step(self.state, imgs, masks)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            n_batches += 1
            for k, v in counts.items():
                totals[k] = totals.get(k, 0.0) + v
            for p, c in per_part.items():
                d = part_totals.setdefault(p, {})
                for k, v in c.items():
                    d[k] = d.get(k, 0.0) + v
        if not totals:
            self.logger.warning("validation [%s]: no batches, dice=0", name)
            return 0.0
        m = overlap_metrics_from_counts(totals)
        self.logger.info(
            "validation [%s] | loss %.4f | pixel_acc %.4f | dice %.4f | "
            "precision %.4f | specificity %.4f | recall %.4f",
            name, float(loss_sum) / n_batches,
            float(m.pixel_acc), float(m.dice), float(m.precision),
            float(m.specificity), float(m.recall))
        if self.cfg.train.seg_parts:
            for p, c in part_totals.items():
                pm = overlap_metrics_from_counts(c)
                self.logger.info("  part %s dice %.4f", p, float(pm.dice))
        if self.summary is not None and self.state is not None:
            self.summary.add_scalars(
                {"dice": float(m.dice), "pixel_acc": float(m.pixel_acc)},
                int(self.state.step), f"val/{name}/")
        return float(m.dice)
