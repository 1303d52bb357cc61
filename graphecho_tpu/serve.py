"""Serving: a batch/video segmentation predictor.

The reference has no inference entry point beyond the validation loop; this is
the production-serving surface of the rebuild:

  * loads a TrainState checkpoint (orbax) or takes a live state;
  * bf16 compute by default (the benchmarked configuration);
  * fixed-shape jitted forward with automatic batch padding (one compile per
    configured batch size, not per request size);
  * video mode shards the frame axis over a device mesh
    (`parallel/video_infer`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphecho_tpu.config import ExperimentConfig
from graphecho_tpu.train.steps import build_models


class Predictor:
    def __init__(self, cfg: ExperimentConfig, variables, batch_size: int = 256,
                 mesh=None, threshold: float = 0.5, quantize: bool = False,
                 calib_batches=None):
        """quantize=True runs the backbone as int8 PTQ (weights 4x smaller;
        see `graphecho_tpu.quant` — measured ~parity with bf16 speed on v5e
        for the FPN shapes, provided for memory-constrained serving).
        `calib_batches`: iterable of (B,H,W,1) arrays used to calibrate int8
        activation scales. Defaults to synthetic echo-like frames
        (`data/synthetic.py`) — structured probes whose conv responses bound
        activations far better than flat images; pass a sample of REAL frames
        from the deployment distribution for best int8 accuracy.

        quantize=True is incompatible with `mesh` (the sharded video path is
        float-only): requesting both raises rather than silently serving
        different numerics from predict() and predict_video()."""
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype="bfloat16"))
        self.cfg = cfg
        self.fpn = build_models(cfg)["fpn"]
        self.variables = variables
        self.batch_size = batch_size
        self.threshold = threshold
        self.mesh = mesh
        h, w = cfg.data.img_crop
        self._hw = (h, w)

        if quantize and mesh is not None:
            raise ValueError(
                "Predictor(quantize=True, mesh=...): the mesh video path is "
                "float-only; drop `mesh` for int8 serving or `quantize` for "
                "sharded video inference")

        if quantize:
            from graphecho_tpu.quant import quantize_fpn_backbone
            from graphecho_tpu.quant.ptq import make_quantized_infer

            if calib_batches is None:
                from graphecho_tpu.data.synthetic import SyntheticEchoData

                probe = SyntheticEchoData(cfg, seed=0, batch_size=8)
                calib_batches = [probe.train_batch()["imgs_source"]
                                 for _ in range(4)]
            qb = quantize_fpn_backbone(cfg.model.backbone, variables,
                                       calib_batches)
            self._qparams = qb.qparams()
            # weights are jit ARGUMENTS inside make_quantized_infer — never
            # const-folded into the HLO (the remote-compile stall mode)
            _infer_q = jax.jit(make_quantized_infer(
                self.fpn, qb, threshold=threshold, bf16_features=True))

            def _infer(variables, x):
                return _infer_q({"params": variables["params"]},
                                self._qparams, x)
        else:
            @jax.jit
            def _infer(variables, x):
                logits, _ = self.fpn.apply(variables, x, train=False)
                return (jax.nn.sigmoid(logits) > threshold).astype(jnp.int8)

        self._infer = _infer
        self._video = None
        if mesh is not None:
            from graphecho_tpu.parallel.video_infer import make_sharded_video_infer

            self._video = make_sharded_video_infer(self.fpn, mesh,
                                                   threshold=threshold)

    @classmethod
    def from_checkpoint(cls, cfg: ExperimentConfig, checkpoint_dir: str,
                        **kwargs) -> "Predictor":
        from graphecho_tpu.train.checkpoint import CheckpointManager
        from graphecho_tpu.train.state import Optimizers, create_train_state
        from graphecho_tpu.data.synthetic import SyntheticEchoData

        data = SyntheticEchoData(cfg, seed=0, batch_size=1)
        state_like = create_train_state(
            cfg, build_models(cfg), Optimizers(cfg), jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in data.train_batch().items()})
        mgr = CheckpointManager(checkpoint_dir)
        state = mgr.restore(state_like)
        if state is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
        variables = {"params": state.net_params,
                     "batch_stats": state.net_batch_stats}
        return cls(cfg, variables, **kwargs)

    def _prep(self, imgs: np.ndarray) -> np.ndarray:
        """Accepts (N, H, W) or (N, H, W, 1) in [0,1] or uint8; resizes to the
        model resolution with the training pipeline's nearest semantics."""
        from graphecho_tpu.data.transforms import nearest_resize

        imgs = np.asarray(imgs)
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        if imgs.shape[1:3] != self._hw:
            imgs = np.stack([nearest_resize(f, self._hw) for f in imgs])
        return imgs.astype(np.float32)

    def predict(self, imgs) -> np.ndarray:
        """(N, H, W[, 1]) frames -> (N, h, w, num_classes) int8 masks."""
        x = self._prep(imgs)
        n = x.shape[0]
        if n == 0:
            h, w = self._hw
            return np.zeros((0, h, w, self.cfg.model.num_classes), np.int8)
        outs = []
        for i in range(0, n, self.batch_size):
            chunk = x[i:i + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            pred = self._infer(self.variables, jnp.asarray(chunk))
            outs.append(np.asarray(pred)[: self.batch_size - pad])
        return np.concatenate(outs, axis=0)

    def predict_video(self, frames) -> np.ndarray:
        """(T, H, W[, 1]) video -> (T, h, w, C) masks; frame-sharded over the
        mesh when one was provided."""
        x = self._prep(frames)
        if self._video is not None:
            pred, t = self._video(self.variables, jnp.asarray(x))
            return np.asarray(pred)
        return self.predict(x)
