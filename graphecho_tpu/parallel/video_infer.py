"""Frame-axis-sharded video segmentation inference.

SURVEY §5 "long-context": the reference's only sequence axis is the video
frame axis, processed by flattening T into the batch
(`train_cardiac_uda.py:384-387`). Per-frame FPN inference is embarrassingly
parallel along that axis, so the TPU-native "sequence parallelism" for this
workload is sharding frames across the mesh — each chip segments its slice of
the video and XLA keeps everything local (no collectives on the hot path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_video_infer(fpn, mesh: Mesh, threshold: float = 0.5):
    """Returns `infer(variables, frames) -> (pred, counts)` with the frame
    axis sharded over the mesh's `data` axis. `frames`: (T, H, W, C) — T must
    be a multiple of the mesh size (pad with zero frames otherwise).
    `threshold` must match the caller's batch path (serve.Predictor passes
    its own) so predict() and predict_video() agree."""

    frame_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def infer(variables, frames):
        logits, _ = fpn.apply(variables, frames, train=False)
        pred = (jax.nn.sigmoid(logits) > threshold).astype(jnp.int8)
        return pred

    def run(variables, frames) -> Tuple[jnp.ndarray, int]:
        t = frames.shape[0]
        n = mesh.devices.size
        pad = (-t) % n
        if pad:
            frames = jnp.pad(frames, ((0, pad), (0, 0), (0, 0), (0, 0)))
        frames = jax.device_put(frames, frame_sharding)
        variables = jax.device_put(variables, replicated)
        with mesh:
            pred = infer(variables, frames)
        return pred[:t], t

    return run
