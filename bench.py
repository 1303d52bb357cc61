"""Benchmark: EchoNet video-segmentation inference throughput (frames/sec/chip).

The measured path is the reference's batched video validation
(`/root/reference/train_cardiac_uda.py:376-426`): (B·T, 1, H, W) frames →
FPN forward → sigmoid > 0.5 → binary masks, at the CAMUS/EchoNet resolution
(112², ResNet50-quirk backbone — `train_camus_echo.py:61,96`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Ratio semantics (the reference repo publishes NO numbers; BASELINE.json's
north star is >=5x an RTX 3090 on this path):
  * `vs_baseline`      = fps / (5 x RTX3090_FPS_ESTIMATE) — progress against
    the >=5x TARGET; 1.0 means the north star is met.
  * `vs_3090_estimate` = fps / RTX3090_FPS_ESTIMATE — the raw chip-vs-GPU
    ratio, so the two anchors can't be conflated (VERDICT r1 item 7).
The 3090 anchor is a measured-elsewhere estimate (~900 fps for a B=64 112²
FPN-ResNet50 fp16 forward; derivation in BENCHMARKS.md) — no 3090 exists in
this environment to measure the reference directly.
"""

from __future__ import annotations

import json
import time

RTX3090_FPS_ESTIMATE = 900.0  # see module docstring
BASELINE_TARGET = 5.0 * RTX3090_FPS_ESTIMATE


def _enable_compile_cache():
    """First compile of the model is minutes through this host's remote
    compiler; a persistent cache makes reruns near-instant."""
    import os

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/root/.jax_tpu_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)
    except (OSError, AttributeError):
        pass


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from graphecho_tpu.config import camus_echo_config
    from graphecho_tpu.train.steps import build_models

    cfg = camus_echo_config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    fpn = build_models(cfg)["fpn"]

    # Frames per device step (video frames flattened into batch). 128 is the
    # measured throughput peak on v5e — per-frame conv time degrades above it
    # (HBM pressure) and per-dispatch tunnel overhead dominates below it:
    # 64→15.8k, 96→20.7k, 128→24.2k, 192→22.8k, 256→22.3k, 512→21.5k fps
    # (scripts/bench_sweep.py, isolated per-process runs).
    batch = 128
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 112, 112, 1),
                    jnp.float32)
    variables = fpn.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def infer_chained(variables, x):
        """Returns (pred, next_x): the next input depends on this prediction,
        so iterations form a true dependency chain. The TPU tunnel on this
        host elides enqueued computations whose results are never consumed —
        unchained timing loops report impossible (>peak-FLOPs) rates."""
        logits, _ = fpn.apply(variables, x, train=False)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int8)
        feedback = pred.astype(jnp.float32).mean() * 1e-6
        return pred, x + feedback

    # compile + warmup (np.asarray: on this host only a device-to-host fetch
    # forces execution; block_until_ready alone reports elided work)
    out, carry = infer_chained(variables, x)
    np.asarray(carry)

    trials = []
    iters = 80
    for _ in range(5):
        carry = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out, carry = infer_chained(variables, carry)
        float(carry.mean())  # host fetch of the chain tail
        trials.append(time.perf_counter() - t0)
    dt = sorted(trials)[len(trials) // 2]

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "echonet_seg_inference_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_TARGET, 3),
        "vs_3090_estimate": round(fps / RTX3090_FPS_ESTIMATE, 3),
        "baseline_definition": "target = 5 x RTX3090 estimate (900 fps)",
    }))


if __name__ == "__main__":
    main()
