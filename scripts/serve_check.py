"""Serving surface end-to-end on the chip (VERDICT r3 item 4).

Loads a short-trained checkpoint (e.g. from scripts/train_rehearsal.py) via
`serve.Predictor.from_checkpoint` and exercises every serving path on the
real TPU: bf16 batch, video (frame-sharded under a mesh), and int8 PTQ —
recording request latencies and int8-vs-bf16 mask agreement. Reference
analog: the validation loop `train_cardiac_uda.py:376-426` this
productionizes (the reference ships no serving entry point).

Latency here is honest REQUEST latency: each call materializes the full mask
array on the host (the per-call fetch IS the serving cost on this tunnel),
so no chaining tricks are needed — the fetch forces execution.

Usage (TPU):
  env PYTHONPATH=/root/.axon_site:/root/repo \
      JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
      python scripts/serve_check.py --recipe camus_temporal \
          --ckpt /tmp/rehearsal_camus --batch 128 --frames 256

Emits ONE JSON line with P50/P90 latencies (ms), throughput, and agreement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_train_step import _cfg  # noqa: E402


def _latencies(fn, reps: int):
    fn()  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {"p50_ms": round(times[len(times) // 2], 2),
            "p90_ms": round(times[int(len(times) * 0.9)], 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="camus_temporal",
                    choices=["cardiac", "camus_temporal", "cardiac_full"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

    from graphecho_tpu.data.synthetic import SyntheticEchoData
    from graphecho_tpu.parallel.mesh import create_mesh
    from graphecho_tpu.serve import Predictor

    cfg = _cfg(bf16=True, recipe=args.recipe)
    data = SyntheticEchoData(cfg, seed=42, batch_size=args.batch)
    frames = data.train_batch()["imgs_source"]  # (B, H, W, 1) echo-like
    video = SyntheticEchoData(cfg, seed=43, batch_size=args.frames
                              ).train_batch()["imgs_source"]

    result = {"recipe": args.recipe, "batch": args.batch,
              "frames": args.frames, "ckpt": args.ckpt}

    # 1. bf16 batch path (the benchmarked serving default)
    pred = Predictor.from_checkpoint(cfg, args.ckpt, batch_size=args.batch)
    masks_bf16 = pred.predict(frames)
    result["mask_fg_frac"] = round(float(masks_bf16.mean()), 4)
    lat = _latencies(lambda: pred.predict(frames), args.reps)
    result["bf16_batch"] = {**lat,
                            "frames_per_s": round(
                                args.batch / (lat["p50_ms"] / 1e3))}

    # 2. video path, frame-sharded under a (1-device, on this chip) mesh —
    # same code path the 8-device CPU-mesh test pins
    pred_v = Predictor.from_checkpoint(cfg, args.ckpt, batch_size=args.batch,
                                       mesh=create_mesh(1))
    vm = pred_v.predict_video(video)
    assert vm.shape[0] == args.frames
    lat_v = _latencies(lambda: pred_v.predict_video(video), args.reps)
    result["video_sharded"] = {**lat_v,
                               "frames_per_s": round(
                                   args.frames / (lat_v["p50_ms"] / 1e3))}

    # 3. int8 PTQ path + agreement vs bf16
    pred_q = Predictor.from_checkpoint(cfg, args.ckpt, batch_size=args.batch,
                                       quantize=True)
    masks_q = pred_q.predict(frames)
    agree = float((masks_q == masks_bf16).mean())
    lat_q = _latencies(lambda: pred_q.predict(frames), args.reps)
    result["int8_batch"] = {**lat_q,
                            "frames_per_s": round(
                                args.batch / (lat_q["p50_ms"] / 1e3)),
                            "mask_agreement_vs_bf16": round(agree, 6)}

    # 4. AOT deployment artifact round-trip: export_compiled -> load_exported
    # serves from StableHLO + weights with NO model code / config tree
    import tempfile

    from graphecho_tpu.serve import load_exported

    exp_dir = os.path.join(tempfile.gettempdir(), f"ge_export_{args.recipe}")
    pred.export_compiled(exp_dir)
    exported = load_exported(exp_dir)
    masks_exp = exported.predict(frames)
    agree_exp = float((masks_exp == masks_bf16).mean())
    lat_e = _latencies(lambda: exported.predict(frames), args.reps)
    result["aot_exported"] = {**lat_e,
                              "frames_per_s": round(
                                  args.batch / (lat_e["p50_ms"] / 1e3)),
                              "mask_agreement_vs_bf16": round(agree_exp, 6)}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
