"""Inference-bench parameter sweep (batch size, donation) on the real chip.

Same measurement methodology as bench.py (chained iterations, whole-output
feedback tap, single host fetch per timing loop — see BENCHMARKS.md), ONE
configuration per process: measuring several configs in one interpreter
showed monotonic degradation (identical B=256 work measured 22.2k fps fresh
vs 12.7k after a prior config ran), so each (batch, donate) point gets an
isolated process.

Usage:
  env PYTHONPATH=/root/.axon_site:/root/repo \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
    python scripts/bench_sweep.py            # orchestrates subprocesses
  python scripts/bench_sweep.py 512 1        # one point: batch=512, donate
"""

from __future__ import annotations

import dataclasses
import subprocess
import sys
import time


def measure(batch: int, donate: bool) -> None:
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

    from graphecho_tpu.config import camus_echo_config
    from graphecho_tpu.train.steps import build_models

    cfg = camus_echo_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    fpn = build_models(cfg)["fpn"]

    x_np = np.random.RandomState(0).rand(batch, 112, 112, 1).astype(np.float32)
    variables = fpn.init(jax.random.PRNGKey(0), jnp.asarray(x_np[:1]))

    def infer_chained(variables, x):
        logits, _ = fpn.apply(variables, x, train=False)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int8)
        feedback = pred.astype(jnp.float32).mean() * 1e-6
        return pred, x + feedback

    fn = jax.jit(infer_chained, donate_argnums=(1,) if donate else ())
    out, carry = fn(variables, jnp.asarray(x_np))
    np.asarray(carry)  # force compile + first execution

    iters = max(40 * 256 // batch, 10)
    trials = []
    for _ in range(5):
        carry = jnp.asarray(x_np)
        carry.block_until_ready()  # keep the h2d copy out of the timed region
        t0 = time.perf_counter()
        for _ in range(iters):
            out, carry = fn(variables, carry)
        float(carry.mean())  # host fetch of the chain tail
        trials.append(time.perf_counter() - t0)
    dt = sorted(trials)[len(trials) // 2]
    fps = batch * iters / dt
    print(f"batch={batch:5d} donate={int(donate)} iters={iters:3d} "
          f"fps={fps:,.0f}  trials={[round(t, 3) for t in trials]}",
          flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        measure(int(sys.argv[1]), bool(int(sys.argv[2])))
        return
    for batch in (128, 256, 512):
        for donate in (0, 1):
            subprocess.run([sys.executable, __file__, str(batch), str(donate)],
                           check=False)


if __name__ == "__main__":
    main()
