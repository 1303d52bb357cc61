"""Profile the full UDA training step on the real TPU chip.

Times the jitted cardiac-config train step (graph matching + 4 discriminators)
and ablations that isolate where the milliseconds go:

  * full            — the shipped step
  * no_spectral     — seed update replaced by plain masked mean (isolates the
                      spectral Fiedler solve in ops/spectral.py)
  * sinkhorn_5      — 5 Sinkhorn iterations instead of 20

`--recipe camus_temporal` / `--recipe cardiac_full` time the paper's full
branch sets (temporal graph / temporal + 64-frame cycle loss) instead.

Timing follows BENCHMARKS.md "measurement methodology": chained steps (state
feeds forward) + a tail host fetch; block_until_ready alone under-reports on
the axon tunnel.

Usage:
  env PYTHONPATH=/root/.axon_site:/root/repo \
      JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
      python scripts/profile_train_step.py [--bf16]
"""

from __future__ import annotations

import argparse
import dataclasses
import time


def _cfg(bf16: bool, recipe: str = "cardiac"):
    from graphecho_tpu.config import camus_echo_config, cardiac_uda_config

    if recipe == "camus_temporal":
        # the paper's full CAMUS→EchoNet recipe: graph matching + temporal
        # branch, 112², bs=8 source, temporal clips B=4 T=8
        # (`train_camus_echo.py:168-177,244-278`)
        cfg = camus_echo_config(graph_matching=True, discriminator=True,
                                temporal_graph=True)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=8,
                                          target_batch_mult=1))
    elif recipe == "cardiac_full":
        # CardiacUDA with every branch: + temporal graph + 64-frame cycle loss
        # (`train_cardiac_uda.py:181,245-253`)
        cfg = cardiac_uda_config(graph_matching=True, discriminator=True,
                                 temporal_graph=True, cyc_loss=True)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=8,
                                          target_batch_mult=1))
    else:
        # B=8+8 is the TPU production default: measured ~equal step time to
        # the paper's 4+4 at 2x throughput (BENCHMARKS.md batch table).
        # `--batch 4` reproduces the paper rows.
        cfg = cardiac_uda_config()
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=8,
                                          target_batch_mult=1))
    return dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16" if bf16 else "float32"))


def _with_batch(cfg, batch):
    if batch is None:
        return cfg
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch))


def _setup(cfg):
    import jax
    import jax.numpy as jnp

    from graphecho_tpu.data.synthetic import SyntheticEchoData
    from graphecho_tpu.train.state import Optimizers, create_train_state
    from graphecho_tpu.train.steps import build_models, make_train_step

    models = build_models(cfg)
    optimizers = Optimizers(cfg)
    data = SyntheticEchoData(cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.train_batch().items()}
    state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                               batch)
    # donate the state like the Trainer does (`train/trainer.py`): XLA then
    # aliases params/opt-state buffers in place instead of rewriting them
    step = jax.jit(make_train_step(cfg, models, optimizers), donate_argnums=0)
    return step, state, batch


# The chip's sustained matmul rate under this exact (chained + fetched)
# methodology: 8192³ bf16 chained matmul on this v5e via the axon tunnel
# (BENCHMARKS.md "measurement methodology"). MFU below is model-FLOPs /
# step-time relative to this MEASURED ceiling; the nominal 197 TFLOP/s bf16
# peak is also shown for cross-paper comparability.
MEASURED_CEILING_TFLOPS = 137.0
NOMINAL_PEAK_TFLOPS = 197.0


def step_flops(step, state, batch):
    """XLA's own FLOP count + HBM temp footprint for the whole jitted train
    step (fwd + bwd + optimizer updates). cost_analysis is per-executable, so
    this is the exact numerator for MFU — not a hand model. Returns
    (flops|None, temp_bytes|None): temp_bytes is the compiler's scratch
    (activation) allocation — the number `ModelConfig.remat` shrinks."""
    temp = None
    try:
        compiled = step.lower(state, batch).compile()
    except Exception as e:  # pragma: no cover — older jaxlibs
        print(f"lower/compile analysis unavailable: {e}", flush=True)
        return None, None
    try:
        mem = compiled.memory_analysis()
        temp = float(getattr(mem, "temp_size_in_bytes", 0.0)) or None
    except Exception as e:  # pragma: no cover
        print(f"memory_analysis unavailable: {e}", flush=True)
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None, temp
    except Exception as e:  # pragma: no cover
        print(f"cost_analysis unavailable: {e}", flush=True)
        return None, temp


def mfu_line(flops, ms):
    tflops = flops / (ms * 1e-3) / 1e12
    return (f"{flops / 1e9:,.0f} GFLOP/step -> {tflops:.1f} TFLOP/s "
            f"= {100 * tflops / MEASURED_CEILING_TFLOPS:.0f}% of measured "
            f"ceiling ({MEASURED_CEILING_TFLOPS:.0f}), "
            f"{100 * tflops / NOMINAL_PEAK_TFLOPS:.0f}% of nominal bf16 peak")


def time_step(step, state, batch, iters=30, trials=5):
    import numpy as np

    # state is DONATED: never reuse an old reference — one continuous chain
    s, metrics = step(state, batch)  # compile + warmup (consumes `state`)
    np.asarray(metrics["total_loss"])

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, metrics = step(s, batch)
        float(metrics["total_loss"])  # chain-tail fetch
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2] * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--recipe", default="cardiac",
                    choices=["cardiac", "camus_temporal", "cardiac_full"])
    ap.add_argument("--batch", type=int, default=None,
                    help="override source batch size (throughput scaling)")
    ap.add_argument("--remat", action="store_true",
                    help="per-block backbone rematerialization "
                         "(ModelConfig.remat): trade ~1 extra backbone "
                         "forward for the intra-block activation memory")
    ap.add_argument("--fused", action="store_true",
                    help="ModelConfig.fused_fpn_forwards: one batched FPN "
                         "apply over the source/target/temporal frames "
                         "instead of 2-3 separate forwards (BN batch-stat "
                         "granularity Deviation; see config.py)")
    args = ap.parse_args()

    import os

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

    cfg = _with_batch(_cfg(args.bf16, args.recipe), args.batch)
    if args.remat:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True))
    if args.fused:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fused_fpn_forwards=True))
    variants = {}

    step, state, batch = _setup(cfg)
    # lower/compile BEFORE time_step: the state is donated there
    flops, temp_bytes = step_flops(step, state, batch)
    if temp_bytes:
        print(f"[{args.recipe}] XLA temp (activation) HBM: "
              f"{temp_bytes / 2**30:.2f} GiB (remat={args.remat})", flush=True)
    variants["full"] = time_step(step, state, batch, args.iters)
    b = cfg.data.batch_size
    print(f"[{args.recipe}] full (B={b}+{b * cfg.data.target_batch_mult}): "
          f"{variants['full']:.1f} ms "
          f"({2 * b / variants['full'] * 1e3:.0f} imgs/s)", flush=True)
    if flops:
        print(f"[{args.recipe}] MFU: {mfu_line(flops, variants['full'])}",
              flush=True)

    if args.recipe == "cardiac_full" and args.batch is None:
        # branch ablations: where do the milliseconds go?
        cfg_nc = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, cyc_loss=False))
        step_nc, state_nc, batch_nc = _setup(cfg_nc)
        variants["no_cycle"] = time_step(step_nc, state_nc, batch_nc, args.iters)
        print(f"no_cycle: {variants['no_cycle']:.1f} ms", flush=True)

        cfg_mo = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, cyc_loss=False,
                                           temporal_graph=False))
        step_mo, state_mo, batch_mo = _setup(cfg_mo)
        variants["main_only"] = time_step(step_mo, state_mo, batch_mo, args.iters)
        print(f"main_only: {variants['main_only']:.1f} ms", flush=True)

    if args.recipe in ("cardiac", "camus_temporal") and args.batch is None:
        cfg2 = dataclasses.replace(
            cfg, gmodule=dataclasses.replace(cfg.gmodule,
                                             with_cluster_update=False))
        step2, state2, batch2 = _setup(cfg2)
        variants["no_spectral"] = time_step(step2, state2, batch2, args.iters)
        print(f"no_spectral: {variants['no_spectral']:.1f} ms", flush=True)

        cfg3 = dataclasses.replace(
            cfg, gmodule=dataclasses.replace(cfg.gmodule, sinkhorn_iters=5))
        step3, state3, batch3 = _setup(cfg3)
        variants["sinkhorn_5"] = time_step(step3, state3, batch3, args.iters)
        print(f"sinkhorn_5: {variants['sinkhorn_5']:.1f} ms", flush=True)

    if args.recipe == "camus_temporal" and args.batch is None:
        # where do the non-FPN milliseconds go? (the temporal branch holds the
        # TGCN recurrence + second GModule pass, `train_camus_echo.py:244-278`)
        cfg_nt = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, temporal_graph=False))
        step_nt, state_nt, batch_nt = _setup(cfg_nt)
        variants["no_temporal"] = time_step(step_nt, state_nt, batch_nt,
                                            args.iters)
        print(f"no_temporal: {variants['no_temporal']:.1f} ms", flush=True)

        cfg_ng = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, temporal_graph=False,
                                           graph_matching=False,
                                           discriminator=False))
        step_ng, state_ng, batch_ng = _setup(cfg_ng)
        variants["seg_only"] = time_step(step_ng, state_ng, batch_ng,
                                         args.iters)
        print(f"seg_only: {variants['seg_only']:.1f} ms", flush=True)

    for k, v in variants.items():
        delta = variants["full"] - v
        print(f"{k:>14}: {v:6.1f} ms  (saves {delta:+5.1f} ms vs full)")


if __name__ == "__main__":
    main()
