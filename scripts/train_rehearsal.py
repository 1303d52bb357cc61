"""Chip-side training rehearsal: prove the trainer TRAINS, not just steps.

VERDICT r3 item 2 — runs a full paper recipe (`camus_temporal` or
`cardiac_full`) for hundreds of REAL optimizer steps on the TPU with
synthetic (learnable) data, validates every epoch, checkpoints via orbax,
optionally SIGTERMs itself mid-run (preemption rehearsal), and — re-invoked
with the same --ckpt — resumes and continues the loss/dice curve exactly.
This is the closest achievable stand-in for BASELINE.md's ±0.5-dice parity
in an environment with no datasets or reference checkpoints; reference
analog: the epoch loop `train_camus_echo.py:183-347`.

Determinism across interruption: every train batch is generated from
`RandomState(data_seed + global_step)`, and the per-epoch iterator starts at
the restored `state.step` — so (state, data) sequences are identical whether
or not the run was preempted, and the resumed curve must overlay the
uninterrupted one step-for-step (rng/BN stats/queues/seeds all live in the
one TrainState orbax round-trips).

Usage (TPU):
  env PYTHONPATH=/root/.axon_site:/root/repo \
      JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
      python scripts/train_rehearsal.py --recipe camus_temporal --bf16 \
          --epochs 10 --steps-per-epoch 30 --ckpt /tmp/rehearsal_camus \
          --out /tmp/rehearsal_camus.jsonl [--sigterm-at-step 150]

Emits one JSON line per epoch:
  {"recipe":..., "epoch": E, "step": S, "total_loss":..., "seg_loss":...,
   "dice":..., "step_seconds":...}
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_train_step import _cfg  # noqa: E402  (recipe configs, shared)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="camus_temporal",
                    choices=["cardiac", "camus_temporal", "cardiac_full"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--epochs", type=int, default=10,
                    help="TOTAL epochs (resume runs the remainder)")
    ap.add_argument("--steps-per-epoch", type=int, default=30)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True, help="JSONL curve log (appended)")
    ap.add_argument("--sigterm-at-step", type=int, default=None,
                    help="raise SIGTERM in-process once this global step "
                         "completes (preemption rehearsal)")
    ap.add_argument("--eval-samples", type=int, default=16)
    ap.add_argument("--data-seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

    from graphecho_tpu.data.synthetic import SyntheticEchoData
    from graphecho_tpu.train.trainer import Trainer

    cfg = _cfg(args.bf16, args.recipe)
    trainer = Trainer(cfg, checkpoint_dir=args.ckpt)
    sample = SyntheticEchoData(cfg, seed=args.data_seed).train_batch()
    trainer.init_state(sample)  # restores the latest orbax step if present

    spe = args.steps_per_epoch

    def batch_iter():
        # start at the live global step: after a mid-epoch preemption this
        # yields exactly the remainder of the interrupted epoch
        s0 = int(trainer.state.step)
        end = ((s0 // spe) + 1) * spe
        for s in range(s0, end):
            data = SyntheticEchoData(cfg, seed=args.data_seed + 1000 + s)
            yield data.train_batch()
            if args.sigterm_at_step is not None and s + 1 == args.sigterm_at_step:
                print(f"[rehearsal] raising SIGTERM at global step {s + 1}",
                      flush=True)
                os.kill(os.getpid(), signal.SIGTERM)

    def eval_batches():
        # FIXED eval set (fresh identically-seeded stream every epoch)
        return SyntheticEchoData(cfg, seed=args.data_seed + 99).eval_batches(
            args.eval_samples)

    out = open(args.out, "a")

    def record(epoch, means, dices):
        row = {
            "recipe": args.recipe,
            "bf16": args.bf16,
            "step": int(trainer.state.step),
            "total_loss": round(means.get("total_loss", float("nan")), 6),
            "seg_loss": round(means.get("seg_loss", float("nan")), 6),
            "dice": round(dices.get("synth", float("nan")), 6),
            "step_seconds": round(means.get("step_seconds", 0.0), 4),
        }
        out.write(json.dumps(row) + "\n")
        out.flush()

    done = int(trainer.state.step) // spe
    remaining = max(args.epochs - done, 0)
    if done:
        print(f"[rehearsal] resumed at step {int(trainer.state.step)} "
              f"(epoch {done}); {remaining} epochs remain", flush=True)
    trainer.train(batch_iter, num_epochs=remaining,
                  eval_fns={"synth": eval_batches}, on_epoch_end=record)
    out.close()
    print(f"[rehearsal] done at step {int(trainer.state.step)}", flush=True)


if __name__ == "__main__":
    main()
