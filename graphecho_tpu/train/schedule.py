"""LR schedules and per-component optimizers (optax).

`warmup_multistep_schedule` reproduces the reference `WarmupMultiStepLR`
(`/root/reference/utils/lr_scheduler.py:9-51`): constant-or-linear warmup for
`warmup_iters` steps at `warmup_factor`, then multiply by `gamma` at each
milestone. The reference steps its schedulers once per epoch
(`train_camus_echo.py:312-316`), so "step" here means whatever the caller
counts — we keep that contract.

`build_optimizer` maps the reference's per-component Adam/SGD configs
(`train_camus_echo.py:425-435`) to optax chains. Torch `Adam(weight_decay=w)`
adds the decay to the gradient (L2, not decoupled AdamW) — we reproduce that
with `optax.add_decayed_weights` *before* the Adam transform.
"""

from __future__ import annotations

import optax

from graphecho_tpu.config import ComponentConfig, OptimizerConfig, ScheduleConfig


def warmup_multistep_schedule(base_lr: float, cfg: ScheduleConfig) -> optax.Schedule:
    milestones = tuple(sorted(cfg.steps))

    def schedule(count):
        import jax.numpy as jnp

        count = jnp.asarray(count)
        if cfg.warmup_method == "constant":
            warmup = jnp.where(count < cfg.warmup_iters, cfg.warmup_factor, 1.0)
        else:  # linear
            alpha = jnp.minimum(count / max(cfg.warmup_iters, 1), 1.0)
            w = cfg.warmup_factor * (1 - alpha) + alpha
            warmup = jnp.where(count < cfg.warmup_iters, w, 1.0)
        decay_pow = sum((count >= m).astype("int32") for m in milestones) if milestones else 0
        return base_lr * warmup * (cfg.gamma ** decay_pow)

    return schedule


def build_optimizer(cfg: ComponentConfig,
                    steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """optax transform for one component. `steps_per_epoch > 1` reproduces the
    reference's per-EPOCH scheduler stepping (`train_camus_echo.py:312-316`)
    exactly, by flooring the optax update count to the epoch index — the LR is
    a step function of the epoch, constant within it. (Scaling the schedule
    constants instead would be equivalent for milestones and constant warmup
    but would interpolate 'linear' warmup WITHIN an epoch, which the reference
    never does.)"""
    if steps_per_epoch < 1:
        # `count // 0` inside the jitted schedule would not raise — it yields
        # an implementation-defined integer and silently trains at a garbage
        # LR. Fail loudly at build time instead (a dataset smaller than the
        # batch is the typical way a caller arrives at 0 here).
        raise ValueError(f"steps_per_epoch must be >= 1, got {steps_per_epoch}")
    opt: OptimizerConfig = cfg.opt
    base_schedule = warmup_multistep_schedule(opt.lr, cfg.sch)
    if steps_per_epoch == 1:
        lr_schedule = base_schedule
    else:
        lr_schedule = lambda count: base_schedule(count // steps_per_epoch)
    parts = []
    if opt.weight_decay:
        # torch couples weight decay into the gradient for both SGD and Adam
        parts.append(optax.add_decayed_weights(opt.weight_decay))
    if opt.opt_name == "Adam":
        parts.append(optax.scale_by_adam(b1=opt.betas[0], b2=opt.betas[1]))
    elif opt.opt_name == "SGD":
        if opt.momentum:
            parts.append(optax.trace(decay=opt.momentum, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer {opt.opt_name!r}")
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def cosine_lr(base_lr: float, epoch: int, total_epochs: int) -> float:
    """Cosine decay helper mirroring the reference's (unused)
    `adjust_learning_rate` (`train_camus_echo.py:419-423`)."""
    import math

    return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / total_epochs))
