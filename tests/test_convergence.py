"""Convergence test (VERDICT r1 item 5): a short synthetic training run must
actually LEARN — segmentation loss halves and eval dice clears a threshold.
Locks in the round-1 'convergence-verified' claim with an automated check.

Synthetic frames paint bright ellipses where the masks are
(`data/synthetic.py`), so a working train step + optimizer drives dice up
quickly even from random init."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphecho_tpu.data.synthetic import SyntheticEchoData
from graphecho_tpu.train.metrics import overlap_metrics_from_counts
from graphecho_tpu.train.state import Optimizers, create_train_state
from graphecho_tpu.train.steps import build_models, make_eval_step, make_train_step
from test_train_step import tiny_config


def test_seg_loss_halves_and_dice_rises():
    cfg = tiny_config(graph_matching=False, discriminator=False)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=8))
    models = build_models(cfg)
    optimizers = Optimizers(cfg)
    data = SyntheticEchoData(cfg, seed=0)

    # small fixed pool of batches (epoch-style revisits, like real training)
    pool = [data.train_batch() for _ in range(4)]
    jpool = [{k: jnp.asarray(v) for k, v in b.items()} for b in pool]
    state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                               jpool[0])
    step = jax.jit(make_train_step(cfg, models, optimizers))

    first_loss = None
    for i in range(40):
        state, metrics = step(state, jpool[i % len(jpool)])
        if first_loss is None:
            first_loss = float(metrics["seg_loss"])
    last_loss = float(metrics["seg_loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # eval dice on held-out synthetic frames
    ev = jax.jit(make_eval_step(cfg, models))
    totals = {}
    for imgs, masks in data.eval_batches(8):
        counts, _, _ = ev(state, jnp.asarray(imgs), jnp.asarray(masks))
        for k, v in counts.items():
            totals[k] = totals.get(k, 0.0) + v
    dice = float(overlap_metrics_from_counts(totals).dice)
    assert dice > 0.5, dice
