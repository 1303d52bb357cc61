"""Train state: one pytree holding everything the jitted step needs.

Unlike the reference — which scatters state across 6 nn.Modules, 6 torch
optimizers, registered buffers, and sklearn side effects — the TPU design
threads a single flax.struct dataclass through a pure `train_step`. Everything
(params, BN stats, optimizer states, seed banks, momentum queues, rng) is a
leaf of the same pytree, so checkpointing, sharding, and donation are uniform.

The reference never checkpoints discriminator/GModule/TGCN weights or the seed
banks (`train_camus_echo.py:447-488` saves the FPN only); here the full state
is one orbax-checkpointable object.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from graphecho_tpu.config import ExperimentConfig
from graphecho_tpu.train.schedule import build_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    epoch: jnp.ndarray
    rng: jax.Array

    net_params: Any
    net_batch_stats: Any
    net_opt: Any

    gmn_params: Any = None
    gmn_opt: Any = None
    sr_seed: Optional[jnp.ndarray] = None
    tg_seed: Optional[jnp.ndarray] = None

    dis_params: Any = None  # dict level name -> params
    dis_opt: Any = None

    tgcn_params: Any = None
    tgcn_batch_stats: Any = None
    tgcn_opt: Any = None
    queue_source: Optional[jnp.ndarray] = None
    queue_target: Optional[jnp.ndarray] = None


class Optimizers:
    """Per-component optax transforms (built once, closed over by the step)."""

    def __init__(self, cfg: ExperimentConfig, steps_per_epoch: int = 1):
        # The reference steps its schedulers once per EPOCH
        # (`train_camus_echo.py:312-316`); build_optimizer floors the optax
        # update count to the epoch index so the LR is exactly the reference's
        # step-function-of-epoch (see schedule.build_optimizer).
        t = cfg.train
        self.net = build_optimizer(t.net, steps_per_epoch)
        self.gmn = build_optimizer(t.gmn, steps_per_epoch)
        self.dis = build_optimizer(t.dis, steps_per_epoch)
        self.tgcn = build_optimizer(t.tgcn, steps_per_epoch)


def create_train_state(cfg: ExperimentConfig, models: Dict[str, Any],
                       optimizers: Optimizers, rng: jax.Array,
                       sample_batch: Dict[str, jnp.ndarray]) -> TrainState:
    """Initialize all params/state from a sample batch (shapes only)."""
    from graphecho_tpu.ops.sampling import NodeSet

    t = cfg.train
    k_net, k_gmn, k_dis, k_tgcn, k_seed, k_state = jax.random.split(rng, 6)

    fpn = models["fpn"]
    variables = fpn.init(k_net, sample_batch["imgs_source"])
    net_params = variables["params"]
    net_batch_stats = variables.get("batch_stats", {})

    state_kwargs: Dict[str, Any] = dict(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        rng=k_state,
        net_params=net_params,
        net_batch_stats=net_batch_stats,
        net_opt=optimizers.net.init(net_params),
    )

    if t.graph_matching:
        gm = models["gmodule"]
        c = cfg.gmodule.in_channels
        n_budget = 4 * (cfg.gmodule.sampler.pos_budget_per_level
                        + cfg.gmodule.sampler.bg_budget_per_level)
        dummy = NodeSet(points=jnp.zeros((n_budget, c)),
                        labels=jnp.zeros((n_budget,), jnp.int32),
                        weights=jnp.ones((n_budget,)),
                        valid=jnp.ones((n_budget,), bool))
        seeds = (jax.random.normal(k_seed, (cfg.gmodule.num_classes, c)),
                 jax.random.normal(jax.random.fold_in(k_seed, 1),
                                   (cfg.gmodule.num_classes, c)))
        gmn_vars = gm.init({"params": k_gmn, "gmodule": k_gmn, "dropout": k_gmn},
                           dummy, dummy, seeds)
        gmn_params = gmn_vars["params"]
        if cfg.gmodule.head_in_cfg != "LN":
            # the GRAPHHead tower is traced only via project_features (the
            # __call__ init above never touches it) — init it separately on
            # map-shaped dummies and merge its params in
            maps = [jnp.zeros((1, 8, 8, c))] * 4
            head_vars = gm.init({"params": jax.random.fold_in(k_gmn, 7)},
                                maps, method=type(gm).project_features)
            gmn_params = {**gmn_params, **head_vars["params"]}
        state_kwargs.update(
            gmn_params=gmn_params,
            gmn_opt=optimizers.gmn.init(gmn_params),
            sr_seed=seeds[0],
            tg_seed=seeds[1],
        )

    if t.discriminator and t.graph_matching:
        dis = models["discriminator"]
        f = jnp.zeros((1, 8, 8, cfg.gmodule.in_channels))
        dis_params = {
            lvl: dis.init(jax.random.fold_in(k_dis, i), (f, f))["params"]
            for i, lvl in enumerate(("p2", "p3", "p4", "p5"))
        }
        state_kwargs.update(dis_params=dis_params,
                            dis_opt=optimizers.dis.init(dis_params))

    if t.temporal_graph:
        tgcn = models["tgcn"]
        tc = cfg.tgcn
        tl, gh, gw = tc.clip_shape
        sizes = [gh * r for r in tc.pool_ratios]
        clips = [jnp.zeros((2, tl, s, s, tc.input_dim)) for s in sizes]
        n_nodes = cfg.gmodule.num_classes * cfg.gmodule.nodes_per_class
        nodes = jnp.zeros((n_nodes, tc.input_dim))
        valid = jnp.ones((n_nodes,), bool)
        queues = (jax.random.normal(jax.random.fold_in(k_tgcn, 1),
                                    (tc.hidden_dim, tc.queue_size)),
                  jax.random.normal(jax.random.fold_in(k_tgcn, 2),
                                    (tc.hidden_dim, tc.queue_size)))
        idx = (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        tgcn_vars = tgcn.init({"params": k_tgcn, "dropout": k_tgcn},
                              clips, nodes, valid, nodes, valid, queues, idx)
        # reference normalizes the queues at init (`TGCN.py:197-198`)
        qs = queues[0] / jnp.linalg.norm(queues[0], axis=0, keepdims=True)
        qt = queues[1] / jnp.linalg.norm(queues[1], axis=0, keepdims=True)
        state_kwargs.update(
            tgcn_params=tgcn_vars["params"],
            tgcn_batch_stats=tgcn_vars.get("batch_stats", {}),
            tgcn_opt=optimizers.tgcn.init(tgcn_vars["params"]),
            queue_source=qs,
            queue_target=qt,
        )

    return TrainState(**state_kwargs)
