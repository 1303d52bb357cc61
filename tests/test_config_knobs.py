"""Config-knob liveness (VERDICT r3 item 3).

Every `ExperimentConfig` leaf must either feed a traced computation / runtime
behavior (LIVE, with a pointer to the consuming code) or be explicitly
documented INFORMATIONAL in `config.py`. The registry test fails when a new
knob lands in neither set; the spot-checks prove the knobs the round-3 review
found dead (`class_threshold`, `SinkhornConfig`, `head_in_cfg`,
`grl_applied_domain`) now change real computation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphecho_tpu.config import ExperimentConfig, SinkhornConfig, TGCNConfig
from graphecho_tpu.train.state import Optimizers, create_train_state
from graphecho_tpu.train.steps import build_models, make_train_step

from test_train_step import tiny_config

# Dotted `OwnerDataclass.field` -> consuming code. One entry per dataclass
# type (ComponentConfig reuse across net/gmn/dis/tgcn collapses naturally).
LIVE = {
    "OptimizerConfig.opt_name": "train/schedule.py::build_optimizer",
    "OptimizerConfig.lr": "train/schedule.py::build_optimizer",
    "OptimizerConfig.weight_decay": "train/schedule.py::build_optimizer",
    "OptimizerConfig.momentum": "train/schedule.py::build_optimizer",
    "OptimizerConfig.betas": "train/schedule.py::build_optimizer",
    "ScheduleConfig.steps": "train/schedule.py::warmup_multistep",
    "ScheduleConfig.gamma": "train/schedule.py::warmup_multistep",
    "ScheduleConfig.warmup_factor": "train/schedule.py::warmup_multistep",
    "ScheduleConfig.warmup_iters": "train/schedule.py::warmup_multistep",
    "ScheduleConfig.warmup_method": "train/schedule.py::warmup_multistep",
    "ModelConfig.backbone": "train/steps.py::build_models",
    "ModelConfig.num_classes": "train/steps.py::build_models",
    "ModelConfig.fpn_channels": "train/steps.py::build_models",
    "ModelConfig.semantic_channels": "train/steps.py::build_models",
    "ModelConfig.compute_dtype": "train/steps.py::build_models",
    "ModelConfig.vgg_spec": "models/backbones.py::VGG16",
    "ModelConfig.remat": "models/backbones.py (per-block nn.remat)",
    "ModelConfig.fused_fpn_forwards": "train/steps.py (single batched FPN "
                                      "apply; Deviation, parity-gated)",
    "NodeSamplerConfig.pos_budget_per_level": "ops/sampling.py::sample_nodes",
    "NodeSamplerConfig.bg_ratio": "ops/sampling.py (bg_budget_per_level)",
    "NodeSamplerConfig.bg_budget_per_level": "ops/sampling.py::sample_nodes "
                                             "(derived property: "
                                             "pos_budget * bg_ratio)",
    "NodeSamplerConfig.class_threshold": "train/steps.py (target score maps)",
    "NodeSamplerConfig.fpn_strides": "ops/sampling.py::sample_nodes",
    "NodeSamplerConfig.sizes_of_interest": "ops/sampling.py::sample_nodes",
    "GModuleConfig.in_channels": "models/graph_matching.py::GModule.setup",
    "GModuleConfig.num_classes": "models/graph_matching.py",
    "GModuleConfig.matching_cfg": "models/graph_matching.py (matching loss)",
    "GModuleConfig.matching_loss_type": "models/graph_matching.py",
    "GModuleConfig.with_cluster_update": "models/graph_matching.py (seeds)",
    "GModuleConfig.with_semantic_completion": "models/graph_matching.py",
    "GModuleConfig.with_quadratic_matching": "models/graph_matching.py",
    "GModuleConfig.with_domain_interaction": "models/graph_matching.py",
    "GModuleConfig.with_complete_graph": "models/graph_matching.py",
    "GModuleConfig.with_node_dis": "models/graph_matching.py",
    "GModuleConfig.with_global_graph": "models/graph_matching.py",
    "GModuleConfig.node_dis_place": "models/graph_matching.py",
    "GModuleConfig.head_in_cfg": "models/graph_matching.py (LN head vs "
                                 "GRAPHHead project_features)",
    "GModuleConfig.with_score_weight": "models/graph_matching.py (node CE)",
    "GModuleConfig.weight_matching": "models/graph_matching.py",
    "GModuleConfig.weight_nodes": "models/graph_matching.py",
    "GModuleConfig.weight_dis": "models/graph_matching.py",
    "GModuleConfig.lambda_dis": "models/graph_matching.py (GRL)",
    "GModuleConfig.sinkhorn_iters": "models/graph_matching.py",
    "GModuleConfig.dropout": "models/graph_matching.py (attention)",
    "GModuleConfig.seed_cluster_min_nodes": "models/graph_matching.py",
    "GModuleConfig.spectral_solver": "ops/spectral.py via graph_matching",
    "GModuleConfig.nodes_per_class": "models/graph_matching.py (slots)",
    "DiscriminatorConfig.num_convs": "train/steps.py::build_models",
    "DiscriminatorConfig.in_channels": "train/steps.py::build_models",
    "DiscriminatorConfig.grad_reverse_lambda": "train/steps.py::build_models",
    "DiscriminatorConfig.grl_applied_domain": "train/steps.py::build_models",
    "DiscriminatorConfig.loss_weight": "train/steps.py (loss_adv_*)",
    "TGCNConfig.input_dim": "models/tgcn.py::TGCN.setup",
    "TGCNConfig.hidden_dim": "models/tgcn.py::TGCN.setup",
    "TGCNConfig.clip_shape": "models/tgcn.py (grid + pos_embed)",
    "TGCNConfig.knn_k": "models/tgcn.py (recurrent kNN graph)",
    "TGCNConfig.cluster_method": "models/tgcn.py (clustering loss)",
    "TGCNConfig.transport_method": "models/tgcn.py (transport loss)",
    "TGCNConfig.queue_size": "models/tgcn.py (momentum queues)",
    "TGCNConfig.queue_momentum": "models/tgcn.py::_queue_update",
    "TGCNConfig.pool_ratios": "train/state.py (init shapes) + profiling",
    "TGCNConfig.source_class": "models/tgcn.py + real_training.py",
    "TGCNConfig.target_class": "models/tgcn.py + data/synthetic.py",
    "SinkhornConfig.eps": "models/tgcn.py (sinkhorn_distance transport)",
    "SinkhornConfig.max_iter": "models/tgcn.py (sinkhorn_distance transport)",
    "SinkhornConfig.reduction": "models/tgcn.py (sinkhorn_distance transport)",
    "CycleConfig.target_region": "train/cycle.py::seg_cycle",
    "CycleConfig.cyc_off": "train/cycle.py::seg_cycle",
    "CycleConfig.chunk_size": "train/cycle.py::seg_cycle",
    "CycleConfig.temperature": "train/cycle.py::seg_cycle",
    "CycleConfig.clip_length": "train/steps.py (cyc clip split)",
    "DataConfig.img_res": "data/transforms.py + loaders",
    "DataConfig.img_crop": "data/transforms.py + loaders",
    "DataConfig.clip_length": "data loaders (temporal clips)",
    "DataConfig.total_length": "data/cardiac_uda.py + camus",
    "DataConfig.view_num": "data loaders + real_training.py",
    "DataConfig.seg_parts": "data loaders",
    "DataConfig.batch_size": "data/loader.py + real_training.py",
    "DataConfig.target_batch_mult": "data/loader.py + synthetic",
    "DataConfig.num_workers": "data/loader.py (prefetch threads)",
    "TrainConfig.num_epochs": "train/trainer.py",
    "TrainConfig.cyc_loss": "train/steps.py (branch gate)",
    "TrainConfig.temporal_graph": "train/steps.py (branch gate)",
    "TrainConfig.graph_matching": "train/steps.py (branch gate)",
    "TrainConfig.discriminator": "train/steps.py (branch gate)",
    "TrainConfig.seg_parts": "train/trainer.py + real_training.py",
    "TrainConfig.record_params": "train/trainer.py (param histograms)",
    "TrainConfig.save_dir": "train/trainer.py (checkpoints)",
    "TrainConfig.log_dir": "train/trainer.py (summary writer)",
    "TrainConfig.seed": "train/trainer.py (rng)",
    "TrainConfig.debug_nans": "train/trainer.py (jax_debug_nans gate)",
    "TrainConfig.mesh_data": "train/trainer.py::create_mesh",
}

# Explicitly informational — documented as such at the definition site.
INFORMATIONAL = {
    "ModelConfig.in_channels": "flax infers conv input width from the data",
    "NodeSamplerConfig.bg_threshold": "reference act-map sampler branch is "
                                      "dead upstream; consciously omitted "
                                      "(ops/sampling.py docstring)",
}


def _leaf_keys(obj, out):
    # properties count as knobs too: a computed accessor nobody consumes is
    # exactly as dead as an unused field (r4 review: `num_node_classes` was a
    # dead property with a false docstring, invisible to the fields-only scan)
    for name, attr in vars(type(obj)).items():
        if isinstance(attr, property):
            out.add(f"{type(obj).__name__}.{name}")
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            _leaf_keys(v, out)
        else:
            out.add(f"{type(obj).__name__}.{f.name}")
    return out


def test_every_config_leaf_is_classified():
    keys = _leaf_keys(ExperimentConfig(), set())
    unclassified = keys - set(LIVE) - set(INFORMATIONAL)
    assert not unclassified, (
        f"new config knobs lack a LIVE/INFORMATIONAL entry: {unclassified}")
    stale = (set(LIVE) | set(INFORMATIONAL)) - keys
    assert not stale, f"registry entries for removed knobs: {stale}"
    overlap = set(LIVE) & set(INFORMATIONAL)
    assert not overlap, f"knobs classified twice: {overlap}"


def _with_sampler(cfg, **kw):
    return dataclasses.replace(
        cfg, gmodule=dataclasses.replace(
            cfg.gmodule,
            sampler=dataclasses.replace(cfg.gmodule.sampler, **kw)))


def test_class_threshold_changes_target_sampling():
    """An extreme pseudo-label threshold must empty the target boxes and move
    the graph losses (r3 review: the knob silently no-op'd at 0.5)."""
    from graphecho_tpu.data.synthetic import SyntheticEchoData

    cfg = tiny_config(graph_matching=True, discriminator=False)
    models = build_models(cfg)
    optimizers = Optimizers(cfg)
    data = SyntheticEchoData(cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.train_batch().items()}
    state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                               batch)

    cfg_hi = _with_sampler(cfg, class_threshold=1.0 - 1e-9)
    _, m_default = jax.jit(make_train_step(cfg, models, optimizers))(
        state, batch)
    _, m_hi = jax.jit(make_train_step(cfg_hi, models, optimizers))(
        state, batch)
    graph_keys = ("node_loss", "mat_loss_aff", "dis_loss")
    assert any(
        not np.allclose(float(m_default[k]), float(m_hi[k]))
        for k in graph_keys), (
        "class_threshold had no effect on target-dependent losses")


def test_sinkhorn_config_changes_transport_loss():
    """SinkhornConfig must reach the TGCN sinkhorn transport (r3 review: the
    whole block was never consumed)."""
    from graphecho_tpu.models.tgcn import TGCN

    cfg = TGCNConfig(input_dim=16, hidden_dim=16, clip_shape=(2, 4, 4),
                     knn_k=3, cluster_method=None,
                     transport_method="sinkhorn_distance",
                     pool_ratios=(4, 2, 1, 1))
    rng = np.random.RandomState(5)
    clips = [jnp.asarray(rng.randn(2, 2, s, s, 16).astype(np.float32))
             for s in (16, 8, 4, 4)]
    nodes = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    valid = jnp.ones(10, bool)
    queues = (jnp.zeros((16, 5)), jnp.zeros((16, 5)))
    idx = (jnp.asarray([0]), jnp.asarray([1]))

    ref = TGCN(cfg, sinkhorn=SinkhornConfig(eps=0.1, max_iter=5))
    variables = ref.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         clips, nodes, valid, nodes, valid, queues, idx)

    def run(model):
        (losses, _), _ = model.apply(
            variables, clips, nodes, valid, nodes, valid, queues, idx,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return float(losses["sinkhorn_loss"])

    coarse = TGCN(cfg, sinkhorn=SinkhornConfig(eps=5.0, max_iter=1))
    assert run(ref) != pytest.approx(run(coarse)), (
        "SinkhornConfig had no effect on the transport loss")


def test_head_in_gn_path_trains():
    """head_in_cfg='GN' routes through the GRAPHHead conv tower on the maps
    (reference `graph_matching.py:274-276`): params exist, get gradients, and
    the LN node head is absent."""
    cfg = tiny_config(graph_matching=True, discriminator=False)
    cfg = dataclasses.replace(
        cfg, gmodule=dataclasses.replace(cfg.gmodule, head_in_cfg="GN"))
    from graphecho_tpu.data.synthetic import SyntheticEchoData

    models = build_models(cfg)
    optimizers = Optimizers(cfg)
    data = SyntheticEchoData(cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.train_batch().items()}
    state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                               batch)
    assert "graph_head" in state.gmn_params
    assert "head_in_1" not in state.gmn_params

    step = jax.jit(make_train_step(cfg, models, optimizers))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    before = jax.tree_util.tree_leaves(state.gmn_params["graph_head"])
    after = jax.tree_util.tree_leaves(new_state.gmn_params["graph_head"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after)), (
        "GRAPHHead params did not move — tower not in the gradient path")


def test_head_in_bn_rejected():
    from graphecho_tpu.models.graph_matching import GModule

    cfg = tiny_config().gmodule
    cfg = dataclasses.replace(cfg, head_in_cfg="BN")
    with pytest.raises(ValueError, match="head_in_cfg"):
        GModule(cfg).init(
            {"params": jax.random.PRNGKey(0)},
            None, None, (None, None))


def test_discriminator_without_graph_matching_rejected():
    cfg = tiny_config(graph_matching=False, discriminator=True)
    with pytest.raises(ValueError, match="graph_matching"):
        build_models(cfg)


def test_grl_applied_domain_reaches_discriminator():
    cfg = tiny_config(graph_matching=True, discriminator=True)
    cfg = dataclasses.replace(
        cfg, dis=dataclasses.replace(cfg.dis, grl_applied_domain="target"))
    dis = build_models(cfg)["discriminator"]
    assert dis.grl_applied_domain == "target"
