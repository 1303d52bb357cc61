"""End-to-end train-step tests on synthetic data (small shapes).

Asserts the reference loss-dict key contract (SURVEY.md §4(e)):
{seg_loss, dis_loss, node_loss, mat_loss_aff, mat_loss_qu, loss_adv_p2..p5}
(+ temporal_graph_loss / cyc_loss when enabled), finite losses, and that a
step actually changes parameters of every component.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphecho_tpu.config import (
    DataConfig,
    ExperimentConfig,
    GModuleConfig,
    ModelConfig,
    NodeSamplerConfig,
    TGCNConfig,
    TrainConfig,
)
from graphecho_tpu.data.synthetic import SyntheticEchoData
from graphecho_tpu.train.state import Optimizers, create_train_state
from graphecho_tpu.train.steps import build_models, make_eval_step, make_train_step


def tiny_config(backbone="VGG16", **train_overrides) -> ExperimentConfig:
    """Cardiac-style by default (BG channel + organ channels) so the graph
    path is ACTIVE: the camus config's single mask channel yields only label-0
    boxes, zero positive nodes, and the reference's <6-node early exit
    (`graph_matching.py:259-260`) — which gates all graph losses to 0."""
    sampler = NodeSamplerConfig(pos_budget_per_level=16)
    return ExperimentConfig(
        train=TrainConfig(**train_overrides),
        data=DataConfig(img_crop=(64, 64), batch_size=2, target_batch_mult=2),
        model=ModelConfig(backbone=backbone, in_channels=1, num_classes=2),
        gmodule=GModuleConfig(num_classes=2, nodes_per_class=24, sampler=sampler),
        tgcn=TGCNConfig(input_dim=256, hidden_dim=256, clip_shape=(2, 8, 8),
                        pool_ratios=(2, 1, 1, 1), queue_size=10,
                        cluster_method="momentum_queue"),
    )


def _setup(cfg):
    models = build_models(cfg)
    optimizers = Optimizers(cfg)
    data = SyntheticEchoData(cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.train_batch().items()}
    state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                               batch)
    return models, optimizers, data, batch, state


def test_train_step_full_graph_matching():
    cfg = tiny_config(graph_matching=True, discriminator=True)
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    new_state, metrics = step(state, batch)

    want_keys = {"seg_loss", "dis_loss", "node_loss", "mat_loss_aff",
                 "mat_loss_qu", "loss_adv_p2", "loss_adv_p3", "loss_adv_p4",
                 "loss_adv_p5", "total_loss"}
    assert want_keys <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # every component's params moved
    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert changed(state.net_params, new_state.net_params)
    assert changed(state.gmn_params, new_state.gmn_params)
    assert changed(state.dis_params, new_state.dis_params)
    assert int(new_state.step) == 1
    # cardiac-style masks must activate the graph path (nonzero node loss)
    assert float(metrics["node_loss"]) > 0
    assert not np.allclose(np.asarray(new_state.sr_seed), np.asarray(state.sr_seed))

    # second step runs from the new state (shapes stable under jit)
    batch2 = {k: jnp.asarray(v) for k, v in data.train_batch().items()}
    _, metrics2 = step(new_state, batch2)
    assert np.isfinite(float(metrics2["total_loss"]))


def test_train_step_camus_single_class_gates_graph_losses():
    """camus view-'2' quirk: 1 mask channel -> all labels 0 -> graph losses 0."""
    cfg = tiny_config(backbone="resnet", graph_matching=True, discriminator=True)
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    _, metrics = step(state, batch)
    for k in ("dis_loss", "node_loss", "mat_loss_aff", "mat_loss_qu"):
        assert float(metrics[k]) == 0.0, k
    assert float(metrics["seg_loss"]) > 0


def test_train_step_seg_only():
    cfg = tiny_config(graph_matching=False, discriminator=False)
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    _, metrics = step(state, batch)
    assert set(metrics) == {"seg_loss", "total_loss"}


def test_temporal_without_graph_matching_rejected():
    """temporal_graph=True without graph_matching must fail loud at build
    time: the temporal branch reuses the GModule (the reference crashes too —
    `train_camus_echo.py:271-272` calls self.graph_model, constructed only
    under graph_matching, `:69-74`)."""
    import pytest

    from graphecho_tpu.train.steps import build_models

    cfg = tiny_config(graph_matching=False, temporal_graph=True)
    with pytest.raises(ValueError, match="graph_matching"):
        build_models(cfg)


def test_train_step_temporal_graph():
    # pyramid levels must pool evenly onto the node grid: 128² -> levels
    # 32/16/8/4, r=(8,4,2,1) -> all 4x4 (the reference geometry only closes at
    # 256² with an 8x8 grid; temporal_graph is dead-config for CAMUS 112²)
    cfg = tiny_config(graph_matching=True, discriminator=True,
                      temporal_graph=True)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_crop=(128, 128)),
        tgcn=dataclasses.replace(cfg.tgcn, clip_shape=(2, 4, 4),
                                 pool_ratios=(8, 4, 2, 1)))
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    new_state, metrics = step(state, batch)
    assert "temporal_graph_loss" in metrics
    assert np.isfinite(float(metrics["temporal_graph_loss"]))
    # queues updated at the given indices
    assert not np.allclose(np.asarray(new_state.queue_source),
                           np.asarray(state.queue_source))


def test_fused_fpn_forwards_matches_separate():
    """ModelConfig.fused_fpn_forwards batches the step's 3 same-geometry FPN
    applies (source / target / temporal frames) into ONE apply. Its only
    numerical effect is BN batch-stat granularity (union batch vs
    per-forward) — so with every frame in every branch IDENTICAL, union-batch
    statistics equal per-forward statistics and the fused step must reproduce
    the separate-forwards step: same losses, same parameter updates."""
    base = tiny_config(graph_matching=True, discriminator=True,
                       temporal_graph=True)
    base = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, img_crop=(128, 128)),
        tgcn=dataclasses.replace(base.tgcn, clip_shape=(2, 4, 4),
                                 pool_ratios=(8, 4, 2, 1)))
    models, optimizers, data, batch, state = _setup(base)
    x0 = batch["imgs_source"][:1]
    batch = dict(batch)
    batch["imgs_source"] = jnp.tile(x0, (batch["imgs_source"].shape[0], 1, 1, 1))
    batch["imgs_target"] = jnp.tile(x0, (batch["imgs_target"].shape[0], 1, 1, 1))
    for k in ("temp_imgs_source", "temp_imgs_target"):
        bc, tl = batch[k].shape[:2]
        batch[k] = jnp.tile(x0[None], (bc, tl, 1, 1, 1))

    fused_cfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, fused_fpn_forwards=True))
    step_sep = jax.jit(make_train_step(base, models, optimizers))
    step_fused = jax.jit(make_train_step(fused_cfg, models, optimizers))
    s1, m1 = step_sep(state, batch)
    s2, m2 = step_fused(state, batch)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    # parameter-update agreement: rel-L2 + cosine, not elementwise — fp
    # reduction order differs between the union-batch and per-forward BN
    # means, and Adam's first step is sign(g)*lr, so near-zero-gradient
    # elements flip sign under 1e-7 logit noise. Compare the net's REAL-
    # gradient kernels (the GN-fed biases are pure sign noise on both sides,
    # same exclusion as test_train_step_parity), and the SGD components
    # (gmn: linear in the gradient) over every leaf.
    def dclose(a, b, o, what, rel, cos_min):
        d1 = (np.asarray(a) - np.asarray(o)).ravel()
        d2 = (np.asarray(b) - np.asarray(o)).ravel()
        n2 = np.linalg.norm(d2)
        if n2 < 1e-9:
            # mathematically-zero-gradient leaves (e.g. attention key bias:
            # softmax is shift-invariant in the keys) move only by fp dust
            assert np.linalg.norm(d1) < 1e-9, what
            return
        assert np.linalg.norm(d1 - d2) / n2 < rel, (
            f"{what}: rel {np.linalg.norm(d1 - d2) / n2:.4f}")
        assert np.dot(d1, d2) / (np.linalg.norm(d1) * n2) > cos_min, what

    for name in ("toplayer", "latlayer1", "smooth1", "semantic_branch",
                 "conv2", "conv3"):
        dclose(s1.net_params[name]["kernel"], s2.net_params[name]["kernel"],
               state.net_params[name]["kernel"], f"net.{name}",
               rel=0.2, cos_min=0.98)
    dclose(s1.net_params["backbone"]["block5_conv3"]["Conv_0"]["kernel"],
           s2.net_params["backbone"]["block5_conv3"]["Conv_0"]["kernel"],
           state.net_params["backbone"]["block5_conv3"]["Conv_0"]["kernel"],
           "net.block5_conv3", rel=0.2, cos_min=0.98)
    for (p1, a), (_, b), (_, o) in zip(
            *(jax.tree_util.tree_flatten_with_path(t)[0] for t in
              (s1.gmn_params, s2.gmn_params, state.gmn_params))):
        dclose(a, b, o, f"gmn.{jax.tree_util.keystr(p1)}",
               rel=0.05, cos_min=0.99)
    # seeds are EMAs of DEEP (post-attention) features, which inherit the
    # BN-reduction fp-order noise — measured max elementwise rel 1e-3
    np.testing.assert_allclose(np.asarray(s1.sr_seed), np.asarray(s2.sr_seed),
                               rtol=5e-3, atol=1e-4)


def test_train_step_bf16_every_branch():
    """compute_dtype='bfloat16' (the measured TPU fast path, BENCHMARKS.md)
    through EVERY branch — graph matching + discriminators + temporal + cycle.
    Regression: the bf16 path had no CPU coverage and the TGCN nn.scan carry
    dtype mismatch shipped unseen (only --bf16 TPU recipes crashed)."""
    cfg = tiny_config(graph_matching=True, discriminator=True,
                      temporal_graph=True, cyc_loss=True)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_crop=(128, 128)),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        tgcn=dataclasses.replace(cfg.tgcn, clip_shape=(2, 4, 4),
                                 pool_ratios=(8, 4, 2, 1)),
        cycle=dataclasses.replace(cfg.cycle, clip_length=24))
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    new_state, metrics = step(state, batch)
    for k in ("seg_loss", "temporal_graph_loss", "cyc_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(new_state.step) == 1


def test_train_step_cycle_loss():
    cfg = tiny_config(graph_matching=False, discriminator=False, cyc_loss=True)
    cfg = dataclasses.replace(
        cfg, cycle=dataclasses.replace(cfg.cycle, clip_length=24))
    models, optimizers, data, batch, state = _setup(cfg)
    step = jax.jit(make_train_step(cfg, models, optimizers))
    _, metrics = step(state, batch)
    assert "cyc_loss" in metrics and np.isfinite(float(metrics["cyc_loss"]))


def test_eval_step_counts():
    cfg = tiny_config(graph_matching=False, discriminator=False)
    models, optimizers, data, batch, state = _setup(cfg)
    ev = jax.jit(make_eval_step(cfg, models))
    imgs, masks = next(data.eval_batches(1))
    counts, per_part, loss = ev(state, jnp.asarray(imgs), jnp.asarray(masks))
    total = sum(float(v) for v in counts.values())
    assert total == pytest.approx(imgs.shape[0] * 64 * 64 * 2)  # cardiac: 2 ch
    assert np.isfinite(float(loss))
