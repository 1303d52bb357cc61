"""int8 post-training quantization tests (graphecho_tpu.quant).

The reference has no quantized path; this is the TPU capability extension.
Checks: BN folding is exact, the float mirror reproduces the flax backbone,
and the int8 end-to-end path agrees with the float model on nearly all mask
pixels after calibration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphecho_tpu.config import camus_echo_config, cardiac_uda_config
from graphecho_tpu.data.synthetic import SyntheticEchoData
from graphecho_tpu.models.fpn import FPN
from graphecho_tpu.quant import quantize_fpn_backbone
from graphecho_tpu.quant.ptq import make_quantized_infer


def _trained_ish_fpn(back_bone, num_classes, h, seed=0):
    """Init an FPN and perturb batch_stats so BN folding is non-trivial."""
    fpn = FPN(num_classes=num_classes, back_bone=back_bone)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(2, h, h, 1).astype(np.float32))
    variables = fpn.init(jax.random.PRNGKey(seed), x)
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.abs(rng.randn(*a.shape)).astype(a.dtype),
        variables["batch_stats"])
    return fpn, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("back_bone,h", [("VGG16", 64), ("resnet", 64)])
def test_float_mirror_matches_flax_backbone(back_bone, h):
    fpn, variables = _trained_ish_fpn(back_bone, 2, h)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, h, h, 1).astype(np.float32))

    qb = quantize_fpn_backbone(back_bone, variables, [x])
    feats_float = qb.float_forward(x)

    want = fpn.apply(variables, x, train=False,
                     method=lambda m, t, train: m.backbone(t, train=train))
    assert len(feats_float) == len(want) == 5
    for a, b in zip(feats_float, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("back_bone", ["VGG16", "resnet"])
def test_int8_masks_agree_with_float(back_bone):
    cfg = (cardiac_uda_config if back_bone == "VGG16" else camus_echo_config)()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, img_crop=(64, 64)))
    n_cls = cfg.model.num_classes
    fpn, variables = _trained_ish_fpn(back_bone, n_cls, 64, seed=2)

    data = SyntheticEchoData(cfg, seed=3, batch_size=4)
    calib = [data.train_batch()["imgs_source"] for _ in range(3)]
    qb = quantize_fpn_backbone(back_bone, variables, calib)
    # head vars and quantized weights are jit ARGUMENTS (not baked constants)
    infer = jax.jit(make_quantized_infer(fpn, qb))
    head_vars = {"params": variables["params"]}

    x = jnp.asarray(data.train_batch()["imgs_source"])
    masks_q = np.asarray(infer(head_vars, qb.qparams(), x))

    logits, _ = fpn.apply(variables, x, train=False)
    masks_f = np.asarray((jax.nn.sigmoid(logits) > 0.5).astype(jnp.int8))

    agreement = (masks_q == masks_f).mean()
    assert agreement > 0.98, agreement

    # and the quantized backbone features stay close in relative terms
    f_q = qb(x)
    f_f = qb.float_forward(x)
    for a, b in zip(f_q, f_f):
        denom = np.abs(np.asarray(b)).mean() + 1e-6
        err = np.abs(np.asarray(a) - np.asarray(b)).mean() / denom
        assert err < 0.25, err


def test_predictor_quantized(tmp_path):
    """Serving integration: quantize=True end-to-end through the Predictor."""
    from graphecho_tpu.serve import Predictor
    from graphecho_tpu.train.trainer import Trainer
    from test_train_step import tiny_config

    cfg = tiny_config(graph_matching=False, discriminator=False)
    trainer = Trainer(cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    data = SyntheticEchoData(cfg, seed=0)
    trainer.init_state(data.train_batch())
    trainer.train_epoch([data.train_batch()], epoch=0)
    trainer.ckpt.save(int(trainer.state.step), trainer.state)

    frames = np.random.RandomState(0).rand(5, 64, 64).astype(np.float32)
    pred_f = Predictor.from_checkpoint(cfg, str(tmp_path / "ckpt"),
                                       batch_size=4)
    pred_q = Predictor.from_checkpoint(cfg, str(tmp_path / "ckpt"),
                                       batch_size=4, quantize=True,
                                       calib_batches=[frames[..., None]])
    m_f = pred_f.predict(frames)
    m_q = pred_q.predict(frames)
    assert m_q.shape == m_f.shape
    assert (m_q == m_f).mean() > 0.98
