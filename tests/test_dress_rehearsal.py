"""Preemption dress rehearsal (VERDICT r2 next-item #6): train until the
metrics move, SIGTERM mid-epoch, resume from the orbax checkpoint, assert
state continuity and continued progress — locking together the trainer,
checkpoint, preemption, and video-validation subsystems that are otherwise
only unit-tested in isolation.

The preemption is a REAL signal (`os.kill(SIGTERM)` raised between batches),
exercising `PreemptionGuard`'s handler installation, the mid-epoch
should_stop check, and the emergency checkpoint save
(`train/trainer.py:129-133`, `utils/preemption.py`).
"""

import os
import signal

import jax
import numpy as np

from graphecho_tpu.config import (
    DataConfig,
    ExperimentConfig,
    GModuleConfig,
    ModelConfig,
    NodeSamplerConfig,
    TrainConfig,
)
from graphecho_tpu.data.synthetic import SyntheticEchoData
from graphecho_tpu.train.trainer import Trainer

STEPS_PER_EPOCH = 5


def _cfg():
    return ExperimentConfig(
        train=TrainConfig(graph_matching=True, discriminator=True,
                          temporal_graph=False, cyc_loss=False),
        data=DataConfig(img_crop=(64, 64), batch_size=2, target_batch_mult=1),
        model=ModelConfig(backbone="VGG16", in_channels=1, num_classes=2),
        gmodule=GModuleConfig(num_classes=2, nodes_per_class=16,
                              sampler=NodeSamplerConfig(
                                  pos_budget_per_level=16)),
    )


def _epoch_batches(cfg, epoch_seed):
    data = SyntheticEchoData(cfg, seed=epoch_seed)
    return [data.train_batch() for _ in range(STEPS_PER_EPOCH)]


def _eval_fns(cfg):
    def video_batches():
        return SyntheticEchoData(cfg, seed=999).eval_batches(
            3, video=True, clip_len=4)

    return {"Video Test": (video_batches, True)}


def test_preempt_resume_continuity(tmp_path):
    cfg = _cfg()
    ckpt_dir = str(tmp_path / "ckpt")

    # ---------------- phase A: train, SIGTERM after 2 steps of epoch 0
    trainer_a = Trainer(cfg, steps_per_epoch=STEPS_PER_EPOCH,
                        checkpoint_dir=ckpt_dir)
    trainer_a.init_state(_epoch_batches(cfg, 0)[0])

    def interrupted_batches():
        for i, b in enumerate(_epoch_batches(cfg, 0)):
            if i == 2:
                os.kill(os.getpid(), signal.SIGTERM)  # real preemption signal
            yield b

    trainer_a.train(interrupted_batches, num_epochs=4,
                    eval_fns=_eval_fns(cfg))
    # the signal arrived while batch 2 was being produced; that step still
    # executes, the flag is checked after it -> emergency save at step 3 of 5
    saved_step = trainer_a.ckpt.latest_step()
    assert saved_step == 3, saved_step
    assert int(trainer_a.state.step) == 3
    # preemption handler must be uninstalled again (train()'s finally)
    assert signal.getsignal(signal.SIGTERM) not in (None,), "handler leaked"
    a_params = jax.device_get(trainer_a.state.net_params)
    a_seed = np.asarray(trainer_a.state.sr_seed)
    trainer_a.ckpt.close()

    # ---------------- phase B: fresh process-equivalent trainer resumes
    trainer_b = Trainer(cfg, steps_per_epoch=STEPS_PER_EPOCH,
                        checkpoint_dir=ckpt_dir)
    trainer_b.init_state(_epoch_batches(cfg, 0)[0])
    assert int(trainer_b.state.step) == saved_step, "did not resume"
    # continuity: restored leaves are bit-identical to the interrupted state
    for path_leaf, restored_leaf in zip(
            jax.tree_util.tree_leaves(a_params),
            jax.tree_util.tree_leaves(jax.device_get(
                trainer_b.state.net_params))):
        np.testing.assert_array_equal(path_leaf, restored_leaf)
    np.testing.assert_array_equal(a_seed, np.asarray(trainer_b.state.sr_seed))

    # ---------------- continued progress after resume
    dices, seg_losses = [], []
    for epoch in range(3):
        m = trainer_b.train_epoch(_epoch_batches(cfg, epoch), epoch)
        seg_losses.append(m["seg_loss"])
        dices.append(trainer_b.validation(
            SyntheticEchoData(cfg, seed=999).eval_batches(3, video=True,
                                                          clip_len=4),
            "Video Test", is_video=True))
    assert int(trainer_b.state.step) == saved_step + 3 * STEPS_PER_EPOCH
    assert all(np.isfinite(v) for v in seg_losses)
    # supervised seg on a fixed synthetic distribution must make progress
    assert seg_losses[-1] < seg_losses[0], seg_losses
    assert all(np.isfinite(d) for d in dices)
    assert dices[-1] >= dices[0] - 0.05, dices
    trainer_b.ckpt.close()
