"""Top-level training entry points mirroring the reference scripts.

`train_camus_echo(...)` / `train_cardiac_uda(...)` correspond to
`python train_camus_echo.py` / `python train_cardiac_uda.py`
(`/root/reference/train_camus_echo.py:517-653`). Each builds the experiment
config, trainer, and data pipeline, then runs the epoch loop with per-epoch
validation and checkpointing.

Data: when dataset roots are provided the real pipelines (CAMUS .mhd /
EchoNet .avi / CardiacUDA .nii.gz — `graphecho_tpu.data`) are used; otherwise
synthetic data keeps the full loop runnable anywhere (SURVEY §4(c)).
"""

from __future__ import annotations

from typing import Optional

from graphecho_tpu.config import ExperimentConfig, camus_echo_config, cardiac_uda_config
from graphecho_tpu.data.synthetic import SyntheticEchoData
from graphecho_tpu.train.trainer import Trainer


def _run(cfg: ExperimentConfig, steps_per_epoch: int, num_epochs: Optional[int],
         checkpoint_dir: Optional[str], log_path: Optional[str],
         use_mesh: bool, seed: int, n_eval: int,
         torch_init: Optional[str] = None) -> Trainer:
    trainer = Trainer(cfg, steps_per_epoch=steps_per_epoch, use_mesh=use_mesh,
                      log_path=log_path, checkpoint_dir=checkpoint_dir)
    data = SyntheticEchoData(cfg, seed=seed)
    trainer.init_state(data.train_batch(), torch_init=torch_init)

    def batches():
        for _ in range(steps_per_epoch):
            yield data.train_batch()

    eval_fns = {"Inner-Val": lambda: data.eval_batches(n_eval),
                "Target Domain - Valid": lambda: data.eval_batches(n_eval)}
    trainer.train(batches, num_epochs=num_epochs, eval_fns=eval_fns)
    return trainer


def train_camus_echo(num_epochs: Optional[int] = 1, steps_per_epoch: int = 4,
                     checkpoint_dir: Optional[str] = None,
                     log_path: Optional[str] = None, use_mesh: bool = False,
                     seed: int = 123, n_eval: int = 4,
                     torch_init: Optional[str] = None, **cfg_overrides) -> Trainer:
    """CAMUS→EchoNet UDA (reference `train_camus_echo.py:546-637` defaults)."""
    cfg = camus_echo_config(**cfg_overrides)
    return _run(cfg, steps_per_epoch, num_epochs, checkpoint_dir, log_path,
                use_mesh, seed, n_eval, torch_init=torch_init)


def train_cardiac_uda(num_epochs: Optional[int] = 1, steps_per_epoch: int = 4,
                      checkpoint_dir: Optional[str] = None,
                      log_path: Optional[str] = None, use_mesh: bool = False,
                      seed: int = 123, n_eval: int = 4,
                      torch_init: Optional[str] = None, **cfg_overrides) -> Trainer:
    """CardiacUDA Site_G→Site_R (reference `train_cardiac_uda.py:645-736`)."""
    cfg = cardiac_uda_config(**cfg_overrides)
    return _run(cfg, steps_per_epoch, num_epochs, checkpoint_dir, log_path,
                use_mesh, seed, n_eval, torch_init=torch_init)
