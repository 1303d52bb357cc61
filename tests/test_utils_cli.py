"""Tests for aux subsystems: profiling, summary, preemption, env tools,
metric wrappers, and the CLI entry points (synthetic smoke)."""

import json
import os
import signal

import numpy as np

from graphecho_tpu.utils.metric_wrappers import (
    dice_score_onehot,
    mae,
    mse,
    r2_score,
    rmse,
)
from graphecho_tpu.utils.preemption import PreemptionGuard
from graphecho_tpu.utils.profiling import StepTimer
from graphecho_tpu.utils.summary import SummaryWriter
from graphecho_tpu.utils.tools import get_global_rank, get_master_ip, get_world_size


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert t.count == 3
    assert t.mean >= 0
    assert set(t.stats()) == {"steps", "mean_s", "min_s", "max_s"}


def test_summary_writer(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalars({"a": 1, "b": 2}, 1, prefix="train/")
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["name"] == "loss" and lines[0]["value"] == 1.5
    assert {l["name"] for l in lines} == {"loss", "train/a", "train/b"}


def test_preemption_guard():
    g = PreemptionGuard(signals=(signal.SIGUSR1,))
    assert not g.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    assert g.should_stop
    g.uninstall()


def test_env_tools(monkeypatch):
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "4")
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "2")
    assert get_world_size() == 4
    assert get_global_rank() == 2
    assert get_master_ip() == "127.0.0.1"


def test_metric_wrappers():
    y = np.array([1.0, 2.0, 3.0])
    p = np.array([1.1, 1.9, 3.2])
    assert mse(y, p) > 0
    assert mae(y, p) > 0
    assert rmse(y, p) == np.sqrt(mse(y, p))
    assert r2_score(y, y) == 1.0

    logits = np.zeros((2, 4, 4, 2))
    logits[..., 1] = 1.0
    onehot = np.zeros((2, 4, 4, 2))
    onehot[..., 1] = 1.0
    assert dice_score_onehot(logits, onehot) == 1.0


def test_cli_smoke_synthetic():
    """`python -m graphecho_tpu.train_camus_echo` synthetic mode, 1 tiny epoch."""
    from graphecho_tpu.train_camus_echo import main

    main(["--epochs", "1", "--steps-per-epoch", "1", "--batch-size", "1",
          "--no-graph-matching", "--no-discriminator"])
