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


def test_summary_writer_add_image(tmp_path):
    import numpy as np

    w = SummaryWriter(str(tmp_path))
    # float (H, W, 1) in [0, 1] and uint8 (H, W, 3) both accepted
    w.add_image("val/pred", np.linspace(0, 1, 64).reshape(8, 8, 1), 3)
    w.add_image("val/rgb", np.zeros((8, 8, 3), np.uint8), 4)
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["name"] for r in recs] == ["val/pred", "val/rgb"]
    for r in recs:
        png = tmp_path / r["image"]
        assert png.exists() and png.read_bytes()[:4] == b"\x89PNG"


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


def test_visualize_node_sampling(tmp_path):
    """`draw_boxes`/`render_node_sampling` mirror the reference's debug
    drawing surface (`graph_matching.py:748-859`): boxes land exactly on the
    mask extents computed by the sampler's own masks_to_boxes."""
    from graphecho_tpu.utils.visualize import draw_boxes, render_node_sampling

    img = np.zeros((32, 32), np.uint8)
    out = draw_boxes(img, np.array([[4, 6, 10, 12]]), colors=(255, 0, 0),
                     width=1)
    assert out.shape == (32, 32, 3)
    assert (out[6, 4:11] == [255, 0, 0]).all()   # top edge
    assert (out[12, 4:11] == [255, 0, 0]).all()  # bottom edge
    assert (out[6:13, 4] == [255, 0, 0]).all()   # left edge
    assert (out[7, 5] == 0).all()                # interior untouched
    # empty boxes: unchanged copy
    assert (draw_boxes(img, np.zeros((0, 4))) == 0).all()

    # two mask channels, one empty -> exactly one palette box at the extents
    masks = np.zeros((32, 32, 2), np.float32)
    masks[8:16, 4:20, 0] = 1.0
    p = tmp_path / "qa.png"
    out = render_node_sampling(masks, path=str(p))
    assert p.exists() and out.shape == (32, 32, 3)
    # channel-0 box spans x 4..19, y 8..15 (masks_to_boxes extents)
    assert (out[8, 4:20] != out[20, 4:20]).any()  # drawn edge differs from bg
    assert tuple(out[8, 4]) == (230, 25, 75)      # palette color 0
    # nothing drawn from the empty channel's full-image fallback box
    assert (out[0, :] == 0).all() and (out[-1, :] == 0).all()
