"""Real-data-shaped integration tests: the `run_camus_echo` / `run_cardiac_uda`
entry paths over synthesized on-disk fixtures (.mhd/.avi/.nii.gz), with ALL
branches on — graph matching, discriminators, temporal graph, cycle loss, and
the Site_R_full-style video validation (VERDICT r1 item 1; reference wiring at
`/root/reference/train_camus_echo.py:96-100,168-177,244-278` and
`train_cardiac_uda.py:107-112,179-194,245-253,376-426`)."""

import argparse

import numpy as np
import pytest

from graphecho_tpu.config import (
    CycleConfig,
    DataConfig,
    ExperimentConfig,
    GModuleConfig,
    ModelConfig,
    NodeSamplerConfig,
    TGCNConfig,
    TrainConfig,
)
from graphecho_tpu.data.formats import write_mhd, write_nifti


def _args(**kw):
    base = dict(epochs=1, batch_size=2, view_num="2", camus_root=None,
                echonet_root=None, root=None, infos=None, save_dir=None,
                log_dir=None, use_mesh=False, seed=0, no_graph_matching=False,
                no_discriminator=False, temporal_graph=True, cyc_loss=True,
                steps_per_epoch=2)
    base.update(kw)
    return argparse.Namespace(**base)


def _tiny_tgcn():
    # 128² images -> levels 32/16/8/4, pool r=(8,4,2,1) -> 4x4 nodes per frame
    # (the pred head needs a >=3-wide grid; see models/tgcn.py)
    return TGCNConfig(clip_shape=(4, 4, 4), pool_ratios=(8, 4, 2, 1),
                      knn_k=4, queue_size=10, cluster_method="momentum_queue")


@pytest.fixture
def camus_root(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(10):
        pid = f"patient{i:04d}"
        d = tmp_path / "camus" / "training" / pid
        d.mkdir(parents=True)
        img = (rng.rand(60, 70) * 255).astype(np.uint8)
        gt = np.zeros((60, 70), np.uint8)
        gt[10:35, 15:45] = 1  # LV
        gt[38:52, 15:45] = 3  # LA
        write_mhd(str(d / f"{pid}_4CH_ED.mhd"), img)
        write_mhd(str(d / f"{pid}_4CH_ED_gt.mhd"), gt)
    return str(tmp_path / "camus")


@pytest.fixture
def echo_root(tmp_path):
    from graphecho_tpu.data.video import savevideo

    rng = np.random.RandomState(1)
    root = tmp_path / "echo"
    (root / "Videos").mkdir(parents=True)
    rows = ["FileName,X1,Y1,X2,Y2,Frame"]
    split_rows = ["FileName,Split"]
    for i in range(5):
        name = f"vid{i}.avi"
        # 128x128 to match the CAMUS crop (EchoNet is natively one size, 112)
        vid = (rng.rand(12, 128, 128) * 255).astype(np.uint8)
        savevideo(str(root / "Videos" / name), vid)
        split_rows.append(f"{name},{'VAL' if i == 4 else 'TRAIN'}")
        for frame in (2, 7):  # two traced frames (ES, ED)
            for k in range(6):
                rows.append(
                    f"{name[:-4]},{28+2*k},{24+10*k},{100-2*k},{24+10*k},{frame}")
    (root / "FileList.csv").write_text("\n".join(split_rows) + "\n")
    (root / "VolumeTracings.csv").write_text("\n".join(rows))
    return str(root)


@pytest.fixture
def cardiac_root(tmp_path):
    rng = np.random.RandomState(2)
    root = tmp_path / "cardiac"
    root.mkdir()
    infos = {}

    def add(pid, site):
        img = (rng.rand(48, 52, 12) * 255).astype(np.int16)
        mask = np.zeros((48, 52, 12), np.int16)
        mask[8:28, 8:30, :] = 1
        mask[30:42, 28:44, :] = 2
        ip, mp = str(root / f"{pid}_img.nii.gz"), str(root / f"{pid}_mask.nii.gz")
        write_nifti(ip, img)
        write_nifti(mp, mask)
        infos[pid] = {"dataset_name": site,
                      "views_images": {"1": ip}, "views_labels": {"1": mp}}

    for i in range(12):
        add(f"g{i}", "Site_G")
    for i in range(4):
        add(f"r{i}", "Site_R")
    for i in range(2):
        add(f"rf{i}", "Site_R_full")
    infos_path = str(root / "infos.npy")
    np.save(infos_path, infos, allow_pickle=True)
    return str(root), infos_path


def test_run_camus_echo_all_branches(camus_root, echo_root, tmp_path):
    from graphecho_tpu.real_training import run_camus_echo

    cfg = ExperimentConfig(
        train=TrainConfig(graph_matching=True, discriminator=True,
                          temporal_graph=True),
        data=DataConfig(img_res=(140, 140), img_crop=(128, 128), clip_length=4,
                        view_num="2", batch_size=2, target_batch_mult=2,
                        num_workers=2),
        model=ModelConfig(backbone="resnet", in_channels=1, num_classes=1),
        gmodule=GModuleConfig(num_classes=1, nodes_per_class=16,
                              sampler=NodeSamplerConfig(pos_budget_per_level=16)),
        tgcn=_tiny_tgcn(),
    )
    args = _args(camus_root=camus_root, echonet_root=echo_root,
                 save_dir=str(tmp_path / "ckpt_camus"))
    trainer = run_camus_echo(args, cfg=cfg)

    assert int(trainer.state.step) > 0
    m = trainer.last_epoch_metrics
    want = {"seg_loss", "dis_loss", "node_loss", "mat_loss_aff", "mat_loss_qu",
            "loss_adv_p2", "loss_adv_p3", "loss_adv_p4", "loss_adv_p5",
            "temporal_graph_loss", "total_loss"}
    assert want <= set(m), sorted(m)
    for k in want:
        assert np.isfinite(m[k]), k
    # camus clips are tiled stills + echo real clips: the temporal branch ran
    assert np.isfinite(m["temporal_graph_loss"])
    assert trainer.ckpt.latest_step() is not None


def test_run_cardiac_uda_all_branches(cardiac_root, tmp_path):
    from graphecho_tpu.real_training import run_cardiac_uda

    root, infos_path = cardiac_root
    cfg = ExperimentConfig(
        train=TrainConfig(graph_matching=True, discriminator=True,
                          temporal_graph=True, cyc_loss=True),
        data=DataConfig(img_res=(140, 140), img_crop=(128, 128), clip_length=4,
                        total_length=8, view_num="1", batch_size=2,
                        target_batch_mult=1, num_workers=2),
        model=ModelConfig(backbone="VGG16", in_channels=1, num_classes=3),
        gmodule=GModuleConfig(num_classes=3, nodes_per_class=16,
                              sampler=NodeSamplerConfig(pos_budget_per_level=16)),
        tgcn=_tiny_tgcn(),
        cycle=CycleConfig(target_region=4, cyc_off=1, chunk_size=2,
                          temperature=10.0, clip_length=8),
    )
    args = _args(root=root, infos=infos_path, view_num="1",
                 save_dir=str(tmp_path / "ckpt_cardiac"))
    trainer = run_cardiac_uda(args, cfg=cfg)

    assert int(trainer.state.step) > 0
    m = trainer.last_epoch_metrics
    want = {"seg_loss", "dis_loss", "node_loss", "mat_loss_aff", "mat_loss_qu",
            "loss_adv_p2", "loss_adv_p3", "loss_adv_p4", "loss_adv_p5",
            "temporal_graph_loss", "cyc_loss", "total_loss"}
    assert want <= set(m), sorted(m)
    for k in want:
        assert np.isfinite(m[k]), k
    # graph path active (BG + organ channels -> positive nodes)
    assert m["node_loss"] > 0
    assert trainer.ckpt.latest_step() is not None
