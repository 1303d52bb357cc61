"""Real-data training wiring: datasets → batch dicts → Trainer.

Mirrors the reference trainers' data plumbing (`train_camus_echo.py:155-177`,
`train_cardiac_uda.py:167-194`): source loader (CAMUS / Site_G), target loader
(EchoNet / Site_R) cycled alongside, per-epoch validation loaders.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from graphecho_tpu.config import camus_echo_config, cardiac_uda_config
from graphecho_tpu.data.loader import DataLoader, cycled
from graphecho_tpu.train.trainer import Trainer


def _batches(source_loader: DataLoader, target_iter, graph_matching: bool,
             camus_mode: bool) -> Iterator[Dict[str, np.ndarray]]:
    for imgs, masks, _, _ in source_loader:
        batch = {"imgs_source": imgs.astype(np.float32),
                 "masks": masks.astype(np.float32)}
        if graph_matching:
            timgs = next(target_iter)[0]
            batch["imgs_target"] = timgs.astype(np.float32)
        yield batch


def _eval_pairs(loader: DataLoader, first_channel_only: bool):
    for imgs, masks, _, _ in loader:
        masks = masks.astype(np.float32)
        if first_channel_only:
            masks = masks[..., :1]
        yield imgs.astype(np.float32), masks


def run_camus_echo(args) -> Trainer:
    from graphecho_tpu.data.camus import DataLoaderCamus
    from graphecho_tpu.data.echo import Echo

    cfg = camus_echo_config(view_num=args.view_num,
                            graph_matching=not args.no_graph_matching,
                            discriminator=not args.no_discriminator)
    src_train = DataLoaderCamus(args.camus_root, stage="train")
    tgt_train = Echo(args.echonet_root, split="train", validation=False)
    src_loader = DataLoader(src_train, args.batch_size, num_workers=8)
    # reference target batch = bs * 21 (`train_camus_echo.py:165`)
    tgt_loader = DataLoader(tgt_train, args.batch_size * 21, num_workers=8,
                            drop_last=False)
    tgt_iter = cycled(tgt_loader)

    val_camus = DataLoader(DataLoaderCamus(args.camus_root, stage="valid"),
                           1, shuffle=False, drop_last=False)
    val_echo = DataLoader(Echo(args.echonet_root, split="val"),
                          1, shuffle=False, drop_last=False)

    trainer = Trainer(cfg, steps_per_epoch=len(src_loader),
                      use_mesh=args.use_mesh, log_path=_log(args),
                      checkpoint_dir=args.save_dir, summary_dir=args.log_dir)
    first = next(_batches(src_loader, tgt_iter, cfg.train.graph_matching, True))
    trainer.init_state(first)
    trainer.train(
        lambda: _batches(src_loader, tgt_iter, cfg.train.graph_matching, True),
        num_epochs=args.epochs,
        eval_fns={
            "Inner-Val": lambda: _eval_pairs(val_camus, True),
            "Target Domain - Valid": lambda: _eval_pairs(val_echo, True),
        })
    return trainer


def run_cardiac_uda(args) -> Trainer:
    from graphecho_tpu.data.cardiac_uda import SegCardiacUDADataset

    infos = np.load(args.infos, allow_pickle=True).item()
    cfg = cardiac_uda_config(view_num=args.view_num,
                             graph_matching=not args.no_graph_matching,
                             discriminator=not args.no_discriminator)
    src_train = SegCardiacUDADataset(infos, args.root, is_train=True,
                                     set_select=("Site_G",),
                                     view_num=(args.view_num,))
    tgt_train = SegCardiacUDADataset(infos, args.root, is_train=True,
                                     set_select=("Site_R",),
                                     view_num=(args.view_num,),
                                     source_domain=False)
    # reference: source bs*2, target bs (`train_cardiac_uda.py:174-177`)
    src_loader = DataLoader(src_train, args.batch_size * 2, num_workers=8)
    tgt_loader = DataLoader(tgt_train, args.batch_size, num_workers=8,
                            drop_last=False)
    tgt_iter = cycled(tgt_loader)

    test_target = DataLoader(
        SegCardiacUDADataset(infos, args.root, is_train=False,
                             data_list=tgt_train.test_list,
                             set_select=("Site_R",),
                             view_num=(args.view_num,)),
        1, shuffle=False, drop_last=False)

    trainer = Trainer(cfg, steps_per_epoch=len(src_loader),
                      use_mesh=args.use_mesh, log_path=_log(args),
                      checkpoint_dir=args.save_dir, summary_dir=args.log_dir)
    first = next(_batches(src_loader, tgt_iter, cfg.train.graph_matching, False))
    trainer.init_state(first)
    trainer.train(
        lambda: _batches(src_loader, tgt_iter, cfg.train.graph_matching, False),
        num_epochs=args.epochs,
        eval_fns={"Target Domain - Test": lambda: _eval_pairs(test_target, False)})
    return trainer


def _log(args):
    import os

    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)
        return os.path.join(args.log_dir, "train.log")
    return None
