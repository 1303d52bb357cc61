"""CLI entry: CardiacUDA Site_G→Site_R training.

Mirrors `python train_cardiac_uda.py` (`/root/reference/train_cardiac_uda.py`):

    python -m graphecho_tpu.train_cardiac_uda --epochs 400 --batch-size 8 \
        --root /data/cardiac_uda --infos /data/cardiac_uda/infos.npy \
        --view-num 4 --save-dir ./result/model

Without --root/--infos it runs on synthetic data (pipeline smoke mode).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--view-num", default="4", choices=list("1234"))
    p.add_argument("--root", default=None)
    p.add_argument("--infos", default=None, help="path to infos.npy")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--use-mesh", action="store_true")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--pretrained-backbone", default=None,
                   help="torch .pth to initialize the FPN from (torchvision "
                        "zoo or a reference GraphEcho checkpoint)")
    p.add_argument("--no-graph-matching", action="store_true")
    p.add_argument("--no-discriminator", action="store_true")
    p.add_argument("--temporal-graph", action="store_true")
    p.add_argument("--cyc-loss", action="store_true")
    # multi-host bootstrap (reference NCCL init `train_camus_echo.py:526-535`;
    # TPU-native: jax.distributed.initialize via parallel.mesh)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host only)")
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from graphecho_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    if args.root and args.infos:
        from graphecho_tpu.real_training import run_cardiac_uda

        run_cardiac_uda(args)
    else:
        from graphecho_tpu.entrypoints import train_cardiac_uda

        train_cardiac_uda(
            num_epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
            checkpoint_dir=args.save_dir, use_mesh=args.use_mesh,
            seed=args.seed, view_num=args.view_num,
            graph_matching=not args.no_graph_matching,
            discriminator=not args.no_discriminator,
            temporal_graph=args.temporal_graph, cyc_loss=args.cyc_loss,
            torch_init=args.pretrained_backbone)


if __name__ == "__main__":
    main()
