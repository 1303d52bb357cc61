"""CLI entry: CAMUS→EchoNet UDA training.

Mirrors `python train_camus_echo.py` (`/root/reference/train_camus_echo.py`)
but with actual flags (the reference imports argparse and never uses it):

    python -m graphecho_tpu.train_camus_echo --epochs 400 --batch-size 8 \
        --camus-root /data/camus --echonet-root /data/echonet \
        --save-dir ./result/model --log-dir ./result/log

Without dataset roots it runs on synthetic data (pipeline smoke mode).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--view-num", default="2", choices=list("1234"))
    p.add_argument("--camus-root", default=None)
    p.add_argument("--echonet-root", default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--use-mesh", action="store_true",
                   help="data-parallel over all local devices")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--pretrained-backbone", default=None,
                   help="torch .pth to initialize the FPN from: torchvision "
                        "zoo ResNet weights or a reference GraphEcho "
                        "checkpoint (the reference's `pretrained` knob)")
    p.add_argument("--no-graph-matching", action="store_true")
    p.add_argument("--no-discriminator", action="store_true")
    p.add_argument("--temporal-graph", action="store_true")
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
    if args.camus_root and args.echonet_root:
        from graphecho_tpu.real_training import run_camus_echo

        run_camus_echo(args)
    else:
        from graphecho_tpu.entrypoints import train_camus_echo

        train_camus_echo(
            num_epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
            checkpoint_dir=args.save_dir, log_path=None,
            use_mesh=args.use_mesh, seed=args.seed,
            view_num=args.view_num,
            graph_matching=not args.no_graph_matching,
            discriminator=not args.no_discriminator,
            temporal_graph=args.temporal_graph,
            torch_init=args.pretrained_backbone)


if __name__ == "__main__":
    main()
