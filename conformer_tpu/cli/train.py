"""Train a Conformer CTC model.

Equivalent of the reference train entry point (reference: train.py:289-382)
minus the per-GPU process spawning: SPMD handles any number of chips in one
process per host.

    python -m conformer_tpu.cli.train --train-manifest data.csv \
        --set train.num_epochs=10 --set data.batch_size=32
"""

from __future__ import annotations

import argparse

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args, setup_mesh)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--train-manifest", default=None)
    p.add_argument("--val-manifest", default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--wandb", action="store_true", help="also log to wandb")
    p.add_argument("--init-encoder-from", default=None,
                   help="pretrain checkpoint dir to transfer encoder weights "
                        "from (semi-supervised pipeline)")
    p.add_argument("--init-method", choices=["wav2vec2", "byol"], default=None,
                   help="objective of --init-encoder-from's checkpoint")
    args = p.parse_args(argv)

    cfg = load_config(args)
    overrides = {}
    if args.train_manifest:
        overrides["data.train_manifest"] = args.train_manifest
    if args.val_manifest:
        overrides["data.val_manifest"] = args.val_manifest
    if args.checkpoint_dir:
        overrides["train.checkpoint_dir"] = args.checkpoint_dir
    if args.init_encoder_from:
        overrides["train.init_encoder_from"] = args.init_encoder_from
    if args.init_method:
        overrides["train.init_encoder_method"] = args.init_method
    if overrides:
        cfg = cfg.override(**overrides)
    if not cfg.data.train_manifest:
        raise SystemExit("--train-manifest (or data.train_manifest) is required")

    mesh = setup_mesh(args)
    tokenizer = load_tokenizer_from_args(args, cfg)

    from conformer_tpu.train.logging import MetricsLogger
    from conformer_tpu.train.trainer import Trainer

    from conformer_tpu.cli.common import save_config
    save_config(cfg, cfg.train.checkpoint_dir)
    logger = MetricsLogger(cfg.train.checkpoint_dir, use_wandb=args.wandb)
    trainer = Trainer(cfg, tokenizer, mesh=mesh, logger=logger)
    trainer.fit()
    logger.close()


if __name__ == "__main__":
    main()
