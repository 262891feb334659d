"""Self-supervised pretraining (wav2vec2 contrastive or BYOL) on unlabeled audio.

The entry point the reference advertises but never shipped
(reference: README.md:28,50 list pretrain.py/byol.py; neither exists).
Manifests only need a `path` column — no transcripts.

    python -m conformer_tpu.cli.pretrain --manifest unlabeled.csv \
        --method wav2vec2 --checkpoint-dir ./pretrain_ckpt
"""

from __future__ import annotations

import argparse

import numpy as np

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--manifest", required=True)
    p.add_argument("--method", choices=["wav2vec2", "byol"], default=None)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args(argv)

    cfg = load_config(args)
    overrides = {"data.train_manifest": args.manifest}
    if args.method:
        overrides["pretrain.method"] = args.method
    if args.checkpoint_dir:
        overrides["train.checkpoint_dir"] = args.checkpoint_dir
    cfg = cfg.override(**overrides)
    from conformer_tpu.cli.common import save_config
    save_config(cfg, cfg.train.checkpoint_dir)

    import jax

    from conformer_tpu.data.dataset import BucketedLoader, ManifestDataset
    from conformer_tpu.train.checkpoint import CheckpointManager
    from conformer_tpu.train.logging import MetricsLogger, Throughput
    from conformer_tpu.train.pretrain import (gumbel_temperature_at,
                                              init_byol_state,
                                              init_wav2vec2_state,
                                              make_byol_step,
                                              make_wav2vec2_step)
    from conformer_tpu.train.state import make_optimizer

    tokenizer = load_tokenizer_from_args(args, cfg)  # only for batch plumbing
    ds = ManifestDataset(cfg.data.train_manifest, cfg.audio.sample_rate,
                         num_examples=cfg.data.num_examples)
    loader = BucketedLoader(ds, tokenizer, cfg.data,
                            shard_index=jax.process_index(),
                            shard_count=jax.process_count(), training=True)
    tx = make_optimizer(cfg.optim, steps_per_epoch=max(len(ds) //
                                                       cfg.data.batch_size, 1))
    rng = jax.random.PRNGKey(cfg.train.seed)
    method = cfg.pretrain.method

    if method == "wav2vec2":
        state = init_wav2vec2_state(cfg, rng, tx)
        step_fn = make_wav2vec2_step(cfg, tx)
    else:
        state = init_byol_state(cfg, rng, tx)
        step_fn = make_byol_step(cfg, tx)

    ckpt = CheckpointManager(cfg.train.checkpoint_dir,
                             keep=cfg.train.keep_checkpoints)
    logger = MetricsLogger(cfg.train.checkpoint_dir)
    meter = Throughput()

    for epoch in range(cfg.train.num_epochs):
        for batch in loader.epoch(epoch):
            args_dev = jax.device_put((batch.audio, batch.audio_lengths))
            step = int(jax.device_get(state.step))
            if method == "wav2vec2":
                temp = gumbel_temperature_at(cfg, step)
                state, metrics = step_fn(state, *args_dev, rng, temp)
            else:
                state, metrics = step_fn(state, *args_dev, rng)
            step += 1
            meter.update(float(np.sum(batch.audio_lengths))
                         / cfg.audio.sample_rate)
            if cfg.train.log_every_steps and step % cfg.train.log_every_steps == 0:
                scalars = {k: float(jax.device_get(v))
                           for k, v in metrics.items()}
                scalars.update(meter.snapshot())
                logger.log(step, scalars, prefix="pretrain/")
                print(f"[{method} step {step}] " +
                      " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
            if (cfg.train.checkpoint_every_steps
                    and step % cfg.train.checkpoint_every_steps == 0):
                ckpt.save(state, epoch=epoch)
            if cfg.train.num_steps and step >= cfg.train.num_steps:
                break
        ckpt.save(state, epoch=epoch + 1)
    ckpt.wait()
    logger.close()


if __name__ == "__main__":
    main()
