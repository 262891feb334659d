"""Export a trained checkpoint to a self-contained StableHLO inference bundle.

    python -m conformer_tpu.cli.export --checkpoint-dir ckpt --out exported \
        [--batch-size 1 --audio-seconds 8 16]
"""

from __future__ import annotations

import argparse

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--audio-seconds", type=float, nargs="+", default=[8.0])
    p.add_argument("--decode", choices=["logits", "beam"], default="logits",
                   help="'beam' bakes the LM-fused device beam search into "
                        "the artifact (audio -> token ids; uses "
                        "decode.lm_path/hotwords from the config)")
    args = p.parse_args(argv)

    cfg = load_config(args)
    tokenizer = load_tokenizer_from_args(args, cfg)
    cfg = cfg.override(**{"model.vocab_size": tokenizer.vocab_size})

    import jax

    from conformer_tpu.export import export_model
    from conformer_tpu.train.checkpoint import CheckpointManager
    from conformer_tpu.train.state import TrainState, make_optimizer
    from conformer_tpu.train.steps import init_variables

    tx = make_optimizer(cfg.optim)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    mgr = CheckpointManager(args.checkpoint_dir, keep=cfg.train.keep_checkpoints)
    if mgr.latest_step() is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    state, _ = mgr.restore(abstract)

    files = export_model(
        cfg, {"params": state.params, "batch_stats": state.batch_stats},
        args.out, batch_size=args.batch_size,
        audio_seconds=tuple(args.audio_seconds),
        decode=args.decode, tokenizer=tokenizer)
    print(f"exported {len(files)} artifact(s) to {args.out}:")
    for f in files:
        print(" ", f)


if __name__ == "__main__":
    main()
