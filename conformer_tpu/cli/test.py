"""Evaluate a trained model: corpus WER/CER (x100) with greedy or beam+LM decode.

Working replacement for the reference eval entry point
(reference: test.py:176-246), including the CSV results dump (test.py:167-169).

    python -m conformer_tpu.cli.test --manifest eval.csv \
        --checkpoint-dir ./checkpoints [--lm lm.arpa --decode beam]
"""

from __future__ import annotations

import argparse
import csv

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args, setup_mesh)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--manifest", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--decode",
                   choices=["auto", "greedy", "beam", "beam_device",
                            "beam_auto"], default="auto",
                   help="'auto' = greedy without an LM, beam_auto with one "
                        "(the reference eval always fuses a provided LM — "
                        "test.py:129)")
    p.add_argument("--lm", default=None, help="ARPA n-gram LM for beam fusion")
    p.add_argument("--results", default=None, help="CSV path for (ref, hyp) dump")
    args = p.parse_args(argv)

    cfg = load_config(args)
    if args.lm:
        cfg = cfg.override(**{"decode.lm_path": args.lm})
    if args.decode == "auto":
        has_lm = bool(cfg.decode.lm_path or cfg.decode.device_lm_path)
        args.decode = "beam_auto" if has_lm else "greedy"
    setup_mesh(args)
    tokenizer = load_tokenizer_from_args(args, cfg)

    from conformer_tpu.decode.pipeline import InferencePipeline

    pipe = InferencePipeline(cfg, tokenizer,
                             checkpoint_dir=args.checkpoint_dir,
                             decode=args.decode)
    metrics, pairs = pipe.evaluate(args.manifest)
    print(f"WER: {metrics['wer']:.2f}%  CER: {metrics['cer']:.2f}%  "
          f"loss: {metrics['loss']:.4f}")

    if args.results and __import__("jax").process_index() == 0:
        with open(args.results, "w", newline="", encoding="utf8") as f:
            w = csv.writer(f)
            w.writerow(["label", "prediction"])
            w.writerows(pairs)
        print(f"wrote {len(pairs)} rows to {args.results}")


if __name__ == "__main__":
    main()
