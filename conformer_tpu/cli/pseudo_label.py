"""Semi-supervised pseudo-labeling: transcribe unlabeled audio into a manifest.

Finishes what the reference only stubbed (reference: semi/create_label.py:7-8 —
loads an HF wav2vec2 model and stops). Here *our own trained model* produces
pseudo labels (greedy or beam+LM), with a confidence filter (mean per-frame
max log-prob) so only reliable utterances enter retraining.

    python -m conformer_tpu.cli.pseudo_label --manifest unlabeled.csv \
        --checkpoint-dir ckpt --output labeled.csv [--min-confidence -1.0]
"""

from __future__ import annotations

import argparse
import csv

import numpy as np

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--manifest", required=True, help="CSV with a path column")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--decode", choices=["greedy", "beam", "beam_device", "beam_auto"], default="greedy")
    p.add_argument("--lm", default=None)
    p.add_argument("--min-confidence", type=float, default=None,
                   help="drop utterances with mean frame log-prob below this")
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)

    cfg = load_config(args)
    if args.lm:
        cfg = cfg.override(**{"decode.lm_path": args.lm})
    tokenizer = load_tokenizer_from_args(args, cfg)

    import jax

    from conformer_tpu.data.dataset import load_manifest
    from conformer_tpu.decode.pipeline import InferencePipeline

    pipe = InferencePipeline(cfg, tokenizer, checkpoint_dir=args.checkpoint_dir,
                             decode=args.decode)
    table = load_manifest(args.manifest)
    paths = table["path"].to_pylist()

    rows, kept = [], 0
    from conformer_tpu.audio.io import load_audio
    from conformer_tpu.data.dataset import Batch

    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i: i + args.batch_size]
        signals = [load_audio(pth, cfg.audio.sample_rate) for pth in chunk]
        size = max(max(len(s) for s in signals), cfg.audio.hop_length)
        audio = np.zeros((len(chunk), size), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for j, s in enumerate(signals):
            audio[j, : len(s)] = s
            lengths[j] = len(s)
        batch = Batch(audio, lengths, np.zeros((len(chunk), 1), np.int32),
                      np.zeros((len(chunk),), np.int32))
        arrays = jax.device_put((batch.audio, batch.audio_lengths,
                                 batch.tokens, batch.token_lengths))
        out = pipe.eval_step(pipe.state, *arrays)
        log_probs = np.asarray(jax.device_get(out["log_probs"]))
        out_lengths = np.asarray(jax.device_get(out["lengths"]))
        # Dispatches greedy / beam / beam_device exactly like InferencePipeline
        # (the raw log_probs are still fetched above for the confidence score).
        texts = pipe.texts_from_out(out)
        for j, (pth, text) in enumerate(zip(chunk, texts)):
            n = max(int(out_lengths[j]), 1)
            conf = float(log_probs[j, :n].max(axis=-1).mean())
            if not text:
                continue
            if args.min_confidence is not None and conf < args.min_confidence:
                continue
            rows.append({"path": pth, "text": text.lower(),
                         "confidence": round(conf, 4)})
            kept += 1

    with open(args.output, "w", newline="", encoding="utf8") as f:
        w = csv.DictWriter(f, fieldnames=["path", "text", "confidence"])
        w.writeheader()
        w.writerows(rows)
    print(f"pseudo-labeled {kept}/{len(paths)} utterances -> {args.output}")


if __name__ == "__main__":
    main()
