"""Transcribe audio: single file, list of files, or a CSV manifest.

Working replacement for the reference inference entry point, which is broken
as shipped (reference: infer.py:48,138,152,191 — nonexistent lm.decode_batch,
undefined device, unassigned lengths; SURVEY §2).

    python -m conformer_tpu.cli.infer --audio a.wav b.wav --checkpoint-dir ckpts
    python -m conformer_tpu.cli.infer --manifest batch.csv --output out.csv
"""

from __future__ import annotations

import argparse
import csv

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--audio", nargs="*", default=[], help="audio file(s)")
    p.add_argument("--manifest", default=None, help="CSV manifest with a path column")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--decode",
                   choices=["auto", "greedy", "beam", "beam_device",
                            "beam_auto"], default="auto",
                   help="'auto' = greedy without an LM, beam_auto with one "
                        "(the reference always fuses a provided LM — "
                        "processing/lm.py); beam_auto picks host vs device "
                        "per context (decode/pipeline.py)")
    p.add_argument("--lm", default=None)
    p.add_argument("--output", default=None, help="CSV output (manifest mode)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--channel", type=int, default=None,
                   help="channel of multi-channel recordings (e.g. 0=staff "
                        "leg of stereo call audio)")
    p.add_argument("--long", action="store_true",
                   help="chunked transcription for long recordings "
                        "(overlapping windows, word-boundary stitching)")
    p.add_argument("--chunk-seconds", type=float, default=24.0)
    p.add_argument("--streaming", action="store_true",
                   help="stateful streaming decode (left-context-carry "
                        "encoder chunks, incremental emission)")
    p.add_argument("--stream-chunk-seconds", type=float, default=2.0)
    p.add_argument("--stream-context-seconds", type=float, default=6.0)
    args = p.parse_args(argv)

    if not args.audio and not args.manifest:
        raise SystemExit("need --audio files or --manifest")

    cfg = load_config(args)
    if args.lm:
        cfg = cfg.override(**{"decode.lm_path": args.lm})
    if args.decode == "auto":
        has_lm = bool(cfg.decode.lm_path or cfg.decode.device_lm_path)
        args.decode = "beam_auto" if has_lm else "greedy"
    tokenizer = load_tokenizer_from_args(args, cfg)

    from conformer_tpu.decode.pipeline import InferencePipeline

    pipe = InferencePipeline(cfg, tokenizer,
                             checkpoint_dir=args.checkpoint_dir,
                             decode=args.decode)

    paths = list(args.audio)
    segments = None
    if args.manifest:
        from conformer_tpu.data.dataset import load_manifest

        table = load_manifest(args.manifest)
        manifest_paths = table["path"].to_pylist()
        cols = set(table.column_names)
        if {"start", "end"} <= cols and not paths:
            # Segment manifest (call-recording workflow, reference:
            # dataset.py:14-45): one row per (path, start, end) span.
            segments = list(zip(table["start"].to_pylist(),
                                table["end"].to_pylist()))
        paths.extend(manifest_paths)

    if args.streaming:
        from conformer_tpu.audio.io import load_audio
        from conformer_tpu.decode.streaming import StreamingTranscriber

        sr = cfg.audio.sample_rate
        texts = []
        for p_ in paths:
            st = StreamingTranscriber(
                pipe.cfg, tokenizer,
                {"params": pipe.state.params,
                 "batch_stats": pipe.state.batch_stats},
                chunk_s=args.stream_chunk_seconds,
                left_context_s=args.stream_context_seconds,
                decode=args.decode, decode_cfg=pipe.cfg.decode)
            st.feed(load_audio(p_, sr, channel=args.channel))
            st.finish()
            texts.append(st.text)
    elif args.long:
        texts = [pipe.transcribe_long(p_, chunk_s=args.chunk_seconds,
                                      channel=args.channel) for p_ in paths]
    else:
        texts = pipe.transcribe_files(paths, batch_size=args.batch_size,
                                      channel=args.channel, segments=segments)
    for path, text in zip(paths, texts):
        print(f"{path}\t{text}")
    if args.output:
        with open(args.output, "w", newline="", encoding="utf8") as f:
            w = csv.writer(f)
            w.writerow(["path", "prediction"])
            w.writerows(zip(paths, texts))


if __name__ == "__main__":
    main()
