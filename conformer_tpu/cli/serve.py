"""HTTP transcription server (stdlib-only).

The reference ships an empty api.py (reference: api.py — 0 bytes). This is a
real one: POST a WAV to /transcribe, get JSON back. Batched micro-batching is
deliberate future work; requests are served one at a time, each padded to the
nearest export-style bucket so the forward stays compile-cached.

    python -m conformer_tpu.cli.serve --checkpoint-dir ckpt --port 8000
    curl -s --data-binary @utt.wav localhost:8000/transcribe
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def make_handler(pipe, tokenizer, cfg, buckets_s):
    import jax

    from conformer_tpu.data.dataset import Batch

    sr = cfg.audio.sample_rate
    bucket_samples = sorted(int(b * sr) for b in buckets_s)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/transcribe":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                from conformer_tpu.audio.io import decode_wav_bytes, resample

                # Shared decoder handles int16/int32/uint8/float payloads
                # with the correct scaling (audio/io.py:_pcm_to_float).
                signal, file_sr = decode_wav_bytes(raw)
                if signal.ndim == 2:  # (channels, samples) -> mono
                    signal = signal.mean(axis=0)
                signal = resample(signal, file_sr, sr)
                t0 = time.perf_counter()
                size = next((b for b in bucket_samples if len(signal) <= b),
                            bucket_samples[-1])
                signal = signal[:size]
                audio = np.zeros((1, size), np.float32)
                audio[0, : len(signal)] = signal
                batch = Batch(audio, np.array([len(signal)], np.int32),
                              np.zeros((1, 1), np.int32),
                              np.zeros((1,), np.int32))
                text = pipe.transcribe_batch(batch)[0]
                elapsed = time.perf_counter() - t0
                self._reply(200, {
                    "text": text,
                    "audio_seconds": round(len(signal) / sr, 3),
                    "decode_seconds": round(elapsed, 4),
                    "rtf": round(elapsed / max(len(signal) / sr, 1e-6), 4),
                })
            except Exception as e:  # noqa: BLE001 — server must not die
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--decode", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--lm", default=None)
    p.add_argument("--buckets", type=float, nargs="+",
                   default=[2.0, 4.0, 8.0, 16.0, 30.0],
                   help="audio-second buckets requests are padded to")
    args = p.parse_args(argv)

    cfg = load_config(args)
    if args.lm:
        cfg = cfg.override(**{"decode.lm_path": args.lm})
    tokenizer = load_tokenizer_from_args(args)

    from conformer_tpu.decode.pipeline import InferencePipeline

    pipe = InferencePipeline(cfg, tokenizer, checkpoint_dir=args.checkpoint_dir,
                             decode=args.decode)
    handler = make_handler(pipe, tokenizer, cfg, args.buckets)
    server = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"serving on http://{args.host}:{args.port} "
          f"(POST /transcribe, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
