"""Streaming chunk-size tradeoff sweep: RTF + divergence-vs-offline per
(chunk_s, left_context_s), all in ONE TPU process (VERDICT r2 #10 — the
2s/6s default should be evidence-backed, not asserted).

Every row is paired with a SAME-SESSION offline greedy decode of the same
audio: the tunnel latency varies ~2.5x between sessions (CLAUDE.md), so only
within-run comparisons are meaningful. Divergence is the character error
rate of the streamed transcript against the offline transcript (0 = exact).

    python tools/sweep_streaming.py [--total-s 60] [--decode greedy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total-s", type=float, default=60.0)
    ap.add_argument("--block-ms", type=float, default=100.0)
    ap.add_argument("--decode", default="greedy",
                    choices=["greedy", "beam", "beam_device"])
    ap.add_argument("--chunks", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0, 4.0])
    ap.add_argument("--contexts", type=float, nargs="+", default=[2.0, 6.0])
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from conformer_tpu.config import Config
    from conformer_tpu.decode.streaming import StreamingTranscriber
    from conformer_tpu.ops.ctc import greedy_decode
    from conformer_tpu.text.metrics import cer
    from conformer_tpu.text.tokenizer import load_tokenizer
    from conformer_tpu.train.steps import init_variables, make_forward

    tok = load_tokenizer("vi")
    cfg = Config().override(**{"model.vocab_size": tok.vocab_size})
    sr = cfg.audio.sample_rate
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(args.total_s * sr)) * 0.1
             ).astype(np.float32)
    block = int(args.block_ms / 1e3 * sr)

    variables = init_variables(cfg, jax.random.PRNGKey(0),
                               mel_frames=int(args.total_s * sr) // 160 + 1)

    # Offline reference: one full-utterance greedy decode (same weights).
    forward = make_forward(cfg)

    @jax.jit
    def offline(variables, audio, lengths):
        logits, out_lengths = forward(variables, audio, lengths)
        return greedy_decode(logits, out_lengths)

    aud = jax.device_put(audio[None, :])
    ln = jax.device_put(np.array([len(audio)], np.int32))
    ids, n = offline(variables, aud, ln)           # compile
    t0 = time.perf_counter()
    ids, n = offline(variables, aud, ln)
    ids = np.asarray(jax.device_get(ids))
    n = np.asarray(jax.device_get(n))
    t_off = time.perf_counter() - t0
    offline_text = tok.collapsed_ids_to_text(ids[0, : int(n[0])])
    print(json.dumps({"offline_greedy_rtf": round(t_off / args.total_s, 6),
                      "total_s": args.total_s, "decode": args.decode,
                      "offline_chars": len(offline_text)}), flush=True)

    for chunk_s in args.chunks:
        for ctx_s in args.contexts:
            if ctx_s < chunk_s:
                continue
            try:
                # Warm both compiled specializations on a throwaway instance.
                st = StreamingTranscriber(cfg, tok, variables,
                                          chunk_s=chunk_s,
                                          left_context_s=ctx_s,
                                          decode=args.decode)
                st.feed(audio[: int((chunk_s + ctx_s + 1) * sr)])
                st.finish()
                st = StreamingTranscriber(cfg, tok, variables,
                                          chunk_s=chunk_s,
                                          left_context_s=ctx_s,
                                          decode=args.decode)
                t0 = time.perf_counter()
                parts = []
                for i in range(0, len(audio), block):
                    parts.append(st.feed(audio[i: i + block]))
                parts.append(st.finish())
                dt = time.perf_counter() - t0
                text = "".join(parts)
                div = cer([text], [offline_text]) if offline_text else 0.0
                print(json.dumps({
                    "chunk_s": chunk_s, "left_context_s": ctx_s,
                    "rtf": round(dt / args.total_s, 6),
                    "divergence_cer_vs_offline": round(float(div), 4),
                    "streamed_chars": len(text)}), flush=True)
            except Exception as e:
                print(json.dumps({
                    "chunk_s": chunk_s, "left_context_s": ctx_s,
                    "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                    flush=True)


if __name__ == "__main__":
    main()
