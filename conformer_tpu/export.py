"""Model export: serialized StableHLO inference functions + standalone weights.

Finishes what the reference's ONNX exporter never did (reference:
building/build_onnx.py:53 stops before any export call). The TPU-native
artifact is a ``jax.export`` StableHLO bundle — portable across JAX versions
and runnable on any XLA backend (CPU/GPU/TPU) — containing the full
audio -> logits pipeline (mel frontend + encoder + decoder), plus a weights
file restorable without the training stack.

Artifacts (directory):
  model.stablehlo   serialized exported function (weights baked in)
  config.json       full Config used
  meta.json         shapes, vocab, framework version
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu import __version__
from conformer_tpu.config import Config
from conformer_tpu.train.steps import make_forward


def export_model(cfg: Config, variables, out_dir: str,
                 batch_size: int = 1,
                 audio_seconds: Tuple[float, ...] = (8.0,),
                 decode: str = "logits",
                 tokenizer=None) -> List[str]:
    """Export audio->(logits, lengths) functions, one per audio-length bucket.

    Weights are closed over (baked into the artifact), so the artifact is
    self-contained.

    decode='beam' (CTC; requires `tokenizer`) bakes the COMPLETE LM-fused
    transcriber into the artifact: audio -> (token ids, counts) via the
    on-device prefix beam search at cfg.decode.beam_width, with word-level
    n-gram fusion and hotword boosting from cfg.decode.lm_path /
    cfg.decode.hotwords (or token-level fusion from
    cfg.decode.device_lm_path) — the hashed LM tables become constants in
    the StableHLO, so the bundle runs LM-fused decode on any XLA backend
    with no host decode loop and no LM file. No reference counterpart: its
    ONNX exporter never exports (building/build_onnx.py:53) and its LM
    decode is host pyctcdecode (processing/lm.py:62-75).
    """
    from jax import export as jax_export

    os.makedirs(out_dir, exist_ok=True)
    arch = getattr(cfg.model, "arch", "ctc")
    if decode not in ("logits", "beam"):
        raise ValueError(f"decode must be logits|beam, got {decode!r}")
    if decode == "beam" and arch == "ctc":
        if tokenizer is None:
            raise ValueError("decode='beam' export needs the tokenizer")
        from conformer_tpu.decode.pipeline import _device_lm_kwargs
        from conformer_tpu.ops.beam_search_device import (
            ctc_beam_search_device)

        lm_kwargs = _device_lm_kwargs(cfg, tokenizer, word_fallback=True)
        base_forward = make_forward(cfg)

        def forward(variables, audio, lengths):
            logits, out_lengths = base_forward(variables, audio, lengths)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            prefixes, plens, _scores = ctc_beam_search_device(
                lp, out_lengths, beam_width=cfg.decode.beam_width,
                top_k=cfg.decode.device_top_k,
                blank_id=tokenizer.pad_id, unk_id=tokenizer.unk_id,
                max_len=cfg.data.max_tokens,
                scan_unroll=cfg.decode.device_scan_unroll, **lm_kwargs)
            return prefixes[:, 0], plens[:, 0]
    elif arch == "transducer":
        # RNN-T: the frame-synchronous decode is itself jittable, so the
        # exported function is the COMPLETE transcription pipeline
        # audio -> (token ids, counts) — more deployment-ready than the
        # CTC bundle's logits (no decode loop needed host-side).
        # decode='beam' bakes the time-synchronous beam search (with
        # word/token-level LM fusion from cfg.decode, like the CTC branch).
        from conformer_tpu.audio.mel import MelFrontend
        from conformer_tpu.models.transducer import Transducer
        from conformer_tpu.ops.rnnt import (rnnt_beam_search,
                                            rnnt_greedy_decode)

        model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                           deterministic=True)
        frontend = MelFrontend(cfg.audio)

        if decode == "beam":
            if tokenizer is None:
                raise ValueError("decode='beam' export needs the tokenizer")
            from conformer_tpu.decode.pipeline import _device_lm_kwargs

            lm_kwargs = _device_lm_kwargs(cfg, tokenizer,
                                          word_fallback=True)

            def forward(variables, audio, lengths):
                bound = model.bind(variables)
                mels = frontend(audio)
                enc, enc_lengths = bound.encode(
                    mels, frontend.frame_lengths(lengths))
                prefixes, plens, _scores = rnnt_beam_search(
                    bound.joint_logits, enc, enc_lengths,
                    bound.predict_step, bound.predict_init(enc.shape[0]),
                    beam_width=cfg.decode.beam_width,
                    top_k=cfg.decode.rnnt_top_k,
                    max_symbols=cfg.decode.rnnt_max_symbols,
                    max_len=cfg.data.max_tokens,
                    unk_id=tokenizer.unk_id,
                    length_norm=cfg.decode.rnnt_length_norm,
                    scan_unroll=cfg.decode.device_scan_unroll, **lm_kwargs)
                return prefixes[:, 0], plens[:, 0]
        else:
            def forward(variables, audio, lengths):
                bound = model.bind(variables)
                mels = frontend(audio)
                enc, enc_lengths = bound.encode(
                    mels, frontend.frame_lengths(lengths))
                return rnnt_greedy_decode(
                    bound.joint_logits, enc, enc_lengths, bound.predict_step,
                    bound.predict_init(enc.shape[0]),
                    max_symbols=cfg.decode.rnnt_max_symbols,
                    max_len=cfg.data.max_tokens)
    else:
        forward = make_forward(cfg)
    sr = cfg.audio.sample_rate
    files = []
    for seconds in audio_seconds:
        n = int(seconds * sr)

        def fn(audio, lengths):
            return forward(variables, audio, lengths)

        exp = jax_export.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((batch_size, n), jnp.float32),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32))
        name = f"model_b{batch_size}_{int(seconds)}s.stablehlo"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(exp.serialize())
        files.append(path)

    cfg.to_json(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "framework": "conformer_tpu", "version": __version__,
            "arch": arch,
            # CTC logits artifacts return (logits, lengths); transducer and
            # decode='beam' artifacts return (token ids, counts) — the
            # decode (greedy RNN-T / LM-fused beam) is baked in.
            "outputs": ("tokens_counts"
                        if arch == "transducer" or decode == "beam"
                        else "logits_lengths"),
            "decode": decode,
            "batch_size": batch_size,
            "audio_seconds": list(audio_seconds),
            "sample_rate": sr,
            "vocab_size": cfg.model.vocab_size,
            "blank_id": 0,
        }, f, indent=2)
    return files


class ExportedModel:
    """Load + run an exported artifact without the training stack."""

    def __init__(self, out_dir: str):
        from jax import export as jax_export

        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.cfg = Config.from_json(os.path.join(out_dir, "config.json"))
        self._fns = {}
        for name in os.listdir(out_dir):
            if name.endswith(".stablehlo"):
                with open(os.path.join(out_dir, name), "rb") as f:
                    exp = jax_export.deserialize(bytearray(f.read()))
                # key by padded sample count
                n = exp.in_avals[0].shape[1]
                self._fns[n] = exp
        if not self._fns:
            raise FileNotFoundError(f"no .stablehlo artifacts in {out_dir}")
        self._sizes = sorted(self._fns)

    def __call__(self, audio: np.ndarray, lengths: np.ndarray):
        """audio (B, S) float32 -> (logits, out_lengths). Pads S up to the
        smallest exported bucket that fits."""
        s = audio.shape[1]
        for size in self._sizes:
            if s <= size:
                break
        else:
            raise ValueError(f"audio longer than largest export bucket "
                             f"({s} > {self._sizes[-1]})")
        if s < size:
            audio = np.pad(audio, ((0, 0), (0, size - s)))
        return self._fns[size].call(audio.astype(np.float32),
                                    lengths.astype(np.int32))
