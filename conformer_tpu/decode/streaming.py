"""Streaming transcription: stateful chunked encoder with left-context carry
and frame-synchronous greedy emission.

New capability — the reference has nothing comparable (its inference is
whole-utterance, bounded only by GPU memory; SURVEY §5 long-context), and the
offline `transcribe_long` overlap-stitch is a text-level heuristic. Here the
carry is in *features*: each chunk is encoded together with the trailing
``left_context_s`` seconds of already-seen audio, the context half of the
output is dropped, and the CTC collapse state (last emitted token) carries
across chunk boundaries — so emission is incremental and exact with respect
to this chunk's framewise argmax.

Exactness: an utterance no longer than one chunk takes the identical compute
path as offline greedy decode (same mel, same mask, same collapse), so the
transcript is identical (tests/test_streaming.py). Longer audio sees a
finite left context instead of global attention — the standard streaming
approximation.

Shapes are static: one compiled program per (context + chunk) window; the
chunk advance is a multiple of the total subsampling stride so emitted
frames align exactly across chunks.

``decode="beam"`` replaces the greedy collapse with a stateful beam+LM
search: the beam list persists across chunks, so the search over the
streamed frames is exactly the offline search — the only approximation
remains the encoder's finite left context. Beam hypotheses are revisable,
so ``feed`` returns "" in beam mode and the live hypothesis is read from
``.text``. CTC carries the prefix-beam list (decode/beam_search.py::
BeamStream, host); the transducer carries the full device beam tuple
(scores, buffers, hashes, prediction states — ops/rnnt.py init_beams/
return_beams), including any token-level device-LM context.

Throughput: greedy / host-beam modes double-buffer by default
(``pipeline_chunks=True``): ``feed`` dispatches the current chunk's device
program and materializes the *previous* chunk's outputs, overlapping host
emission and device round trips with the next chunk's compute. Finalized
text therefore lags one chunk behind the audio; ``.text`` and ``finish()``
drain the pending chunk. ``pipeline_chunks=False`` restores strictly
synchronous per-chunk emission (lowest latency). The fully-on-device beam
modes are lazier still: the best hypothesis stays on device until read.

``decode="beam_device"`` (CTC) keeps the whole loop on-device: encoder +
log-softmax + prefix beam search with word-level LM fusion and hotword
boosting run as one program per chunk, and the raw BeamState (including
LM contexts and partial-word hashes) carries across chunks
(ops/beam_search_device.py init_state/return_state) — logits never leave
the chip. For the transducer, "beam_device" is the same as "beam".
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from conformer_tpu.config import Config, DecodeConfig
from conformer_tpu.text.tokenizer import GraphemeTokenizer


class StreamingTranscriber:
    """Feed audio incrementally; read back text as it becomes final.

        st = StreamingTranscriber(cfg, tokenizer, variables)
        for block in microphone():        # arbitrary block sizes
            print(st.feed(block), end="")
        print(st.finish())

    chunk_s: audio emitted per encoder call; left_context_s: how much
    already-seen audio each chunk attends to.
    """

    def __init__(self, cfg: Config, tokenizer: GraphemeTokenizer, variables,
                 chunk_s: float = 2.0, left_context_s: float = 6.0,
                 decode: str = "greedy",
                 decode_cfg: Optional[DecodeConfig] = None,
                 pipeline_chunks: bool = True):
        import jax
        import jax.numpy as jnp

        from conformer_tpu.audio.mel import MelFrontend
        from conformer_tpu.train.steps import build_models

        if decode == "beam_auto":
            from conformer_tpu.decode.pipeline import resolve_beam_backend

            decode = resolve_beam_backend(streaming=True)
        if decode not in ("greedy", "beam", "beam_device"):
            raise ValueError(
                f"decode must be greedy|beam|beam_device|beam_auto, "
                f"got {decode!r}")
        self.arch = getattr(cfg.model, "arch", "ctc")
        if self.arch == "transducer" and decode == "beam_device":
            decode = "beam"  # the RNN-T beam already runs on device
        self.decode = decode
        self.cfg = cfg
        self.tok = tokenizer
        self.sr = cfg.audio.sample_rate
        hop = cfg.audio.hop_length
        stride = 4 * hop  # total subsample stride in samples (2 conv s2)
        self.chunk = int(chunk_s * self.sr) // stride * stride
        self.ctx = int(left_context_s * self.sr) // stride * stride
        if self.chunk <= 0:
            raise ValueError("chunk_s too small for the subsampling stride")

        frontend = MelFrontend(cfg.audio)
        self._variables = variables
        self._jnp = jnp
        self._stream = None
        self._rnnt_carry = None

        if self.arch == "transducer":
            # RNN-T streaming: the encoder sees the chunk + left context like
            # CTC, but the label history carries EXACTLY across chunks via
            # the prediction-network state (greedy: ops/rnnt.py
            # start_frames/return_carry) or the full beam tuple (beam:
            # init_beams/return_beams) — RNN-T's natural streaming advantage
            # over the CTC collapse-state approximation.
            from conformer_tpu.models.transducer import Transducer
            from conformer_tpu.ops.rnnt import (rnnt_beam_search,
                                                rnnt_greedy_decode)

            model = Transducer(cfg.model,
                               compute_dtype=cfg.optim.compute_dtype,
                               deterministic=True)
            max_per_chunk = max(self.chunk // stride * 4, 8)

            if decode == "beam":
                import dataclasses

                from conformer_tpu.decode.pipeline import _device_lm_kwargs

                dcfg = decode_cfg or cfg.decode
                cfg_dec = dataclasses.replace(cfg, decode=dcfg)
                lm_kwargs = _device_lm_kwargs(cfg_dec, tokenizer)
                beam_kw = dict(beam_width=dcfg.beam_width,
                               top_k=dcfg.rnnt_top_k,
                               max_symbols=dcfg.rnnt_max_symbols,
                               max_len=cfg.data.max_tokens,
                               unk_id=tokenizer.unk_id,
                               scan_unroll=dcfg.device_scan_unroll,
                               **lm_kwargs)

                def beam_win(variables, audio, length, start, beams):
                    bound = model.bind(variables)
                    mels = frontend(audio)
                    enc, enc_lengths = bound.encode(
                        mels, frontend.frame_lengths(length))
                    return rnnt_beam_search(
                        bound.joint_logits, enc, enc_lengths,
                        bound.predict_step, bound.predict_init(1),
                        start_frames=start, init_beams=beams,
                        return_beams=True, **beam_kw)

                # One jitted fn: beams=None (fresh) and beams=<tuple>
                # (resume) trace as two cached specializations.
                self._beam_win = jax.jit(beam_win)
                self._rnnt_beams = None
                self._beam_best = None
            else:
                def forward_t(variables, audio, length, start, state, pred):
                    bound = model.bind(variables)
                    mels = frontend(audio)
                    mel_lengths = frontend.frame_lengths(length)
                    enc, enc_lengths = bound.encode(mels, mel_lengths)
                    buf, count, carry = rnnt_greedy_decode(
                        bound.joint_logits, enc, enc_lengths,
                        bound.predict_step, (state, pred),
                        max_symbols=cfg.decode.rnnt_max_symbols,
                        max_len=max_per_chunk, start_frames=start,
                        return_carry=True)
                    return buf, count, carry

                self._forward_t = jax.jit(forward_t)
                self._predict_init = lambda: model.bind(
                    self._variables).predict_init(1)
                self._rnnt_carry = self._predict_init()
        elif decode == "beam_device":
            # Fully on-device streaming CTC beam+LM: encoder + log-softmax +
            # prefix beam search (with word-level LM fusion + hotwords from
            # decode.lm_path) in ONE program per chunk; the raw BeamState
            # carries across chunks (ops/beam_search_device.py init_state/
            # return_state), so logits never leave the chip.
            import dataclasses

            from conformer_tpu.decode.pipeline import _device_lm_kwargs
            from conformer_tpu.ops.beam_search_device import (
                ctc_beam_search_device)

            _, model = build_models(cfg)
            dcfg = decode_cfg or cfg.decode
            cfg_dec = dataclasses.replace(cfg, decode=dcfg)
            lm_kwargs = _device_lm_kwargs(cfg_dec, tokenizer,
                                          word_fallback=True)
            search_kw = dict(beam_width=dcfg.beam_width,
                             top_k=dcfg.device_top_k,
                             blank_id=tokenizer.pad_id,
                             unk_id=tokenizer.unk_id,
                             max_len=cfg.data.max_tokens,
                             scan_unroll=dcfg.device_scan_unroll,
                             **lm_kwargs)

            def beam_dev_win(variables, audio, length, start, state):
                mels = frontend(audio)
                mel_lengths = frontend.frame_lengths(length)
                (logits, out_lengths), _ = model.apply(variables, mels,
                                                       mel_lengths,
                                                       mutable=[])
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                return ctc_beam_search_device(
                    lp, out_lengths, start_frames=start, init_state=state,
                    return_state=True, **search_kw)

            self._beam_dev_win = jax.jit(beam_dev_win)
            self._ctc_beams = None
            self._beam_best = None
        else:
            _, model = build_models(cfg)

            def forward(variables, audio, length):
                mels = frontend(audio)
                mel_lengths = frontend.frame_lengths(length)
                (logits, out_lengths), _ = model.apply(variables, mels,
                                                       mel_lengths,
                                                       mutable=[])
                if decode == "beam":
                    out = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1)
                else:
                    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return out, out_lengths

            self._forward = jax.jit(forward)

            if decode == "beam":
                from conformer_tpu.decode.beam_search import BeamSearchDecoder

                self._stream_cfg = decode_cfg or DecodeConfig()
                self._stream = BeamSearchDecoder(
                    tokenizer, self._stream_cfg).stream()

        self._buffer = np.zeros((0,), np.float32)   # unprocessed audio
        self._context = np.zeros((0,), np.float32)  # already-emitted audio
        self._prev_id = -1                          # CTC collapse carry
        self._pieces: List[str] = []
        # Double-buffering (greedy / host-beam modes): feed() dispatches the
        # chunk program and materializes the PREVIOUS chunk's outputs, so
        # host collapse work and device round trips overlap the next chunk's
        # compute. Emission of finalized text lags one chunk; reading .text
        # drains the pending chunk (one sync). pipeline_chunks=False keeps
        # the strictly synchronous per-chunk emission.
        self._pipeline = pipeline_chunks
        self._pending = None  # (device outputs tuple, start) awaiting fetch

    # ------------------------------------------------------------------
    def reset(self) -> None:
        """Clear all carried state for a fresh utterance WITHOUT rebuilding
        the jitted programs — lets servers pool transcribers across
        sessions instead of paying a re-trace per connection."""
        self._buffer = np.zeros((0,), np.float32)
        self._context = np.zeros((0,), np.float32)
        self._prev_id = -1
        self._pieces = []
        self._pending = None
        if getattr(self, "_stream", None) is not None:
            # Host beam: BeamSearchDecoder.stream() starts a fresh search.
            from conformer_tpu.decode.beam_search import BeamSearchDecoder
            self._stream = BeamSearchDecoder(
                self.tok, self._stream_cfg).stream()
        if hasattr(self, "_beam_best"):
            self._beam_best = None
        if hasattr(self, "_ctc_beams"):
            self._ctc_beams = None
        if hasattr(self, "_rnnt_beams"):
            self._rnnt_beams = None
        if self.arch == "transducer" and hasattr(self, "_forward_t"):
            self._rnnt_carry = self._predict_init()

    def _sub_frames(self, n_samples: int) -> int:
        """Samples -> subsampled encoder frames (exact length formulas:
        reference processor.py:392 and convolution.py:55)."""
        mel = n_samples // self.cfg.audio.hop_length + 1
        return ((mel - 1) // 2 - 1) // 2

    def _run_window(self, audio: np.ndarray, emit_from_sample: int) -> str:
        """Encode `audio`, emit collapsed text (greedy) or advance the beam
        (beam mode) for frames at/after the subsampled position of
        `emit_from_sample`."""
        window = self.ctx + self.chunk
        padded = np.zeros((1, max(len(audio), window)), np.float32)
        padded[0, : len(audio)] = audio
        start = self._sub_frames(emit_from_sample) if emit_from_sample else 0
        if self.arch == "transducer":
            if self.decode == "beam":
                prefixes, plens, _, self._rnnt_beams = self._beam_win(
                    self._variables, padded,
                    np.asarray([len(audio)], np.int32),
                    np.asarray([start], np.int32), self._rnnt_beams)
                # Keep the best hypothesis as device arrays: feed() returns
                # "" in beam mode, so fetching here would serialize every
                # chunk on a device round trip. .text materializes lazily,
                # letting successive chunk programs pipeline.
                self._beam_best = (prefixes, plens)
                return ""
            state, pred = self._rnnt_carry
            buf, count, self._rnnt_carry = self._forward_t(
                self._variables, padded, np.asarray([len(audio)], np.int32),
                np.asarray([start], np.int32), state, pred)
            piece = self._drain_pending()
            self._pending = (("rnnt", buf, count), start)
            if not self._pipeline:
                piece += self._drain_pending()
            return piece
        if self.decode == "beam_device":
            prefixes, plens, _, self._ctc_beams = self._beam_dev_win(
                self._variables, padded, np.asarray([len(audio)], np.int32),
                np.asarray([start], np.int32), self._ctc_beams)
            self._beam_best = (prefixes, plens)  # device arrays; see above
            return ""
        out, out_len = self._forward(
            self._variables, padded,
            np.asarray([len(audio)], np.int32))
        piece = self._drain_pending()
        self._pending = (("ctc", out, out_len), start)
        if not self._pipeline:
            piece += self._drain_pending()
        return piece

    def _drain_pending(self) -> str:
        """Materialize the buffered previous chunk's device outputs (if any)
        and run its host-side emission; "" when nothing is pending."""
        if self._pending is None:
            return ""
        (kind, *payload), start = self._pending
        self._pending = None
        if kind == "rnnt":
            buf, count = payload
            ids = np.asarray(buf)[0][: int(np.asarray(count)[0])]
            return "".join(self.tok.vocab[int(c)] for c in ids
                           if int(c) not in (self.tok.pad_id,
                                             self.tok.unk_id))
        out, out_len = payload
        out = np.asarray(out)[0]
        n = int(np.asarray(out_len)[0])
        if self._stream is not None:
            self._stream.feed(out[start:n])
            return ""
        return self._emit(out[:n], start)

    def _emit(self, ids: np.ndarray, start: int) -> str:
        """Collapse frames [start:], carrying the last-emitted-token state
        across chunk boundaries — blank/unk leave the state unchanged exactly
        like the offline collapse (reference: processor.py:307-319)."""
        out: List[int] = []
        prev = self._prev_id
        for c in ids[start:]:
            c = int(c)
            if c == self.tok.pad_id or c == self.tok.unk_id:
                continue
            if c != prev:
                out.append(c)
            prev = c
        self._prev_id = prev
        return "".join(self.tok.vocab[c] for c in out)

    # ------------------------------------------------------------------
    def feed(self, audio: np.ndarray) -> str:
        """Add samples; returns newly-finalized text (may be empty)."""
        self._buffer = np.concatenate([self._buffer,
                                       np.asarray(audio, np.float32)])
        emitted = ""
        while len(self._buffer) >= self.chunk:
            chunk, self._buffer = (self._buffer[: self.chunk],
                                   self._buffer[self.chunk:])
            ctx = self._context[-self.ctx:] if self.ctx else \
                np.zeros((0,), np.float32)
            window = np.concatenate([ctx, chunk])
            piece = self._run_window(window, emit_from_sample=len(ctx))
            self._context = np.concatenate([self._context, chunk])[-self.ctx:]
            if piece:
                self._pieces.append(piece)
                emitted += piece
        return emitted

    def finish(self) -> str:
        """Flush the remainder; returns the final newly-emitted text
        (greedy) or the full final hypothesis (beam)."""
        emitted = ""
        if len(self._buffer) > 0:
            ctx = self._context[-self.ctx:] if self.ctx else \
                np.zeros((0,), np.float32)
            window = np.concatenate([ctx, self._buffer])
            piece = self._run_window(window, emit_from_sample=len(ctx))
            self._buffer = np.zeros((0,), np.float32)
            if piece:
                self._pieces.append(piece)
                emitted = piece
        tail = self._drain_pending()
        if tail:
            self._pieces.append(tail)
            emitted += tail
        if self._stream is not None or getattr(self, "_beam_best", None) \
                is not None:
            return self.text
        return emitted

    @property
    def text(self) -> str:
        """Full transcript so far. Greedy: delim -> space, spec-decoded (same
        assembly as GraphemeTokenizer.collapsed_ids_to_text); beam: the
        current best hypothesis (revisable until finish())."""
        tail = self._drain_pending()
        if tail:
            self._pieces.append(tail)
        if self._stream is not None:
            return self._stream.text()
        best = getattr(self, "_beam_best", None)
        if best is not None:
            ids, n = best  # lazy fetch: the only host sync in beam mode
            return self.tok.collapsed_ids_to_text(
                np.asarray(ids)[0, 0], int(np.asarray(n)[0, 0])).strip()
        raw = "".join(self._pieces).replace(self.tok.delim_token, " ")
        return self.tok.spec_decode(raw).strip()
