"""CTC prefix beam search with n-gram LM shallow fusion and hotword boosting.

Replaces the reference's pyctcdecode+KenLM decode path
(reference: processing/lm.py:6-75) with the same operating point: beam width
190, LM weight alpha=2.1, word bonus beta=9.2, beam prune logp -20, hotword
weight 9.0 (lm.py:10-15). Scoring follows pyctcdecode's convention: CTC
probabilities in natural log; LM contribution = alpha * log10->ln converted
n-gram score + beta per completed word; hotwords get an additional
hotword_weight * ln(10) bonus on completion.

Differences from the reference (improvements, documented):
- operates on true log-softmax outputs (the reference feeds raw unnormalized
  logits into pyctcdecode, test.py:149);
- word boundaries use the tokenizer's delimiter token directly (the reference's
  "|" delimiter is opaque to pyctcdecode, which splits on spaces, so its LM
  effectively scored one giant word per utterance);
- ``<UNK>`` frames are skipped like the reference's greedy path
  (processor.py:309).

Host-side decoder; the encoder forward + log-softmax stay on device.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from conformer_tpu.config import DecodeConfig
from conformer_tpu.text.tokenizer import GraphemeTokenizer

LOG10_TO_LN = math.log(10.0)
NEG_INF = -float("inf")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_BS_LOCK = threading.Lock()
_BS_LIB = None


def _load_native():
    """Build (once) + load libbeam_search.so (beam loop + ARPA scorer)."""
    global _BS_LIB
    with _BS_LOCK:
        if _BS_LIB is not None:
            return _BS_LIB or None
        srcs = [os.path.join(_NATIVE_DIR, "beam_search.cpp"),
                os.path.join(_NATIVE_DIR, "ngram_lm.cpp")]
        so = os.path.join(_NATIVE_DIR, "libbeam_search.so")
        if not all(os.path.exists(s) for s in srcs):
            _BS_LIB = False
            return None
        if (not os.path.exists(so)
                or os.path.getmtime(so) < max(os.path.getmtime(s) for s in srcs)):
            cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", *srcs,
                   "-o", so, "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                _BS_LIB = False
                return None
        lib = ctypes.CDLL(so)
        c_charpp = ctypes.POINTER(ctypes.c_char_p)
        lib.bs_create.restype = ctypes.c_void_p
        lib.bs_create.argtypes = [
            ctypes.c_char_p, c_charpp, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, c_charpp,
            ctypes.c_int, ctypes.c_double]
        lib.bs_free.argtypes = [ctypes.c_void_p]
        lib.bs_decode.restype = ctypes.c_int
        lib.bs_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.bs_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.bs_stream_new.restype = ctypes.c_void_p
        lib.bs_stream_new.argtypes = [ctypes.c_void_p]
        lib.bs_stream_feed.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.bs_stream_text.restype = ctypes.c_int
        lib.bs_stream_text.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.bs_stream_free.argtypes = [ctypes.c_void_p]
        _BS_LIB = lib
        return lib


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


@dataclass
class _Beam:
    # CTC bookkeeping
    last_token: int = -1
    p_b: float = 0.0          # log prob ending in blank
    p_nb: float = NEG_INF     # log prob ending in non-blank
    # text state
    text: str = ""            # completed words joined by spaces
    partial: str = ""         # current partial word
    # LM state
    lm_ctx: Tuple[int, ...] = ()
    lm_score: float = 0.0     # accumulated fused LM contribution (natural log)
    n_words: int = 0

    def total(self) -> float:
        return _logsumexp2(self.p_b, self.p_nb) + self.lm_score

    def key(self) -> Tuple:
        return (self.text, self.partial, self.last_token)


class BeamSearchDecoder:
    """Dispatches to the native C++ inner loop (native/beam_search.cpp) when
    buildable; the Python implementation below is the behavioral spec, the
    fallback, and the fuzz-test ground truth (tests/test_lm_beam.py)."""

    def __init__(self, tokenizer: GraphemeTokenizer, cfg: DecodeConfig,
                 lm=None, native: bool = True):
        self.tok = tokenizer
        self.cfg = cfg
        self.lm = lm
        if lm is None and cfg.lm_path:
            from conformer_tpu.lm.ngram import NgramLM

            self.lm = NgramLM(cfg.lm_path)
        self.hotwords = {h.upper() for h in cfg.hotwords}
        self._hot_prefixes = set()
        for h in self.hotwords:
            words = h.split()
            for i in range(1, len(words) + 1):
                self._hot_prefixes.add(" ".join(words[:i]))

        self._native = None
        # The native decoder loads the ARPA itself; an injected custom `lm`
        # object (tests) cannot cross the C boundary, so stay in Python then.
        if native and (lm is None):
            lib = _load_native()
            if lib is not None:
                vocab = (ctypes.c_char_p * len(tokenizer.vocab))(
                    *[t.encode("utf8") for t in tokenizer.vocab])
                hot = [h.encode("utf8") for h in sorted(self.hotwords)]
                hot_arr = (ctypes.c_char_p * max(len(hot), 1))(*(hot or [b""]))
                handle = lib.bs_create(
                    (cfg.lm_path or "").encode(), vocab, len(tokenizer.vocab),
                    tokenizer.pad_id, tokenizer.unk_id, tokenizer.delim_id,
                    float(cfg.alpha), float(cfg.beta), int(cfg.beam_width),
                    float(cfg.beam_prune_logp), float(cfg.token_min_logp),
                    hot_arr, len(hot), float(cfg.hotword_weight))
                if handle:
                    self._native = (lib, ctypes.c_void_p(handle))

    def __del__(self):
        if getattr(self, "_native", None):
            lib, h = self._native
            try:
                lib.bs_free(h)
            except Exception:
                pass

    # ------------------------------------------------------------------
    def _decode_native(self, log_probs: np.ndarray,
                       lengths: Optional[np.ndarray], n_threads: int
                       ) -> List[str]:
        lib, h = self._native
        lp = np.ascontiguousarray(log_probs, dtype=np.float32)
        b, t, v = lp.shape
        cap = max(8 * t + 64, 256)
        out = ctypes.create_string_buffer(b * cap)
        if lengths is not None:
            ln = np.ascontiguousarray(lengths, dtype=np.int32)
            ln_ptr = ln.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        else:
            ln_ptr = None
        lib.bs_decode_batch(
            h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ln_ptr,
            b, t, v, out, cap, n_threads)
        texts = []
        for i in range(b):
            raw = out.raw[i * cap:(i + 1) * cap].split(b"\0", 1)[0]
            texts.append(self.tok.spec_decode(raw.decode("utf8")))
        return texts

    # ------------------------------------------------------------------
    def _word_bonus(self, beam: _Beam, word: str) -> Tuple[float, Tuple[int, ...]]:
        """LM + hotword contribution of completing `word` in `beam`'s context.

        -> (delta natural-log score, new lm context ids)."""
        delta = 0.0
        new_ctx = beam.lm_ctx
        if self.lm is not None:
            wid = self.lm.vocab_id(word)
            delta += self.cfg.alpha * LOG10_TO_LN * self.lm.score_id(
                list(beam.lm_ctx), wid)
            delta += self.cfg.beta
            max_ctx = max(self.lm.order - 1, 1)
            new_ctx = (beam.lm_ctx + (wid,))[-max_ctx:]
        if self.hotwords:
            tail = (beam.text + " " + word).strip().split()
            # boost if any suffix of the text is a hotword prefix ending here
            for span in range(1, min(len(tail), 4) + 1):
                phrase = " ".join(tail[-span:])
                if phrase in self.hotwords:
                    delta += (self.cfg.hotword_weight or 0.0) * LOG10_TO_LN
                    break
        return delta, new_ctx

    # ------------------------------------------------------------------
    def decode(self, log_probs: np.ndarray,
               length: Optional[int] = None) -> str:
        """log_probs: (T, V) natural-log softmax outputs -> text."""
        if self._native is not None:
            n = int(length) if length is not None else log_probs.shape[0]
            return self._decode_native(log_probs[None],
                                       np.asarray([n], np.int32), 1)[0]
        return self.decode_py(log_probs, length)

    def decode_py(self, log_probs: np.ndarray,
                  length: Optional[int] = None) -> str:
        """Pure-Python reference implementation (the behavioral spec)."""
        beams = self.start_state()
        beams = self.step_py(beams, log_probs, length)
        return self.finalize_py(beams)

    def start_state(self) -> List[_Beam]:
        """Fresh beam state (one empty hypothesis seeded with LM BOS)."""
        return [_Beam(lm_ctx=(self.lm.bos_id,) if self.lm else ())]

    def step_py(self, beams: List[_Beam], log_probs: np.ndarray,
                length: Optional[int] = None) -> List[_Beam]:
        """Advance `beams` through the frames of `log_probs` (T, V).

        Prefix beam search is frame-sequential, so stepping chunk by chunk
        through a persistent state is exactly offline decode of the
        concatenation — the invariant the streaming decoder relies on."""
        cfg = self.cfg
        tok = self.tok
        t_max = int(length) if length is not None else log_probs.shape[0]
        blank = tok.pad_id
        unk = tok.unk_id
        delim = tok.delim_id

        for t in range(t_max):
            frame = log_probs[t]
            # candidate tokens above the per-frame floor (blank always allowed)
            cand = np.nonzero(frame >= cfg.token_min_logp)[0]
            if len(cand) == 0:
                cand = np.array([int(np.argmax(frame))])
            next_beams: Dict[Tuple, _Beam] = {}

            def merge(nb: _Beam) -> None:
                k = nb.key()
                old = next_beams.get(k)
                if old is None:
                    next_beams[k] = nb
                else:
                    old.p_b = _logsumexp2(old.p_b, nb.p_b)
                    old.p_nb = _logsumexp2(old.p_nb, nb.p_nb)

            for beam in beams:
                p_total = _logsumexp2(beam.p_b, beam.p_nb)
                for c in cand:
                    c = int(c)
                    lp = float(frame[c])
                    if c == blank:
                        merge(_Beam(last_token=beam.last_token,
                                    p_b=p_total + lp, p_nb=NEG_INF,
                                    text=beam.text, partial=beam.partial,
                                    lm_ctx=beam.lm_ctx,
                                    lm_score=beam.lm_score,
                                    n_words=beam.n_words))
                        continue
                    if c == unk:
                        continue  # reference drops <UNK> (processor.py:309)
                    if c == beam.last_token:
                        # same prefix, repeat collapses
                        merge(_Beam(last_token=c, p_b=NEG_INF,
                                    p_nb=beam.p_nb + lp,
                                    text=beam.text, partial=beam.partial,
                                    lm_ctx=beam.lm_ctx,
                                    lm_score=beam.lm_score,
                                    n_words=beam.n_words))
                        # extension after blank: new occurrence of c
                        base = beam.p_b
                    else:
                        base = p_total
                    if base == NEG_INF:
                        continue
                    if c == delim:
                        # word boundary: complete the partial word
                        if beam.partial:
                            delta, new_ctx = self._word_bonus(beam, beam.partial)
                            merge(_Beam(
                                last_token=c, p_b=NEG_INF, p_nb=base + lp,
                                text=(beam.text + " " + beam.partial).strip(),
                                partial="", lm_ctx=new_ctx,
                                lm_score=beam.lm_score + delta,
                                n_words=beam.n_words + 1))
                        else:
                            merge(_Beam(last_token=c, p_b=NEG_INF,
                                        p_nb=base + lp, text=beam.text,
                                        partial="", lm_ctx=beam.lm_ctx,
                                        lm_score=beam.lm_score,
                                        n_words=beam.n_words))
                    else:
                        merge(_Beam(last_token=c, p_b=NEG_INF,
                                    p_nb=base + lp, text=beam.text,
                                    partial=beam.partial + tok.vocab[c],
                                    lm_ctx=beam.lm_ctx,
                                    lm_score=beam.lm_score,
                                    n_words=beam.n_words))

            scored = sorted(next_beams.values(), key=_Beam.total, reverse=True)
            best = scored[0].total() if scored else 0.0
            floor = best + cfg.beam_prune_logp  # prune_logp is negative
            beams = [b for b in scored[: cfg.beam_width] if b.total() >= floor]
            if not beams:
                beams = scored[:1]
        return beams

    def finalize_py(self, beams: List[_Beam]) -> str:
        """Best hypothesis with the trailing partial word scored. Read-only:
        a streaming caller can snapshot mid-utterance and keep feeding."""
        final: List[Tuple[float, str]] = []
        for beam in beams:
            score = _logsumexp2(beam.p_b, beam.p_nb) + beam.lm_score
            text = beam.text
            if beam.partial:
                delta, _ = self._word_bonus(beam, beam.partial)
                score += delta
                text = (text + " " + beam.partial).strip()
            final.append((score, text))
        final.sort(key=lambda x: x[0], reverse=True)
        best_text = final[0][1] if final else ""
        return self.tok.spec_decode(best_text)

    def decode_batch(self, log_probs: np.ndarray,
                     lengths: Optional[np.ndarray] = None,
                     n_threads: Optional[int] = None) -> List[str]:
        """(B, T, V) -> list of texts (reference: processing/lm.py:62-75).

        The native path decodes the batch on a host thread pool (the LM
        scorer is read-only); the reference decodes sequentially per
        utterance (lm.py:69-71)."""
        if self._native is not None:
            return self._decode_native(
                log_probs, lengths,
                n_threads or min(os.cpu_count() or 1, log_probs.shape[0]))
        out = []
        for i in range(log_probs.shape[0]):
            n = int(lengths[i]) if lengths is not None else None
            out.append(self.decode_py(log_probs[i], n))
        return out

    def stream(self) -> "BeamStream":
        """A persistent beam state fed frames chunk by chunk (see BeamStream)."""
        return BeamStream(self)


class BeamStream:
    """Stateful beam+LM search across chunk boundaries.

    Feeding ``[A; B]`` via two :meth:`feed` calls yields exactly the same
    hypothesis as one offline decode over the concatenation — prefix beam
    search consumes frames sequentially, so carrying the beam list is
    lossless (tests/test_lm_beam.py). :meth:`text` snapshots the current
    best hypothesis (trailing partial word scored) without disturbing the
    state, so it can be polled between chunks for live partials.

    New capability: the reference decodes whole utterances only
    (reference: processing/lm.py:29-42).
    """

    def __init__(self, decoder: BeamSearchDecoder):
        self.dec = decoder  # keeps the native handle alive
        self._state = None
        if decoder._native is not None:
            lib, h = decoder._native
            self._state = ctypes.c_void_p(lib.bs_stream_new(h))
        else:
            self._beams = decoder.start_state()

    def feed(self, log_probs: np.ndarray, length: Optional[int] = None) -> None:
        """Advance through `log_probs` (T, V) natural-log softmax frames."""
        t = int(length) if length is not None else log_probs.shape[0]
        if t <= 0:
            return
        if self._state is not None:
            lib, h = self.dec._native
            lp = np.ascontiguousarray(log_probs[:t], dtype=np.float32)
            lib.bs_stream_feed(
                h, self._state,
                lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                t, lp.shape[1])
        else:
            self._beams = self.dec.step_py(self._beams, log_probs, t)

    def text(self) -> str:
        """Current best hypothesis (spec-decoded); revisable as more frames
        arrive — standard for beam streaming."""
        if self._state is None:
            return self.dec.finalize_py(self._beams)  # already spec-decoded
        lib, h = self.dec._native
        cap = 1 << 16
        buf = ctypes.create_string_buffer(cap)
        lib.bs_stream_text(h, self._state, buf, cap)
        return self.dec.tok.spec_decode(buf.value.decode("utf8"))

    def close(self) -> None:
        if self._state is not None:
            lib, _h = self.dec._native
            lib.bs_stream_free(self._state)
            self._state = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
