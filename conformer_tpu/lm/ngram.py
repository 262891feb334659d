"""Python interface to the native n-gram LM (builder + scorer).

The C++ core (native/ngram_lm.cpp) replaces both external KenLM roles in the
reference: the lmplz subprocess that trains the ARPA
(reference: create_lm.py:60) and the query engine behind pyctcdecode
(reference: processing/lm.py:17-22). The shared library is compiled on first
use (g++, cached next to the source); a pure-Python ARPA scorer is included as
a fallback and as an independent cross-check for tests.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_library() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "ngram_lm.cpp")
    so = os.path.join(_NATIVE_DIR, "libngram_lm.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        raise RuntimeError(f"failed to build native ngram LM: {msg}") from e
    return so


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _build_library()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.lm_load.restype = ctypes.c_void_p
        lib.lm_load.argtypes = [ctypes.c_char_p]
        lib.lm_free.argtypes = [ctypes.c_void_p]
        lib.lm_order.restype = ctypes.c_int
        lib.lm_order.argtypes = [ctypes.c_void_p]
        lib.lm_vocab_id.restype = ctypes.c_int
        lib.lm_vocab_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        for name in ("lm_bos", "lm_eos", "lm_unk"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p]
        lib.lm_score.restype = ctypes.c_float
        lib.lm_score.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.c_int, ctypes.c_int32]
        lib.lm_score_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.lm_build_arpa.restype = ctypes.c_int
        lib.lm_build_arpa.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_int]
        _LIB = lib
        return _LIB


def build_arpa(text_path: str, arpa_path: str, order: int = 5) -> None:
    """Train an interpolated modified-KN ARPA from a line-per-sentence corpus."""
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native ngram library unavailable")
    rc = lib.lm_build_arpa(text_path.encode(), arpa_path.encode(), order)
    if rc != 0:
        raise RuntimeError(f"ARPA build failed (rc={rc})")


class NgramLM:
    """Backoff n-gram scorer over an ARPA file (native-backed).

    Scores are log10, matching KenLM/pyctcdecode conventions.
    """

    def __init__(self, arpa_path: str, native: bool = True):
        self._native = None
        self._py: Optional[PyNgramLM] = None
        if native:
            lib = _load_library()
            if lib is not None:
                handle = lib.lm_load(arpa_path.encode())
                if handle:
                    self._native = (lib, ctypes.c_void_p(handle))
        if self._native is None:
            self._py = PyNgramLM(arpa_path)

    # -- introspection ------------------------------------------------------
    @property
    def order(self) -> int:
        if self._native:
            lib, h = self._native
            return lib.lm_order(h)
        return self._py.order

    def vocab_id(self, word: str) -> int:
        if self._native:
            lib, h = self._native
            return lib.lm_vocab_id(h, word.encode())
        return self._py.vocab.get(word, -1)

    @property
    def bos_id(self) -> int:
        if self._native:
            lib, h = self._native
            return lib.lm_bos(h)
        return self._py.vocab.get("<s>", -1)

    @property
    def eos_id(self) -> int:
        if self._native:
            lib, h = self._native
            return lib.lm_eos(h)
        return self._py.vocab.get("</s>", -1)

    # -- scoring ------------------------------------------------------------
    def score_id(self, context: Sequence[int], word_id: int) -> float:
        """log10 P(word | context) with backoff; ids from this LM's vocab."""
        if self._native:
            lib, h = self._native
            ctx = np.asarray(context, dtype=np.int32)
            ptr = ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            return float(lib.lm_score(h, ptr, len(ctx), word_id))
        return self._py.score_id(list(context), word_id)

    def score_word(self, context_words: Sequence[str], word: str) -> float:
        ctx = [self.vocab_id(w) for w in context_words]
        return self.score_id(ctx, self.vocab_id(word))

    def sentence_logprob(self, words: Sequence[str],
                         include_eos: bool = True) -> float:
        """Sum of conditional log10 probs with <s> context (KenLM .score)."""
        ctx = [self.bos_id]
        total = 0.0
        for w in words:
            wid = self.vocab_id(w)
            total += self.score_id(ctx, wid)
            ctx.append(wid)
        if include_eos:
            total += self.score_id(ctx, self.eos_id)
        return total

    def __del__(self):
        if getattr(self, "_native", None):
            lib, h = self._native
            try:
                lib.lm_free(h)
            except Exception:
                pass


class PyNgramLM:
    """Pure-Python ARPA backoff scorer (independent cross-check / fallback)."""

    def __init__(self, arpa_path: str):
        self.vocab: Dict[str, int] = {}
        self.tables: List[Dict[Tuple[int, ...], Tuple[float, float]]] = []
        self._parse(arpa_path)
        self.order = len(self.tables)

    def _wid(self, w: str) -> int:
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab)
        return self.vocab[w]

    def _parse(self, path: str) -> None:
        with open(path, encoding="utf8") as f:
            current = 0
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                if line.startswith("\\"):
                    if line == "\\end\\":
                        break
                    if "-grams:" in line:
                        current = int(line[1:line.index("-grams:")])
                        while len(self.tables) < current:
                            self.tables.append({})
                    continue
                if current == 0:
                    continue
                parts = line.split()
                logp = float(parts[0])
                words = parts[1: 1 + current]
                backoff = float(parts[1 + current]) if len(parts) > 1 + current else 0.0
                key = tuple(self._wid(w) for w in words)
                self.tables[current - 1][key] = (logp, backoff)

    def score_id(self, context: List[int], word: int) -> float:
        if word < 0:
            word = self.vocab.get("<unk>", -1)
        max_ctx = self.order - 1
        context = context[-max_ctx:] if max_ctx else []
        backoff_sum = 0.0
        for use in range(len(context), -1, -1):
            ids = tuple(context[len(context) - use:]) + (word,)
            entry = self.tables[use][ids] if ids in self.tables[use] else None
            if entry is not None:
                return backoff_sum + entry[0]
            if use >= 1:
                ctx_entry = self.tables[use - 1].get(ids[:-1])
                if ctx_entry is not None:
                    backoff_sum += ctx_entry[1]
        unk = self.vocab.get("<unk>")
        if unk is not None and (unk,) in self.tables[0]:
            return backoff_sum + self.tables[0][(unk,)][0]
        return backoff_sum - 99.0
