"""Tests for the native n-gram LM and CTC beam search with shallow fusion."""

import math

import numpy as np
import pytest

from conformer_tpu.config import DecodeConfig
from conformer_tpu.decode.beam_search import BeamSearchDecoder
from conformer_tpu.lm.ngram import NgramLM, PyNgramLM, build_arpa
from conformer_tpu.text.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def vi():
    return load_tokenizer("vi")


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    root = tmp_path_factory.mktemp("lm")
    corpus = root / "corpus.txt"
    lines = ["XIN CHÀO", "XIN CHÀO BẠN", "CẢM ƠN BẠN", "TẠM BIỆT",
             "XIN LỖI", "CHÀO BẠN"] * 5
    corpus.write_text("\n".join(lines), encoding="utf8")
    path = str(root / "lm.arpa")
    build_arpa(str(corpus), path, order=3)
    return path


class TestNgramLM:
    def test_normalized_distributions(self, arpa):
        lm = NgramLM(arpa)
        vocab = ["XIN", "CHÀO", "BẠN", "CẢM", "ƠN", "TẠM", "BIỆT", "LỖI",
                 "</s>", "<unk>"]
        for ctx in [[], ["XIN"], ["XIN", "CHÀO"]]:
            ids = [lm.vocab_id(w) for w in ctx]
            total = sum(10 ** lm.score_id(ids, lm.vocab_id(w)) for w in vocab)
            assert total == pytest.approx(1.0, abs=1e-3), ctx

    def test_native_matches_python(self, arpa):
        lm = NgramLM(arpa)
        py = PyNgramLM(arpa)
        words = ["XIN", "CHÀO", "BẠN", "ZZZ", "</s>"]
        for ctx in [[], ["XIN"], ["CHÀO", "BẠN"], ["ZZZ"]]:
            for w in words:
                a = lm.score_id([lm.vocab_id(x) for x in ctx], lm.vocab_id(w))
                b = py.score_id([py.vocab.get(x, -1) for x in ctx],
                                py.vocab.get(w, -1))
                assert a == pytest.approx(b, abs=1e-5)

    def test_frequent_bigram_beats_rare(self, arpa):
        lm = NgramLM(arpa)
        ctx = [lm.vocab_id("XIN")]
        assert lm.score_id(ctx, lm.vocab_id("CHÀO")) > \
            lm.score_id(ctx, lm.vocab_id("BIỆT"))

    def test_oov_penalized(self, arpa):
        lm = NgramLM(arpa)
        assert lm.score_id([], lm.vocab_id("ZZZZ")) < \
            lm.score_id([], lm.vocab_id("XIN"))


def frames_for(tok, text, repeat=2, blanks=1, noise=-8.0):
    """Synthesize (T, V) log-probs strongly peaked on `text`'s CTC path."""
    ids = tok.encode(text)
    seq = []
    for t in ids:
        seq.extend([t] * repeat)
        seq.extend([tok.pad_id] * blanks)
    v = tok.vocab_size
    lp = np.full((len(seq), v), noise, dtype=np.float32)
    for i, t in enumerate(seq):
        lp[i, t] = -0.05
    # normalize to proper log-softmax
    lp = lp - np.log(np.exp(lp).sum(axis=1, keepdims=True))
    return lp


class TestBeamSearch:
    def test_recovers_clean_path_greedy_equivalent(self, vi):
        dec = BeamSearchDecoder(vi, DecodeConfig(beam_width=8))
        lp = frames_for(vi, "xin chào bạn")
        assert dec.decode(lp) == "XIN CHÀO BẠN"

    def test_respects_length(self, vi):
        dec = BeamSearchDecoder(vi, DecodeConfig(beam_width=8))
        lp_a = frames_for(vi, "xin chào")
        lp_b = frames_for(vi, "xin")
        t_b = lp_b.shape[0]
        merged = np.concatenate([lp_b, lp_a[: max(0, 4)]], axis=0)
        assert dec.decode(merged, length=t_b) == "XIN"

    def test_lm_rescues_ambiguous_path(self, vi, arpa):
        # Make frames ambiguous between CHÀO and an implausible word; the LM
        # must tip the balance toward the corpus word after XIN.
        lm = NgramLM(arpa)
        cfg = DecodeConfig(beam_width=16, alpha=0.8, beta=1.0)
        dec_lm = BeamSearchDecoder(vi, cfg, lm=lm)
        dec_nolm = BeamSearchDecoder(vi, DecodeConfig(beam_width=16))

        lp = frames_for(vi, "xin chào")
        # Blur the CH frame: make "TR" (wrong) slightly more likely than "CH".
        ch, tr = vi.token_id("CH"), vi.token_id("TR")
        for t in range(lp.shape[0]):
            if np.argmax(lp[t]) == ch:
                lp[t, tr] = lp[t, ch] + 0.3
                lp[t] -= np.log(np.exp(lp[t]).sum())
        assert dec_nolm.decode(lp) == "XIN TRÀO"
        assert dec_lm.decode(lp) == "XIN CHÀO"

    def test_hotword_boost(self, vi):
        cfg = DecodeConfig(beam_width=16, hotwords=("WIFI",), hotword_weight=9.0)
        dec_hot = BeamSearchDecoder(vi, cfg)
        dec_plain = BeamSearchDecoder(vi, DecodeConfig(beam_width=16))
        lp = frames_for(vi, "wifi")
        w, f = vi.token_id("W"), vi.token_id("F")
        # Degrade the F so the plain decoder prefers a different char.
        x = vi.token_id("X")
        for t in range(lp.shape[0]):
            if np.argmax(lp[t]) == f:
                lp[t, x] = lp[t, f] + 0.3
                lp[t] -= np.log(np.exp(lp[t]).sum())
        assert dec_plain.decode(lp) == "WIXI"
        assert dec_hot.decode(lp) == "WIFI"

    def test_batch_decode(self, vi):
        dec = BeamSearchDecoder(vi, DecodeConfig(beam_width=4))
        a = frames_for(vi, "xin")
        b = frames_for(vi, "chào bạn")
        t = max(a.shape[0], b.shape[0])
        batch = np.full((2, t, vi.vocab_size), -20.0, np.float32)
        batch[0, : a.shape[0]] = a
        batch[1, : b.shape[0]] = b
        out = dec.decode_batch(batch, np.array([a.shape[0], b.shape[0]]))
        assert out == ["XIN", "CHÀO BẠN"]

    def test_spec_decode_applied(self, vi):
        # Beam output goes through spec_decode like the greedy path.
        dec = BeamSearchDecoder(vi, DecodeConfig(beam_width=4))
        lp = frames_for(vi, "toàn quốc")
        assert dec.decode(lp) == "TOÀN QUỐC"


class TestNativeBeamParity:
    """The C++ decoder (native/beam_search.cpp) must reproduce the Python
    spec transcript-for-transcript, across op points (LM fusion, hotwords,
    the reference beam-190 settings) on randomized inputs."""

    def _random_lp(self, tok, rng, t=40):
        v = tok.vocab_size
        # semi-structured: a random token path with noise, so beams are
        # plausible but contended (pure uniform noise is all ties).
        lp = rng.normal(-6.0, 1.5, size=(t, v)).astype(np.float32)
        path = rng.integers(0, v, size=t)
        lp[np.arange(t), path] += rng.uniform(2.0, 6.0, size=t)
        lp[rng.uniform(size=t) < 0.3, tok.pad_id] += 5.0
        return (lp - np.log(np.exp(lp).sum(1, keepdims=True))).astype(np.float32)

    @pytest.mark.parametrize("cfg_kwargs", [
        dict(beam_width=16),
        dict(beam_width=24, alpha=2.1, beta=9.2, beam_prune_logp=-20.0,
             token_min_logp=-5.0, use_lm=True),
        dict(beam_width=190, alpha=2.1, beta=9.2, beam_prune_logp=-20.0,
             use_lm=True, hotwords=("XIN CHÀO", "BẠN"), hotword_weight=9.0),
    ])
    def test_fuzz_matches_python(self, vi, arpa, cfg_kwargs):
        kw = dict(cfg_kwargs)
        if kw.pop("use_lm", False):
            kw["lm_path"] = arpa
        cfg = DecodeConfig(**kw)
        dec_native = BeamSearchDecoder(vi, cfg)
        dec_py = BeamSearchDecoder(vi, cfg, native=False)
        assert dec_native._native is not None, "native decoder failed to build"
        assert dec_py._native is None

        rng = np.random.default_rng(0)
        batch = np.stack([self._random_lp(vi, rng) for _ in range(6)])
        lengths = rng.integers(20, 41, size=6).astype(np.int32)
        got = dec_native.decode_batch(batch, lengths)
        want = dec_py.decode_batch(batch, lengths)
        assert got == want

    def test_clean_path_and_length(self, vi, arpa):
        cfg = DecodeConfig(beam_width=32, alpha=2.1, beta=9.2, lm_path=arpa)
        dec = BeamSearchDecoder(vi, cfg)
        assert dec._native is not None
        lp = frames_for(vi, "xin chào bạn")
        assert dec.decode(lp) == "XIN CHÀO BẠN"


class TestBeamStream:
    """Chunked feeding through a persistent BeamStream must equal offline
    decode of the concatenated frames — the search is frame-sequential, so
    the streaming API is lossless at the search level."""

    def _chunks(self, lp, sizes):
        out, i = [], 0
        for s in sizes:
            out.append(lp[i: i + s])
            i += s
        if i < lp.shape[0]:
            out.append(lp[i:])
        return out

    @pytest.mark.parametrize("native", [False, True])
    def test_stream_matches_offline(self, vi, arpa, native):
        cfg = DecodeConfig(beam_width=24, alpha=2.1, beta=9.2,
                           beam_prune_logp=-20.0, lm_path=arpa,
                           hotwords=("XIN CHÀO",), hotword_weight=9.0)
        dec = BeamSearchDecoder(vi, cfg, native=native)
        if native:
            assert dec._native is not None
        lp = frames_for(vi, "xin chào bạn")
        stream = dec.stream()
        for chunk in self._chunks(lp, (5, 1, 9, 3)):
            stream.feed(chunk)
        assert stream.text() == dec.decode(lp)

    def test_midstream_snapshot_nondestructive(self, vi, arpa):
        cfg = DecodeConfig(beam_width=16, alpha=1.0, beta=1.0, lm_path=arpa)
        for native in (False, True):
            dec = BeamSearchDecoder(vi, cfg, native=native)
            lp = frames_for(vi, "cảm ơn bạn")
            stream = dec.stream()
            for chunk in self._chunks(lp, (4, 4, 4)):
                stream.feed(chunk)
                stream.text()  # polling partials must not disturb the state
            assert stream.text() == dec.decode(lp)

    def test_stream_native_matches_python_fuzz(self, vi, arpa):
        cfg = DecodeConfig(beam_width=32, alpha=2.1, beta=9.2,
                           beam_prune_logp=-20.0, lm_path=arpa,
                           hotwords=("BẠN",), hotword_weight=9.0)
        dec_n = BeamSearchDecoder(vi, cfg)
        dec_p = BeamSearchDecoder(vi, cfg, native=False)
        assert dec_n._native is not None
        rng = np.random.default_rng(7)
        lp = TestNativeBeamParity._random_lp(None, vi, rng, t=30)
        sn, sp = dec_n.stream(), dec_p.stream()
        for chunk in self._chunks(lp, (7, 7, 7, 7)):
            sn.feed(chunk)
            sp.feed(chunk)
            assert sn.text() == sp.text()
